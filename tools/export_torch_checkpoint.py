#!/usr/bin/env python
"""Export a TPU-framework checkpoint back to a reference-format .pth.

The output loads into the unmodified reference scripts (their checkpoint
dict format, scripts/train.py:410-418) — the inverse of
tools/convert_torch_checkpoint.py, so users can round-trip weights between
the two frameworks. 'unet' family only (the reference has no other real
model).

Usage:
  python tools/export_torch_checkpoint.py \
      --ckpt checkpoints/best_model_unet.ckpt --out best_model_unet.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help=".ckpt (ours) or bare-params .msgpack")
    ap.add_argument("--out", required=True, help="output .pth path")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # host-only conversion
    from mri_superresolution_tpu.train.checkpoint import load_params_any
    from mri_superresolution_tpu.utils.torch_compat import (
        save_torch_checkpoint)

    params, meta = load_params_any(args.ckpt)
    mt = (meta.get("config", {}) or {}).get("model", {}).get("model_type",
                                                             "unet")
    if mt != "unet":
        raise SystemExit(f"only the 'unet' family exists in the reference; "
                         f"checkpoint is {mt!r}")
    save_torch_checkpoint(args.out, params, meta)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
