#!/usr/bin/env python
"""CLI: convert a reference PyTorch UNetSuperRes .pth into flax msgpack params.

Usage:
    python tools/convert_torch_checkpoint.py --pth best_model_unet.pth \
        --out best_model_unet.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from flax import serialization  # noqa: E402

from mri_superresolution_tpu.utils.torch_compat import load_torch_checkpoint  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    params = load_torch_checkpoint(args.pth)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
