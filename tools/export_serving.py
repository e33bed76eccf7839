#!/usr/bin/env python
"""Export a checkpoint as a portable AOT serving artifact (jax.export).

The artifact bakes the weights into the StableHLO program, so serving
needs NO model code (infer/export.py; tests/test_export.py proves the
model zoo is never imported on load). Batch size is symbolic; pass every
(H, W) you will serve via --shapes.

Usage:
  python tools/export_serving.py --checkpoint_dir ./ckpt \
      --out model.mrisrx [--shapes 256x256,128x128] [--model_type unet]
      [--no_bf16] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "scripts")))
from _bootstrap import force_cpu_if_requested  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", default="./checkpoints")
    ap.add_argument("--checkpoint_path", default=None)
    ap.add_argument("--model_type", default="unet",
                    choices=("unet", "unet_tpu", "edsr", "simple"))
    ap.add_argument("--base_filters", type=int, default=32)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shapes", default="256x256",
                    help="comma-separated HxW list to specialize "
                         "(batch stays symbolic)")
    ap.add_argument("--platforms", default="cpu,tpu")
    ap.add_argument("--mode", default="plain",
                    choices=("plain", "tta", "int8"),
                    help="which serving program to bake in: the plain "
                         "clipped forward, the full on-device dihedral "
                         "TTA ensemble, or the frozen-scale int8 forward "
                         "(scales from --quant_calib or the checkpoint's "
                         "QAT sidecar)")
    ap.add_argument("--quant_calib", default=None,
                    help="int8 mode: JSON sidecar of frozen activation "
                         "scales (defaults to <checkpoint>.calib.json)")
    ap.add_argument("--serve_raw", action="store_true",
                    help="bake the zero-copy volume contract (plain mode "
                         "only): raw --raw_dtype inputs in the transposed "
                         "(b, w, h) NIfTI layout, device-side percentile "
                         "normalize, outputs transposed back")
    ap.add_argument("--raw_dtype", default="int16",
                    choices=("uint8", "uint16", "int16", "float32"),
                    help="stored input dtype a --serve_raw artifact "
                         "accepts (one per artifact)")
    ap.add_argument("--out_dtype", default="float32",
                    choices=("float32", "int16", "uint8"),
                    help="pack outputs on device (plain/tta modes)")
    ap.add_argument("--spatial_shards", type=int, default=1,
                    help="bake the row-sharded shard_map forward over a "
                         "(data, space) mesh into the artifact (multi-"
                         "device serving hosts, no model code); shapes "
                         "need H %% (8*shards) == 0")
    ap.add_argument("--spatial_devices", type=int, default=0,
                    help="total devices for the spatial mesh (0 = all "
                         "visible at export)")
    ap.add_argument("--spatial_batch", type=int, default=0,
                    help="concrete batch per spatial program (0 = the "
                         "data-axis width); the loader pads/chunks")
    ap.add_argument("--no_bf16", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    force_cpu_if_requested()

    from mri_superresolution_tpu.config import InferConfig, ModelConfig
    from mri_superresolution_tpu.infer.engine import load_engine
    from mri_superresolution_tpu.infer.export import export_artifact

    shapes = []
    for tok in args.shapes.split(","):
        h, w = tok.lower().split("x")
        shapes.append((int(h), int(w)))

    engine = load_engine(InferConfig(
        model=ModelConfig(model_type=args.model_type,
                          base_filters=args.base_filters),
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_path=args.checkpoint_path,
        bf16=not args.no_bf16))
    scales = None
    if args.mode == "int8":
        from mri_superresolution_tpu.models import quant_forward
        from mri_superresolution_tpu.train import checkpoint as ckpt
        calib = args.quant_calib
        if not calib:
            # the sidecar next to the checkpoint load_engine RESOLVED
            # (explicit --checkpoint_path wins), never a different one
            base = ckpt.resolve_checkpoint(args.checkpoint_dir,
                                           args.model_type,
                                           args.checkpoint_path)
            calib = ckpt.calib_sidecar_path(base)
        scales, saved_type = quant_forward.load_scales(calib)
        if saved_type != engine.model_cfg.model_type:
            raise SystemExit(f"{calib} holds scales for {saved_type!r}, "
                             f"not {engine.model_cfg.model_type!r}")
        print(f"int8 mode: {len(scales)} frozen scales from {calib}")
    export_artifact(args.out, engine.params, engine.model_cfg, shapes,
                    bf16=not args.no_bf16,
                    platforms=tuple(args.platforms.split(",")),
                    mode=args.mode, quant_scales=scales,
                    serve_raw=args.serve_raw, raw_dtype=args.raw_dtype,
                    out_dtype=args.out_dtype,
                    spatial_shards=args.spatial_shards,
                    spatial_devices=args.spatial_devices,
                    spatial_batch=args.spatial_batch)
    extra = (f" raw={args.raw_dtype}" if args.serve_raw else "") + \
        (f" out={args.out_dtype}" if args.out_dtype != "float32" else "") + \
        (f" spatial={args.spatial_shards}" if args.spatial_shards > 1
         else "")
    print(f"Wrote {args.out} ({os.path.getsize(args.out) / 2**20:.1f} MiB): "
          f"{engine.model_cfg.model_type} bf={engine.model_cfg.base_filters} "
          f"mode={args.mode}{extra} shapes={shapes} "
          f"platforms={args.platforms} "
          + ("(concrete batch per spatial program)"
             if args.spatial_shards > 1 else "(batch symbolic)"))


if __name__ == "__main__":
    main()
