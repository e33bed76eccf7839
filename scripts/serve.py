#!/usr/bin/env python
"""Serving daemon: dynamic-batching HTTP inference server.

Framework extension beyond the reference (whose serving story is one
process per image, /root/reference/scripts/infer.py:398-450): concurrent
clients' slices coalesce into batched TPU forwards
(infer/server.DynamicBatcher). Serves from a checkpoint (full engine:
int8/TTA/bucketing) or from a portable AOT artifact (no model code).

    POST /upscale   .npy (H, W) or (N, H, W) float [0,1] -> .npy 2x
    GET  /healthz   backend + batching stats JSON
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from scripts._bootstrap import force_cpu_if_requested  # noqa: E402


def main():
    ap = argparse.ArgumentParser(
        description="Dynamic-batching HTTP inference server")
    ap.add_argument("--checkpoint_dir", default="./checkpoints")
    ap.add_argument("--checkpoint_path", default=None)
    ap.add_argument("--artifact", default=None,
                    help="serve from a portable AOT artifact instead of "
                         "a checkpoint (no model code loaded; unexported "
                         "shapes pad to the smallest fitting program)")
    ap.add_argument("--model_type", default="unet",
                    choices=["unet", "unet_tpu", "edsr", "simple"])
    ap.add_argument("--base_filters", type=int, default=32)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8476)
    ap.add_argument("--max_batch", type=int, default=64,
                    help="largest coalesced device batch")
    ap.add_argument("--batch_window_ms", type=float, default=5.0,
                    help="linger this long after the first request for "
                         "stragglers to coalesce")
    ap.add_argument("--bucket", type=int, default=1)
    ap.add_argument("--spatial_shards", type=int, default=1,
                    help="row-shard each slice over this many mesh "
                         "devices (halo-exchange spatial parallelism "
                         "for slices too large per chip)")
    ap.add_argument("--quant", choices=["none", "int8"], default="none")
    ap.add_argument("--quant_calib", default=None)
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--num_devices", type=int, default=0,
                    help="DP-shard coalesced batches over this many mesh "
                         "devices (0 = all visible; checkpoint backend "
                         "only)")
    ap.add_argument("--serve_raw", action="store_true",
                    help="zero-copy transfer path (measured 2.6x e2e on "
                         "the tunnel link): /upscale_volume submits RAW "
                         "stored-dtype voxels, the percentile normalize "
                         "runs ON DEVICE (transpose_io layout), and "
                         "/upscale accepts native-dtype arrays. "
                         "Checkpoint backend only; not with --quant int8 "
                         "(host-side routing reads normalized pixels)")
    ap.add_argument("--out_dtype", default="float32",
                    choices=["float32", "int16", "uint8"],
                    help="pack outputs ON DEVICE to this dtype (1-2 "
                         "bytes/pixel responses; volume responses carry "
                         "the NIfTI scl_slope that decodes back to [0,1])")
    ap.add_argument("--max_pending", type=int, default=2048,
                    help="bounded request queue: submissions beyond this "
                         "get 503 + Retry-After (load shedding)")
    ap.add_argument("--max_body_mb", type=int, default=512,
                    help="request bodies over this size get 413")
    ap.add_argument("--request_timeout_s", type=float, default=300.0,
                    help="requests unserved after this long get 504 and "
                         "are abandoned (never run on the device)")
    ap.add_argument("--no_bf16", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    force_cpu_if_requested()

    from mri_superresolution_tpu.infer.server import serve_http
    from mri_superresolution_tpu.utils.logging import setup_logging

    logger = setup_logging("serving.log")
    if args.artifact:
        from mri_superresolution_tpu.infer.export import load_artifact
        backend = load_artifact(args.artifact)
        # engine-side flags must not be silently dropped: a mode the
        # artifact bakes in is satisfied; anything else is refused
        # (infer_volume.py's exact policy)
        bad = [name for name, on in
               (("--quant", args.quant != "none"
                 and backend.mode != "int8"),
                ("--tta", args.tta and backend.mode != "tta"),
                # satisfied when the artifact bakes the sharded program
                ("--spatial_shards", args.spatial_shards != 1
                 and (backend.spatial or {}).get("n_space")
                 != args.spatial_shards),
                ("--num_devices", args.num_devices != 0),
                ("--serve_raw", args.serve_raw
                 and not backend.normalize_inputs),
                ("--out_dtype", args.out_dtype != "float32"
                 and __import__("numpy").dtype(args.out_dtype)
                 != backend.out_dtype))
               if on]
        if bad:
            logger.error(
                f"--artifact is incompatible with {', '.join(bad)}; bake "
                "those modes into the artifact at export time "
                "(tools/export_serving.py --mode tta|int8) or serve from "
                "a checkpoint")
            return 1
        if args.bucket != 1:
            logger.warning("--bucket is IGNORED with --artifact (programs "
                           "run at their exported shapes)")
        describe = (f"artifact {os.path.basename(args.artifact)} "
                    f"{backend.model_type} mode={backend.mode} "
                    f"shapes={backend.shapes}")
        logger.info(f"Serving from artifact: {describe}")
    else:
        from mri_superresolution_tpu.config import InferConfig, ModelConfig
        from mri_superresolution_tpu.infer import load_engine
        backend = load_engine(InferConfig(
            model=ModelConfig(model_type=args.model_type,
                              base_filters=args.base_filters),
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_path=args.checkpoint_path,
            bf16=not args.no_bf16, bucket=args.bucket,
            spatial_shards=args.spatial_shards,
            quant=args.quant, quant_calib_path=args.quant_calib,
            tta=args.tta,
            normalize_inputs=args.serve_raw,
            # the ensemble's transform table is (N, h, w); raw TTA keeps
            # device normalize but standard layout (engine contract)
            transpose_io=args.serve_raw and not args.tta,
            out_dtype=args.out_dtype), num_devices=args.num_devices)
        describe = (f"checkpoint {backend.model_cfg.model_type} "
                    f"bf={backend.model_cfg.base_filters} "
                    f"quant={args.quant} tta={args.tta} "
                    f"raw={args.serve_raw} out={args.out_dtype}")
    import signal
    import threading

    server = serve_http(backend, host=args.host, port=args.port,
                        max_batch=args.max_batch,
                        batch_window_ms=args.batch_window_ms,
                        describe=describe,
                        max_pending=args.max_pending,
                        max_body_bytes=args.max_body_mb << 20,
                        request_timeout_s=args.request_timeout_s)

    def _stop(signum, frame):
        logger.info(f"Signal {signum}; draining and shutting down")
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    try:
        server.serve_forever()
    finally:
        # join in-flight handler threads (block_on_close) BEFORE closing
        # the batcher, so accepted requests finish being served
        server.server_close()
        server.batcher.close()
        logger.info("Server stopped")
    return 0


if __name__ == "__main__":
    sys.exit(main())
