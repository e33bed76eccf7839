#!/usr/bin/env python
"""Measured pipelined volume serving: `upscale_batches` (depth-1 double
buffering — dispatch batch i+1 before fetching batch i) vs the sequential
`upscale_batch` loop it replaces in scripts/infer_volume.py.

Wall clock is the right measure here BY DESIGN: both legs synchronize via
their host fetches (`np.asarray` genuinely waits for the output bytes even
on the axon tunnel, unlike `block_until_ready` — CLAUDE.md), and the
quantity under test IS the host-visible serving time of a multi-batch
stream: per batch the sequential loop pays upload + forward + fetch
end-to-end, while the pipelined loop hides upload + forward of batch i+1
under batch i's fetch RPC (output = 4*N*(2h*2w) bytes, the stream's
dominant transfer). Through the tunnel the fetch term is inflated by RPC
latency vs a directly-attached chip, so the speedup here is an upper bound
on the attached-TPU gap — the direction holds anywhere the fetch is not
free. Outputs are asserted identical to the sequential loop's.

Usage: python tools/bench_pipeline.py [--batch 64] [--hw 256] [--nbatches 8]
                                      [--model unet] [--tta] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--nbatches", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--model", default="unet",
                    choices=("unet", "unet_tpu", "edsr", "simple"))
    ap.add_argument("--tta", action="store_true",
                    help="pipeline the on-device TTA ensemble instead of "
                         "the plain forward")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from mri_superresolution_tpu.config import ModelConfig
    from mri_superresolution_tpu.infer.engine import InferenceEngine
    from mri_superresolution_tpu.models import build_model, init_params

    cfg = ModelConfig(model_type=args.model, base_filters=32)
    model = build_model(cfg, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.key(0), (64, 64))
    eng = InferenceEngine(cfg, params, tta=args.tta)

    rng = np.random.default_rng(0)
    batches = [rng.random((args.batch, args.hw, args.hw), dtype=np.float32)
               for _ in range(args.nbatches)]

    def run_seq():
        t0 = time.perf_counter()
        outs = [eng.upscale_batch(b) for b in batches]
        return time.perf_counter() - t0, outs

    def run_pipe():
        t0 = time.perf_counter()
        outs = list(eng.upscale_batches(iter(batches)))
        return time.perf_counter() - t0, outs

    # warm/compile both legs, and pin pipelined == sequential outputs
    _, ref = run_seq()
    _, got = run_pipe()
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        assert r.shape == g.shape and np.array_equal(r, g), \
            "pipelined outputs differ from the sequential loop"

    t_seq = min(run_seq()[0] for _ in range(args.repeats))
    t_pipe = min(run_pipe()[0] for _ in range(args.repeats))

    n_slices = args.batch * args.nbatches
    res = {
        "model": args.model, "tta": args.tta, "batch": args.batch,
        "hw": args.hw, "nbatches": args.nbatches,
        "wall_sequential_s": round(t_seq, 3),
        "wall_pipelined_s": round(t_pipe, 3),
        "speedup": round(t_seq / t_pipe, 3),
        "seq_slices_per_s": round(n_slices / t_seq, 1),
        "pipe_slices_per_s": round(n_slices / t_pipe, 1),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
