#!/usr/bin/env python
"""Measured --tta serving cost: host-side transform loop vs the on-device
dihedral ensemble (ops/tta.py, engine `_tta_once`).

Two numbers per variant:

1. ENGINE WALL TIME (the user-visible one): `upscale_batch` on a square
   256^2 batch, which synchronizes via its host fetch — so wall clock is a
   valid engine-level measure even on the axon tunnel (where
   block_until_ready does not block, CLAUDE.md). The host loop pays
   n_transforms serialized upload/forward/fetch round trips; the device
   ensemble pays one. Through the tunnel the transfer term is inflated by
   RPC latency vs a directly-attached chip, so the gap here is an upper
   bound on the attached-TPU gap — the direction and the 8x data-motion
   arithmetic hold anywhere.

2. COMPUTE-ONLY (chained, transfer-free): the jitted ensemble chained in a
   lax.fori_loop exactly like bench.py, giving the pure device cost of the
   8-forward program vs 8x the single forward — i.e. whether XLA's
   scheduling of the fused ensemble beats dispatching the passes one by one.

Usage: python tools/bench_tta.py [--batch 64] [--hw 256] [--cpu]
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
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--model", default="unet",
                    choices=("unet", "unet_tpu", "edsr", "simple"))
    ap.add_argument("--bucket", type=int, default=1,
                    help="engine shape bucket; with a non-aligned --hw this "
                         "measures the PADDED on-device ensemble (members "
                         "padded in-program) vs the padded host loop")
    ap.add_argument("--spatial", type=int, default=1,
                    help="row-shard each slice over this many mesh devices "
                         "and measure the SPATIAL on-device ensemble (r4: "
                         "the lax.fori_loop wraps the shard_map forward) "
                         "vs the spatial host loop. Needs spatial | "
                         "visible devices — use --cpu with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count"
                         "=8 on a 1-chip host")
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
    eng = InferenceEngine(cfg, params, tta=True, bucket=args.bucket,
                          num_devices=0 if args.spatial > 1 else 1,
                          spatial_shards=args.spatial)

    batch = np.random.default_rng(0).random(
        (args.batch, args.hw, args.hw), dtype=np.float32)

    # --- 1) engine wall time -------------------------------------------
    def run_device():
        t0 = time.perf_counter()
        y = eng.upscale_batch(batch)           # on-device ensemble route
        assert y.shape[1] == 2 * args.hw
        return time.perf_counter() - t0

    def run_host():
        # the fallback path's exact loop: 8 transforms through the
        # single-forward program, one round trip each
        t0 = time.perf_counter()
        n, h, w = batch.shape
        tr = lambda a: np.ascontiguousarray(a.transpose(0, 2, 1))
        flips = [(lambda x: x, lambda y: y),
                 (lambda x: x[:, ::-1], lambda y: y[:, ::-1]),
                 (lambda x: x[:, :, ::-1], lambda y: y[:, :, ::-1]),
                 (lambda x: x[:, ::-1, ::-1], lambda y: y[:, ::-1, ::-1])]
        transforms = flips + [(lambda x, f=f: f(tr(x)),
                               lambda y, f=f: tr(f(y))) for f, _ in flips]
        acc = np.zeros((n, 2 * h, 2 * w), np.float32)
        for t, inv in transforms:
            acc += inv(eng._upscale_once(np.ascontiguousarray(t(batch))))
        return time.perf_counter() - t0

    def run_plain():
        t0 = time.perf_counter()
        eng._upscale_once(batch)
        return time.perf_counter() - t0

    def best(fn):
        fn()                                   # warm/compile
        return min(fn() for _ in range(args.repeats))

    t_plain = best(run_plain)
    t_dev = best(run_device)
    t_host = best(run_host)

    # --- 2) compute-only, chained (bench.py pattern) -------------------
    from mri_superresolution_tpu.ops.tta import build_tta_ensemble
    if args.spatial > 1:
        from mri_superresolution_tpu.parallel.spatial import (
            build_spatial_forward_raw)
        bh, bw = eng._bucket_hw(args.hw, args.hw)
        sp_raw = build_spatial_forward_raw(eng.mesh, (bh, bw),
                                           model_type=args.model)
        fwd = lambda p, x: jnp.clip(sp_raw(p, x), 0.0, 1.0)
    else:
        fwd = lambda p, x: jnp.clip(model.apply({"params": p}, x), 0.0, 1.0)
    ens = build_tta_ensemble(fwd, square=True, bucket_fn=eng._bucket_hw)

    def chain_time(f):
        @jax.jit
        def chain(p, x, n):
            def body(_, a):
                out = f(p, a)
                return a + (1e-20 * jnp.mean(out)).astype(a.dtype)
            return jax.lax.fori_loop(0, n, body, x)

        x = jnp.asarray(batch[..., None])
        p = eng.params

        def t(n):
            t0 = time.perf_counter()
            float(jnp.sum(chain(p, x, n)))
            return time.perf_counter() - t0

        t(1)
        t1 = min(t(1) for _ in range(3))
        t2 = min(t(5) for _ in range(3))
        return max((t2 - t1) / 4, 1e-9)

    c_single = chain_time(fwd)
    c_ens = chain_time(ens)

    n = args.batch
    res = {
        "model": args.model, "batch": n, "hw": args.hw,
        "spatial_shards": args.spatial,
        "wall_plain_ms": round(t_plain * 1e3, 1),
        "wall_tta_host_ms": round(t_host * 1e3, 1),
        "wall_tta_device_ms": round(t_dev * 1e3, 1),
        "wall_speedup_device_vs_host": round(t_host / t_dev, 2),
        "tta_wall_cost_vs_plain": round(t_dev / t_plain, 2),
        "chained_single_ms": round(c_single * 1e3, 2),
        "chained_ensemble_ms": round(c_ens * 1e3, 2),
        "ensemble_vs_8x_single": round(c_ens / (8 * c_single), 3),
        "tta_device_slices_per_s": round(n / t_dev, 1),
        "plain_slices_per_s": round(n / t_plain, 1),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
