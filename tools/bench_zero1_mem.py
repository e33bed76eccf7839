#!/usr/bin/env python
"""Measure ZeRO-1 (--opt_shard) per-device memory via XLA memory_analysis.

Compiles the full jitted train step on an 8-device mesh with replicated vs
ZeRO-1-sharded optimizer state and reports per-device argument/output/temp
sizes. The saving is structural (storage shardings), so it reproduces on
the virtual CPU mesh exactly as it would on a TPU pod slice.

Usage: python tools/bench_zero1_mem.py [--base_filters 32] [--batch 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_filters", type=int, default=32)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, default=64)
    args = ap.parse_args()

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mri_superresolution_tpu.config import (AugmentConfig, LossConfig,
                                                ModelConfig)
    from mri_superresolution_tpu.losses import CombinedLoss
    from mri_superresolution_tpu.models import build_model
    from mri_superresolution_tpu.parallel import zero1_shardings
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_train_step,
                                                       make_optimizer)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    rsh, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    model = build_model(ModelConfig(base_filters=args.base_filters),
                        dtype=jnp.float32)
    params = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 16, 16, 1)))["params"],
        jax.random.key(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    opt = make_optimizer(1e-5)
    opt_state = opt.init(params)
    moments_mb = sum(l.size * l.dtype.itemsize
                     for l in jax.tree_util.tree_leaves(opt_state)) / 2**20
    cfg = LossConfig(ssim_weight=0.3)
    step = build_train_step(model, CombinedLoss(cfg), opt,
                            AugmentConfig(enabled=False), cfg,
                            ema_decay=0.999)
    B, H = args.batch, args.hw

    rows = {}
    for shard in (False, True):
        full = lambda t: jax.tree_util.tree_map(lambda _: rsh, t)
        state_sh = (TrainState(step=rsh, params=full(params),
                               opt_state=zero1_shardings(opt_state, mesh),
                               ema_params=full(params))
                    if shard else rsh)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt_state,
                           ema_params=jax.tree_util.tree_map(jnp.array,
                                                             params))
        compiled = jax.jit(
            step, in_shardings=(state_sh, dsh, None, None),
            out_shardings=(state_sh, rsh), donate_argnums=(0,)).lower(
            state,
            {"lr": jax.ShapeDtypeStruct((B, H, H, 1), jnp.float32),
             "hr": jax.ShapeDtypeStruct((B, 2 * H, 2 * H, 1), jnp.float32),
             "weight": jax.ShapeDtypeStruct((B,), jnp.float32)},
            jax.ShapeDtypeStruct((), jnp.float32), jax.random.key(1)
        ).compile()
        m = compiled.memory_analysis()
        rows[shard] = m
        print(f"opt_shard={shard}: per-device arg "
              f"{m.argument_size_in_bytes / 2**20:.2f} MiB, out "
              f"{m.output_size_in_bytes / 2**20:.2f} MiB, temp "
              f"{m.temp_size_in_bytes / 2**20:.2f} MiB", flush=True)

    saved = (rows[False].argument_size_in_bytes -
             rows[True].argument_size_in_bytes) / 2**20
    print(f"\nAdam moments total: {moments_mb:.2f} MiB; per-device argument "
          f"saving with ZeRO-1: {saved:.2f} MiB "
          f"(expected ~7/8 of moments = {moments_mb * 7 / 8:.2f} MiB)")


if __name__ == "__main__":
    main()
