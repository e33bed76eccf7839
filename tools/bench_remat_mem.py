#!/usr/bin/env python
"""Compiled-memory evidence for the three training memory levers.

XLA's ``compiled.memory_analysis()`` reports the executable's planned HBM
use (argument/output/temp/generated-code sizes) without running a step, so
this works single-chip and through the axon tunnel:

1. --remat (jax.checkpoint): dense B x 256^2 bf16 train step, temp bytes
   with and without rematerialization.
2. --spatial_shards: the shard_map train step on a virtual (1, N) CPU mesh
   at fixed GLOBAL batch/shape; per-device temp bytes should scale ~1/N.
3. --accum N: dense train step with N-way gradient accumulation
   (lax.scan over microbatches) vs accum=1 at the same global batch; temp
   bytes should scale ~1/N (one microbatch tape live at a time).

Usage:
  python tools/bench_remat_mem.py                # TPU remat A/B (compile only)
  python tools/bench_remat_mem.py --spatial      # CPU-mesh spatial scaling
  python tools/bench_remat_mem.py --spatial --remat   # both levers composed
  python tools/bench_remat_mem.py --accum 4      # TPU grad-accum A/B
  python tools/bench_remat_mem.py --accum 4 --remat   # accum + remat composed
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def _fmt(b):
    return f"{b / 1e9:.3f} GB" if b > 1e8 else f"{b / 1e6:.1f} MB"


def _report(tag, compiled):
    ma = compiled.memory_analysis()
    print(f"{tag}: temp={_fmt(ma.temp_size_in_bytes)} "
          f"args={_fmt(ma.argument_size_in_bytes)} "
          f"out={_fmt(ma.output_size_in_bytes)} "
          f"alias={_fmt(ma.alias_size_in_bytes)}", flush=True)
    return ma.temp_size_in_bytes


def dense_remat_ab(batch, hw, accum=None, remat_with_accum=False):
    """A/B the dense train step's planned temp bytes: remat on/off
    (accum=None) or grad_accum 1/N (accum=N; --remat composes remat in on
    both sides so the deltas stay attributable to one lever)."""
    import jax
    import jax.numpy as jnp

    from mri_superresolution_tpu.config import (AugmentConfig, LossConfig,
                                                ModelConfig)
    from mri_superresolution_tpu.losses import CombinedLoss
    from mri_superresolution_tpu.models import build_model
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_train_step,
                                                       make_optimizer)

    base = build_model(ModelConfig(base_filters=32), dtype=jnp.bfloat16)
    params = jax.jit(lambda r: base.init(
        r, jnp.zeros((1, 16, 16, 1)))["params"])(jax.random.key(0))
    opt = make_optimizer(1e-5)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt.init(params))
    cfg = LossConfig(ssim_weight=0.3)
    h, w = hw
    batch_spec = {
        "lr": jax.ShapeDtypeStruct((batch, h, w, 1), jnp.float32),
        "hr": jax.ShapeDtypeStruct((batch, 2 * h, 2 * w, 1), jnp.float32),
        "weight": jax.ShapeDtypeStruct((batch,), jnp.float32),
    }
    if accum is None:
        variants = [("remat=False", dict(remat=False)),
                    ("remat=True", dict(remat=True))]
    else:
        variants = [(f"accum=1 remat={remat_with_accum}",
                     dict(remat=remat_with_accum, grad_accum=1)),
                    (f"accum={accum} remat={remat_with_accum}",
                     dict(remat=remat_with_accum, grad_accum=accum))]
    temps = {}
    for tag, kw in variants:
        model = build_model(ModelConfig(base_filters=32),
                            dtype=jnp.bfloat16, remat=kw.get("remat", False))
        step = jax.jit(build_train_step(model, CombinedLoss(cfg), opt,
                                        AugmentConfig(enabled=False), cfg,
                                        **kw),
                       donate_argnums=(0,))
        compiled = step.lower(state, batch_spec,
                              jax.ShapeDtypeStruct((), jnp.float32),
                              jax.ShapeDtypeStruct((), jax.random.key(0).dtype
                                                   )).compile()
        temps[tag] = _report(f"dense B={batch} {h}x{w} {tag}", compiled)
    (t0, v0), (t1, v1) = temps.items()
    print(f"temp ratio {t1} / {t0}: {v1 / v0:.3f}", flush=True)


def spatial_scaling(batch, hw, remat=False, qat=False):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mri_superresolution_tpu.config import AugmentConfig, LossConfig
    from mri_superresolution_tpu.parallel import (build_spatial_loss,
                                                  make_spatial_mesh)
    from mri_superresolution_tpu.models import build_model
    from mri_superresolution_tpu.config import ModelConfig
    from mri_superresolution_tpu.train.trainer import (TrainState,
                                                       build_spatial_train_step,
                                                       make_optimizer)

    model = build_model(ModelConfig(base_filters=32), dtype=jnp.bfloat16)
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 16, 16, 1)))["params"])(jax.random.key(0))
    opt = make_optimizer(1e-5)
    cfg = LossConfig(ssim_weight=0.3)
    h, w = hw
    qat_amax0 = None
    if qat:
        # QAT x spatial (VERDICT r4 item 7): model-side remat segments are
        # DISABLED under QAT (trace-time fakequant ctx may not cross a
        # jax.checkpoint scope); the loss-graph checkpoint still applies
        # when remat=True. This A/B measures what that combination costs.
        from mri_superresolution_tpu.models import quant_forward
        qat_amax0 = quant_forward.amax_template(
            params, (1, h, w, 1), "unet", dtype=jnp.bfloat16)
        qat_amax0 = {k: jnp.ones(v.shape, jnp.float32)
                     for k, v in qat_amax0.items()}
    for n_space in (1, 2, 4, 8):
        mesh = make_spatial_mesh(1, n_space)
        rsh = NamedSharding(mesh, P())
        x4 = NamedSharding(mesh, P("data", "space"))
        dsh = {"hr": x4, "lr": x4, "weight": NamedSharding(mesh, P("data"))}
        state = jax.device_put(
            TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt.init(params), qat_amax=qat_amax0),
            rsh)
        sl = build_spatial_loss(
            mesh, hw, cfg, "unet", jnp.bfloat16, remat=remat,
            qat_sites=sorted(qat_amax0) if qat else None)
        step = jax.jit(build_spatial_train_step(
                           sl, opt, AugmentConfig(enabled=False),
                           qat=qat, qat_decay=0.98 if qat else 0.0),
                       in_shardings=(rsh, dsh, None, None),
                       out_shardings=(rsh, rsh), donate_argnums=(0,))
        batch_spec = {
            "lr": jax.ShapeDtypeStruct((batch, h, w, 1), jnp.float32,
                                       sharding=dsh["lr"]),
            "hr": jax.ShapeDtypeStruct((batch, 2 * h, 2 * w, 1), jnp.float32,
                                       sharding=dsh["hr"]),
            "weight": jax.ShapeDtypeStruct((batch,), jnp.float32,
                                           sharding=dsh["weight"]),
        }
        compiled = step.lower(
            state, batch_spec, jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((), jax.random.key(0).dtype)).compile()
        # memory_analysis is per-executable = per-device under SPMD
        _report(f"spatial{'+qat' if qat else ''} n_space={n_space} "
                f"global B={batch} {h}x{w}"
                + (" remat(loss-graph only under qat)" if remat else ""),
                compiled)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spatial", action="store_true",
                    help="CPU-mesh spatial temp-memory scaling instead of "
                         "the TPU remat A/B")
    ap.add_argument("--remat", action="store_true",
                    help="with --spatial/--accum: compose remat in on both "
                         "sides of the comparison")
    ap.add_argument("--qat", action="store_true",
                    help="with --spatial: the QAT fakequant spatial step "
                         "(model-side remat disabled by design; --remat "
                         "keeps the loss-graph checkpoint)")
    ap.add_argument("--accum", type=int, default=None,
                    help="A/B grad_accum=1 vs grad_accum=N at the same "
                         "global batch instead of the remat A/B")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 256))
    args = ap.parse_args()

    if args.spatial:
        os.environ.setdefault("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        spatial_scaling(args.batch, tuple(args.hw), remat=args.remat,
                        qat=args.qat)
    else:
        dense_remat_ab(args.batch, tuple(args.hw), accum=args.accum,
                       remat_with_accum=args.remat)


if __name__ == "__main__":
    main()
