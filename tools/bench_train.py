#!/usr/bin/env python
"""Training-step throughput probe (VERDICT round-1 item 9).

Times the full jitted train step (bf16 model, augmentation on/off, L1+SSIM,
torch-parity Adam) at several batch sizes on the real chip. Chained
fori_loop timing (bench.py pattern).
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import (AugmentConfig, LossConfig,
                                            ModelConfig)
from mri_superresolution_tpu.losses import CombinedLoss
from mri_superresolution_tpu.models import build_model
from mri_superresolution_tpu.train.trainer import (TrainState,
                                                   build_train_step,
                                                   make_optimizer)

HW = 128  # LR input size (HR = 256), the training default


def bench(model_type, batch, augment):
    model = build_model(ModelConfig(model_type=model_type, base_filters=32),
                        dtype=jnp.bfloat16)
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 32, 32, 1)))["params"])(jax.random.key(0))
    optimizer = make_optimizer(1e-5)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params))
    loss_cfg = LossConfig(ssim_weight=0.3)
    step = build_train_step(model, CombinedLoss(loss_cfg), optimizer,
                            AugmentConfig(enabled=augment), loss_cfg)

    rng = np.random.default_rng(0)
    batch_data = {
        "lr": jnp.asarray(rng.random((batch, HW, HW, 1), np.float32)),
        "hr": jnp.asarray(rng.random((batch, 2 * HW, 2 * HW, 1), np.float32)),
        "weight": jnp.ones((batch,), jnp.float32),
    }
    lr_val = jnp.asarray(1e-4, jnp.float32)

    @jax.jit
    def chain(st, n):
        def body(i, s):
            key = jax.random.fold_in(jax.random.key(0), i)
            s2, _ = step(s, batch_data, lr_val, key)
            return s2
        return jax.lax.fori_loop(0, n, body, st)

    def t(st, n):
        t0 = time.perf_counter()
        out = chain(st, n)
        float(jnp.sum(out.params["final_conv2"]["bias"]
                      if "final_conv2" in out.params else
                      jax.tree_util.tree_leaves(out.params)[0]))
        return time.perf_counter() - t0

    t(state, 1)
    t1 = min(t(state, 2) for _ in range(3))
    t2 = min(t(state, 8) for _ in range(3))
    per = (t2 - t1) / 6
    print(f"{model_type:<10} B={batch:<4} aug={str(augment):<5} "
          f"{per * 1e3:7.2f} ms/step  {batch / per:7.0f} slices/s/chip",
          flush=True)


def main():
    for model_type in ("unet", "unet_tpu"):
        for batch, aug in ((64, False), (64, True), (128, True),
                           (192, True)):
            try:
                bench(model_type, batch, aug)
            except Exception as e:
                print(f"{model_type} B={batch}: failed "
                      f"({type(e).__name__})", flush=True)


if __name__ == "__main__":
    main()
