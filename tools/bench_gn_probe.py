#!/usr/bin/env python
"""GroupNorm probe: XLA (flax) GroupNorm+LeakyReLU vs the one-pass fused
Pallas kernel (ops/groupnorm_pallas.py) at every activation shape the
parity U-Net touches, batch 128 bf16.

Chained-iteration timing (bench.py pattern — the axon tunnel's
block_until_ready does not synchronize).
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from mri_superresolution_tpu.experiments.groupnorm_pallas import (
    fused_group_norm_leaky, pallas_supported)

B = 128
DT = jnp.bfloat16

# (H, W, C, count_in_model) — parity unet at 256^2 input, base_filters 32
SHAPES = [
    (512, 512, 16, 3),   # final stage: up_norm, pixelshuffle norm, final_norm
    (256, 256, 32, 5),   # inc x2, up3 x3
    (128, 128, 64, 5),   # down1 x2, up2 x3
    (64, 64, 128, 5),    # down2 x2, up1 x3
    (32, 32, 256, 2),    # down3 x2
]


def timed(name, fn, x0):
    @jax.jit
    def chain(x, n):
        def body(_, a):
            out = fn(a)
            return a + (1e-20 * jnp.mean(out.astype(jnp.float32))).astype(a.dtype)
        return lax.fori_loop(0, n, body, x)

    def t(n):
        t0 = time.perf_counter()
        float(jnp.sum(chain(x0, n)))
        return time.perf_counter() - t0

    t(1)
    t1 = min(t(2) for _ in range(3))
    t2 = min(t(10) for _ in range(3))
    per = (t2 - t1) / 8
    print(f"{name:<44} {per * 1e3:8.3f} ms/step", flush=True)
    return per


def main():
    total_xla = total_pal = 0.0
    for h, w, c, count in SHAPES:
        scale = jnp.asarray(np.random.default_rng(0).normal(size=c),
                            jnp.float32)
        bias = jnp.asarray(np.random.default_rng(1).normal(size=c),
                           jnp.float32)
        x = jnp.asarray(
            np.random.default_rng(2).random((B, h, w, c), np.float32),
            DT)

        gn = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=DT)

        def xla_fn(a):
            y = gn.apply({"params": {"scale": scale, "bias": bias}}, a)
            return nn.leaky_relu(y, 0.2)

        def pal_fn(a):
            return fused_group_norm_leaky(a, scale, bias)

        sup = pallas_supported(x.shape, x.dtype, 8)
        bw_floor = 3 * B * h * w * c * 2 / 819e9 * 1e3
        print(f"-- ({h},{w},{c}) x{count}  two-pass floor ~{bw_floor:.2f} ms"
              f"  pallas_supported={sup}")
        tx = timed("  xla groupnorm+leaky", xla_fn, x)
        tp = timed("  pallas fused one-pass", pal_fn, x) if sup else tx
        # numerical check on-device
        if sup:
            dx = np.asarray(jnp.max(jnp.abs(
                xla_fn(x).astype(jnp.float32)
                - pal_fn(x).astype(jnp.float32))))
            print(f"  max |xla - pallas| = {dx:.3e}")
        total_xla += tx * count
        total_pal += tp * count
    print(f"\nmodel total: xla {total_xla * 1e3:.2f} ms"
          f" -> pallas {total_pal * 1e3:.2f} ms"
          f"  (saving {(total_xla - total_pal) * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    main()
