#!/usr/bin/env python
"""Component-level timing of the U-Net forward at 256² (batch 128, bf16).

Chained-iteration timing (see bench.py for why: the axon tunnel's
block_until_ready does not synchronize). Each variant is wrapped so its
output feeds the next iteration through a non-foldable dependency.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mri_superresolution_tpu.models import UNetSuperRes
from mri_superresolution_tpu.models.unet import DoubleConv, Down, Up, PixelShuffleUp
from mri_superresolution_tpu.ops.resize import upsample_bilinear_align_corners

B, HW = 128, 256
DT = jnp.bfloat16


class EncoderOnly(nn.Module):
    f: int = 32

    @nn.compact
    def __call__(self, x):
        x = x.astype(DT)
        x1 = DoubleConv(self.f, dtype=DT)(x)
        x2 = Down(self.f * 2, dtype=DT)(x1)
        x3 = Down(self.f * 4, dtype=DT)(x2)
        x4 = Down(self.f * 8, dtype=DT)(x3)
        return x4


class EncDec(nn.Module):
    f: int = 32

    @nn.compact
    def __call__(self, x):
        x = x.astype(DT)
        x1 = DoubleConv(self.f, dtype=DT)(x)
        x2 = Down(self.f * 2, dtype=DT)(x1)
        x3 = Down(self.f * 4, dtype=DT)(x2)
        x4 = Down(self.f * 8, dtype=DT)(x3)
        y = Up(self.f * 4, dtype=DT)(x4, x3)
        y = Up(self.f * 2, dtype=DT)(y, x2)
        y = Up(self.f, dtype=DT)(y, x1)
        return y


class FinalStage(nn.Module):
    """Just the dual-branch 2x + final convs, fed f-channel input."""
    f: int = 32

    @nn.compact
    def __call__(self, y):
        y = y.astype(DT)
        yb = upsample_bilinear_align_corners(y, 2)
        yb = nn.Conv(self.f // 2, (3, 3), padding=1, use_bias=False,
                     dtype=DT)(yb)
        yb = nn.leaky_relu(nn.GroupNorm(8, epsilon=1e-5, dtype=DT)(yb), 0.2)
        yp = PixelShuffleUp(self.f // 2, dtype=DT)(y)
        out = 0.5 * yb + 0.5 * yp
        out = nn.Conv(self.f // 2, (3, 3), padding=1, use_bias=False,
                      dtype=DT)(out)
        out = nn.leaky_relu(nn.GroupNorm(8, epsilon=1e-5, dtype=DT)(out), 0.2)
        out = nn.Conv(1, (1, 1), dtype=DT)(out)
        return jax.nn.sigmoid(out.astype(jnp.float32))


def timed_variant(name, module, in_shape):
    x0 = jnp.asarray(np.random.default_rng(0).random(in_shape, np.float32))
    params = jax.jit(module.init)(jax.random.key(0), x0)

    @jax.jit
    def chain(p, x, n):
        def body(_, a):
            out = module.apply(p, a)
            # non-foldable feedback: out must be computed every iteration
            return a + (1e-20 * jnp.mean(out.astype(jnp.float32))).astype(a.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    def t(n):
        t0 = time.perf_counter()
        float(jnp.sum(chain(params, x0, n)))
        return time.perf_counter() - t0

    t(1)
    t1 = min(t(2) for _ in range(3))
    t2 = min(t(8) for _ in range(3))
    per = (t2 - t1) / 6
    print(f"{name:<28} {per * 1e3:8.2f} ms/step  "
          f"{per / B * 1e6:7.1f} us/slice")
    return per


def main():
    print(f"batch={B}, input {HW}x{HW}, bf16")
    full = timed_variant("full U-Net", UNetSuperRes(base_filters=32, dtype=DT),
                         (B, HW, HW, 1))
    enc = timed_variant("encoder only", EncoderOnly(), (B, HW, HW, 1))
    encdec = timed_variant("encoder+decoder", EncDec(), (B, HW, HW, 1))
    fin = timed_variant("final 2x stage only", FinalStage(), (B, HW, HW, 32))
    print(f"\nimplied decoder: {(encdec - enc) * 1e3:.2f} ms, "
          f"implied final: {(full - encdec) * 1e3:.2f} ms "
          f"(direct final: {fin * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
