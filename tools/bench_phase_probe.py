#!/usr/bin/env python
"""Probe: MXU time of the parity U-Net's lane-starved final-stage convs vs
their exact phase-space (space-to-depth) reformulations.

Theory (VERDICT round-1 item 2): a 3x3/s1 conv at 512^2 with Cout=16 uses
16/128 MXU lanes; the same math as a 2x2 conv at 256^2 over 4-phase channel
stacks has Cout=64 and 16/9 the MACs -> ~2.25x less MXU time.

Chained fori_loop timing (bench.py pattern — block_until_ready does not
synchronize on the axon tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B = 128
DT = jnp.bfloat16


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
    t2 = min(t(8) for _ in range(3))
    per = (t2 - t1) / 6
    print(f"{name:<44} {per * 1e3:8.2f} ms/step", flush=True)
    return per


def conv(x, k, stride=1, pad=1):
    return lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.random(shape, np.float32), DT)

    # baseline final_up_conv: 3x3 32->16 @512^2
    k1 = mk((3, 3, 32, 16))
    timed("3x3 32->16 @512^2 (final_up_conv now)",
          lambda x: conv(x, k1), mk((B, 512, 512, 32)))

    # phase version: 2x2 128->64 @256^2 -> 257^2
    k2 = mk((2, 2, 128, 64))
    timed("2x2 128->64 @256^2 pad1 (phase up_conv)",
          lambda x: conv(x, k2, pad=1)[:, :256, :256, :],
          mk((B, 256, 256, 128)))

    # baseline final_conv1: 3x3 16->16 @512^2
    k3 = mk((3, 3, 16, 16))
    timed("3x3 16->16 @512^2 (final_conv1 now)",
          lambda x: conv(x, k3), mk((B, 512, 512, 16)))

    # phase version: 2x2 64->64
    k4 = mk((2, 2, 64, 64))
    timed("2x2 64->64 @256^2 pad1 (phase conv1)",
          lambda x: conv(x, k4, pad=1)[:, :256, :256, :],
          mk((B, 256, 256, 64)))

    # 4x4 stride-2 alternative for up_conv (input at 512^2)
    k5 = mk((4, 4, 32, 64))
    timed("4x4/s2 32->64 @512^2->256^2 (alt)",
          lambda x: lax.conv_general_dilated(
              x, k5, (2, 2), ((1, 2), (1, 2)),
              dimension_numbers=("NHWC", "HWIO", "NHWC")),
          mk((B, 512, 512, 32)))

    # GroupNorm-ish traffic probe: mean/var + affine at 512^2x16 vs 256^2x64
    def gn(x):
        g = x.reshape(x.shape[0], -1, 8, x.shape[-1] // 8)
        m = jnp.mean(g.astype(jnp.float32), axis=(1, 3), keepdims=True)
        v = jnp.mean(jnp.square(g.astype(jnp.float32)), axis=(1, 3),
                     keepdims=True) - jnp.square(m)
        return ((g - m.astype(DT)) * lax.rsqrt(v + 1e-5).astype(DT)).reshape(x.shape)

    timed("GN(8) @512^2x16", gn, mk((B, 512, 512, 16)))
    timed("GN(8) @256^2x64", gn, mk((B, 256, 256, 64)))


if __name__ == "__main__":
    main()
