#!/usr/bin/env python
"""Probe 3: quantize-pass variants (round 3, VERDICT item 1).

bench_int8_probe2.py measured the bf16->int8 static quantize at ~2.4x its
bandwidth floor; bench_int8_hlo.py shows why: the s8 output is written in
the conv's preferred packed layout ((4,1) sublane packing), and XLA's cost
model itself prices that fused write at ~10x the floor at the final-stage
shape. This probe times alternative formulations of the SAME math:

  f32      — current ops/quant.py: round/clip in f32, convert to s8
  bf16     — round/clip in bf16 (integers <=127 are exact in bf16)
  packed   — compute the four packed bytes in s32 arithmetic and
             bitcast_convert_type to s8: the expensive (4,1)-packed s8
             store becomes a plain s32 store + a (nominally free) bitcast
  site-*   — each variant composed into the serving site
             (leaky -> quantize -> int8 conv -> dequant)

All variants are exact-equal by construction (asserted on device before
timing). Timing: fori_loop chain + scalar fetch (axon no-sync caveat).

Usage: python tools/bench_int8_probe3.py [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mri_superresolution_tpu.ops.quant import (int8_conv, quantize_tensor,
                                               weight_qparams)

B = 128 if "--cpu" not in sys.argv else 2


def quantize_bf16(x, scale):
    s = jnp.asarray(scale, jnp.float32).astype(jnp.bfloat16)
    q = jnp.round(x.astype(jnp.bfloat16) / s)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def quantize_packed(x, scale):
    """Quantize with the s8 store expressed as an s32 store + bitcast."""
    c = x.shape[-1]
    assert c % 4 == 0, c
    q = jnp.round(x.astype(jnp.float32) / jnp.asarray(scale, jnp.float32))
    q = jnp.clip(q, -127.0, 127.0).astype(jnp.int32)
    q = q.reshape(*x.shape[:-1], c // 4, 4)
    w = ((q[..., 0] & 0xFF)
         | ((q[..., 1] & 0xFF) << 8)
         | ((q[..., 2] & 0xFF) << 16)
         | ((q[..., 3] & 0xFF) << 24))
    b = lax.bitcast_convert_type(w, jnp.int8)          # (..., c//4, 4)
    return b.reshape(*x.shape[:-1], c)


def timed(name, fn, *xs):
    @jax.jit
    def chain(n, *args):
        def body(_, a):
            out = fn(*a)
            d = 1e-20 * jnp.mean(out.astype(jnp.float32))
            return tuple(x + d.astype(x.dtype) for x in a)
        return lax.fori_loop(0, n, body, args)[0]

    def t(n):
        t0 = time.perf_counter()
        float(jnp.sum(chain(n, *xs).astype(jnp.float32)))
        return time.perf_counter() - t0

    t(1)
    t1 = min(t(2) for _ in range(3))
    t2 = min(t(8) for _ in range(3))
    per = (t2 - t1) / 6
    print(f"  {name:<44} {per * 1e3:8.2f} ms", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("final 32->16 @512^2", (B, 512, 512, 32), (3, 3, 32, 16)),
        ("final 16->16 @512^2", (B, 512, 512, 16), (3, 3, 16, 16)),
        ("enc 32->32 @256^2", (B, 256, 256, 32), (3, 3, 32, 32)),
    ]
    for name, xs, ks in shapes:
        px = xs[0] * xs[1] * xs[2] * xs[3]
        floor_ms = px * 3 / 819e9 * 1e3  # read bf16 + write s8 @ HBM bw
        print(f"-- {name}  (quantize bw floor ~{floor_ms:.2f} ms)",
              flush=True)
        x = jnp.asarray(rng.random(xs, np.float32) - 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.random(ks, np.float32) - 0.5, jnp.bfloat16)
        qk, sk = weight_qparams(k)
        s = float(jnp.max(jnp.abs(x)) / 127.0)

        # exactness gate (packed must match the f32 reference bit-for-bit;
        # bf16 may differ on round-boundary values — report, don't assert)
        ref = jax.jit(quantize_tensor, static_argnums=1)(x, s)
        pk = jax.jit(quantize_packed, static_argnums=1)(x, s)
        assert jnp.array_equal(ref, pk), "packed quantize mismatch"
        nb = int(jnp.sum(ref != jax.jit(quantize_bf16, static_argnums=1)(x, s)))
        print(f"  [exact: packed==f32; bf16 differs on {nb}/{px} codes]",
              flush=True)

        for qname, qfn in (("f32", quantize_tensor),
                           ("bf16", quantize_bf16),
                           ("packed", quantize_packed)):
            timed(f"quantize[{qname}] alone (leaky -> q)",
                  lambda a, q=qfn: q(jax.nn.leaky_relu(a, 0.2), s), x)
        for qname, qfn in (("f32", quantize_tensor),
                           ("bf16", quantize_bf16),
                           ("packed", quantize_packed)):
            timed(f"site[{qname}]: leaky -> q -> conv -> dq",
                  lambda a, q=qfn: int8_conv(
                      q(jax.nn.leaky_relu(a, 0.2), s), qk, sk, padding=1), x)


if __name__ == "__main__":
    main()
