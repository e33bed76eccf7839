#!/usr/bin/env python
"""Probe: int8 MXU path viability for quantized serving.

Times bf16 vs int8 (s8 x s8 -> s32) at the model's dominant conv shapes and
a large matmul, to check whether XLA-on-v5e actually dispatches int8 convs
at the 2x MXU rate through the axon tunnel. Chained fori_loop timing
(bench.py pattern).
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


def timed(name, fn, *xs):
    @jax.jit
    def chain(n, *args):
        def body(_, a):
            out = fn(*a)
            # keep the iteration-to-iteration dependency alive for every
            # carry dtype: d is 0 at runtime (1e-20 scaled, truncated for
            # ints) but data-dependent at compile time, so no conv can be
            # dead-code eliminated.
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
    print(f"{name:<52} {per * 1e3:8.2f} ms/step", flush=True)
    return per


def conv(x, k, pad=1):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=(jnp.int32 if x.dtype == jnp.int8
                                else jnp.float32))


def main():
    rng = np.random.default_rng(0)

    # int8 chain-carry can't use the epsilon trick on ints; carry the float
    # copy and requantize inside instead for the int cases.
    def mkf(shape):
        return jnp.asarray(rng.random(shape, np.float32) - 0.5, jnp.bfloat16)

    def mki(shape):
        return jnp.asarray(
            rng.integers(-127, 127, size=shape, dtype=np.int64), jnp.int8)

    # 8192^3 matmul sanity: bf16 vs int8 peak
    mf = mkf((8192, 8192))
    mi = mki((8192, 8192))
    tb = timed("matmul 8192^3 bf16", lambda a, b: a @ b, mf, mf)
    def mm_i8(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    flops = 2 * 8192**3
    ti = timed("matmul 8192^3 int8->int32", mm_i8, mi, mi)
    print(f"  bf16 {flops / tb / 1e12:.1f} TFLOP/s, "
          f"int8 {flops / ti / 1e12:.1f} TOP/s", flush=True)

    shapes = [
        ("enc inc conv 32->32 @256^2", (B, 256, 256, 32), (3, 3, 32, 32)),
        ("dec up3 conv 64->32 @256^2", (B, 256, 256, 64), (3, 3, 64, 32)),
        ("dec up1 conv 256->128 @64^2", (B, 64, 64, 256), (3, 3, 256, 128)),
        ("final conv_up 32->16 @512^2", (B, 512, 512, 32), (3, 3, 32, 16)),
    ]
    for name, xs, ks in shapes:
        xf, kf = mkf(xs), mkf(ks)
        xi, ki = mki(xs), mki(ks)
        tf_ = timed(f"{name} bf16", conv, xf, kf)
        ti_ = timed(f"{name} int8", conv, xi, ki)
        print(f"  speedup {tf_ / ti_:.2f}x", flush=True)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    main()
