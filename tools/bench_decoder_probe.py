#!/usr/bin/env python
"""Probe: decoder micro-rewrites at up3 sizes (256^2, B=128, bf16).

1. concat(a,b) -> conv 64->32   vs   conv(a)+conv(b) split kernels
2. fresh segment timing after the 1x1-before-upsample swap
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


def timed(name, fn, *xs):
    @jax.jit
    def chain(n, *args):
        def body(_, a):
            out = fn(*a)
            d = (1e-20 * jnp.mean(out.astype(jnp.float32)))
            return tuple(x + d.astype(x.dtype) for x in a)
        return lax.fori_loop(0, n, body, args)[0]

    def t(n):
        t0 = time.perf_counter()
        float(jnp.sum(chain(n, *xs)))
        return time.perf_counter() - t0

    t(1)
    t1 = min(t(2) for _ in range(3))
    t2 = min(t(8) for _ in range(3))
    per = (t2 - t1) / 6
    print(f"{name:<46} {per * 1e3:8.2f} ms/step", flush=True)
    return per


def conv(x, k, pad=1):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.random(shape, np.float32), DT)

    a = mk((B, 256, 256, 32))
    b = mk((B, 256, 256, 32))
    k = mk((3, 3, 64, 32))
    ka, kb = k[:, :, :32, :], k[:, :, 32:, :]

    timed("concat -> conv3x3 64->32 @256^2",
          lambda x, y: conv(jnp.concatenate([x, y], -1), k), a, b)
    timed("split conv(a)+conv(b) 32->32 @256^2",
          lambda x, y: conv(x, ka) + conv(y, kb), a, b)


if __name__ == "__main__":
    main()
