#!/usr/bin/env python
"""Decoder segment breakdown at B=128 bf16 (post 1x1-before-upsample).

Times every primitive of each Up level separately plus the composed level.
CAVEAT (measured): the multi-argument chain carry (`tuple(x + d ...)`)
re-materializes EVERY carried tensor each iteration, which adds HBM
traffic proportional to the carried set — composed-level numbers read
~1.7x the in-model cost (57.8 ms here vs 27.6 ms in-model from
tools/bench_ablation.py) and tiny ops can read negative. Use the
single-op rows qualitatively only; trust in-model segment numbers.
Findings that DO hold: GN+leaky at 256^2x32 runs ~3.1 ms each (~its
two-pass floor), the concat-conv and conv2 sit at the known XLA conv
codegen wall, and the post-commute 1x1/upsample are cheap. Nothing
actionable remains in the decoder beyond better conv codegen.

Up level l (unet.py:Up): x1 @ (s, s, 2c) -> 1x1 conv -> (s, s, c) ->
bilinear 2x -> (2s, 2s, c) -> GN+leaky -> concat skip (2s, 2s, c) ->
conv3x3 2c->c -> GN+leaky -> conv3x3 c->c -> GN+leaky.
Levels: (s=32, c=128), (s=64, c=64), (s=128, c=32).
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

from mri_superresolution_tpu.ops.resize import upsample_bilinear_align_corners

B = 128
DT = jnp.bfloat16


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


def conv(x, k, pad):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def gn_leaky(x, scale, bias):
    y = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=DT).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    return nn.leaky_relu(y, 0.2)


def main():
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.random(shape, np.float32), DT)

    total = 0.0
    for s, c in ((32, 128), (64, 64), (128, 32)):
        print(f"-- level s={s} c={c}", flush=True)
        x1 = mk((B, s, s, 2 * c))
        k11 = mk((1, 1, 2 * c, c))
        xs_ = mk((B, 2 * s, 2 * s, c))       # post-upsample
        skip = mk((B, 2 * s, 2 * s, c))
        k1 = mk((3, 3, 2 * c, c))
        k2 = mk((3, 3, c, c))
        sc, bi = mk((c,)).astype(jnp.float32), mk((c,)).astype(jnp.float32)

        t = 0.0
        t += timed("1x1 conv 2c->c (small res)", lambda a: conv(a, k11, 0), x1)
        t += timed("bilinear 2x", lambda a: upsample_bilinear_align_corners(
            a, 2), mk((B, s, s, c)))
        t += timed("GN+leaky (2s)", lambda a: gn_leaky(a, sc, bi), xs_)
        t += timed("concat+conv3x3 2c->c", lambda a, b: conv(
            jnp.concatenate([a, b], -1), k1, 1), xs_, skip)
        t += timed("GN+leaky (2s) #2", lambda a: gn_leaky(a, sc, bi), xs_)
        t += timed("conv3x3 c->c", lambda a: conv(a, k2, 1), xs_)
        t += timed("GN+leaky (2s) #3", lambda a: gn_leaky(a, sc, bi), xs_)

        def composed(a, b):
            y = conv(a, k11, 0)
            y = upsample_bilinear_align_corners(y, 2)
            y = gn_leaky(y, sc, bi)
            y = conv(jnp.concatenate([y, b], -1), k1, 1)
            y = gn_leaky(y, sc, bi)
            y = conv(y, k2, 1)
            return gn_leaky(y, sc, bi)

        tc = timed("COMPOSED level", composed, x1, skip)
        print(f"  sum-of-parts {t * 1e3:.2f} ms vs composed {tc * 1e3:.2f} ms",
              flush=True)
        total += tc
    print(f"decoder composed total: {total * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    main()
