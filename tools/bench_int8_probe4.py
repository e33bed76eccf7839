#!/usr/bin/env python
"""Probe 4: Pallas fused leaky->quantize kernel vs XLA (round 3, V1).

bench_int8_probe3.py closed two quantize variants (bf16 arithmetic: no
change; packed-s32 + bitcast: 5.7x WORSE — lane-strided channel slices).
This probes the last mechanism with plausible upside: a Pallas map kernel
over a lane-dense (W*C)-merged view (the layout trick from the GN
experiment), so HBM rows are long and the s8 store uses vector packs
instead of whatever XLA's (4,1)-packed fused store does (measured 2.3x
the 3-byte/px bandwidth floor).

Semantics mirror the serving site bit-for-bit: leaky_relu in bf16 (slope
0.2 cast to bf16), then f32 scale/round/clip/convert — asserted equal to
the XLA reference before timing.

Usage: python tools/bench_int8_probe4.py [--cpu]   (--cpu: interpret mode)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

INTERPRET = "--cpu" in sys.argv
if INTERPRET:
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from mri_superresolution_tpu.ops.quant import (int8_conv, quantize_tensor,
                                               weight_qparams)

B = 128 if not INTERPRET else 2


def _kernel(x_ref, s_ref, o_ref, *, slope):
    # f32 leaky + divide-by-scale. NOT asserted bit-equal to the XLA site:
    # the server pins --xla_allow_excess_precision=true, so XLA itself
    # elides bf16 roundings inside fusions and the "reference" codes at
    # exact half-code boundaries depend on fusion context (~0.1% of codes
    # move by +-1 either way; measured, reported below). The compare runs
    # in f32 because Mosaic on v5e rejects bf16 cmpf.
    xf = x_ref[...].astype(jnp.float32)
    y = jnp.where(xf >= 0.0, xf, xf * jnp.float32(slope))
    q = jnp.round(y / s_ref[...])
    o_ref[...] = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("slope", "block_h"))
def leaky_quantize_pallas(x, scale_row, slope=0.2, block_h=64):
    """x: (N, H, W, C) bf16 -> s8, with leaky_relu fused in.

    scale_row: (W*C,) f32 = tile(scale, W) — per-channel scales
    pre-broadcast along the merged minor dims, so the kernel is a
    pure 2D map over (H, W*C) blocks with full 128-lane rows.
    """
    n, h, w, c = x.shape
    wc = w * c
    xv = x.reshape(n, h, wc)
    bh = min(block_h, h)
    out = pl.pallas_call(
        functools.partial(_kernel, slope=slope),
        grid=(n, h // bh),
        in_specs=[pl.BlockSpec((1, bh, wc), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, wc), lambda i, j: (0, 0))],
        out_specs=pl.BlockSpec((1, bh, wc), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wc), jnp.int8),
        interpret=INTERPRET,
    )(xv, scale_row.reshape(1, wc))
    return out.reshape(n, h, w, c)


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
        floor_ms = px * 3 / 819e9 * 1e3
        print(f"-- {name}  (quantize bw floor ~{floor_ms:.2f} ms)",
              flush=True)
        x = jnp.asarray(rng.random(xs, np.float32) - 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.random(ks, np.float32) - 0.5, jnp.bfloat16)
        qk, sk = weight_qparams(k)
        w, c = xs[2], xs[3]
        s = float(jnp.max(jnp.abs(x)) / 127.0)
        s_row = jnp.tile(jnp.full((c,), s, jnp.float32), w)

        ref = jax.jit(lambda a: quantize_tensor(
            jax.nn.leaky_relu(a, 0.2), s))(x)
        got = leaky_quantize_pallas(x, s_row)
        ndiff, maxdiff = jax.jit(lambda r, g: (
            jnp.sum(r != g),
            jnp.max(jnp.abs(r.astype(jnp.int16) - g.astype(jnp.int16)))
        ))(ref, got)                     # fused reduce: no huge temporaries
        ndiff, maxdiff = int(ndiff), int(maxdiff)
        frac = ndiff / px
        assert frac < 0.005 and maxdiff <= 1, (ndiff, maxdiff)
        print(f"  [codes: {frac * 100:.3f}% differ by +-1 (half-boundary "
              f"rounding under xla_allow_excess_precision)]", flush=True)

        timed("XLA: leaky -> q", lambda a: quantize_tensor(
            jax.nn.leaky_relu(a, 0.2), s), x)
        timed("pallas: leaky -> q", lambda a: leaky_quantize_pallas(
            a, s_row), x)
        timed("site[XLA]: leaky -> q -> conv -> dq",
              lambda a: int8_conv(quantize_tensor(
                  jax.nn.leaky_relu(a, 0.2), s), qk, sk, padding=1), x)
        timed("site[pallas]: leaky -> q -> conv -> dq",
              lambda a: int8_conv(leaky_quantize_pallas(a, s_row),
                                  qk, sk, padding=1), x)


if __name__ == "__main__":
    main()
