#!/usr/bin/env python
"""Gate probe for ONE more Mosaic conv attempt (VERDICT r4 item 5).

The closed column-packed conv kernel (experiments/conv_pallas.py) died on
patch assembly: Mosaic lowered every tried layout-move (lane-merging
reshape, offset lane-concat, sub-128-lane DMA) through relayouts costing
5x the matmul. ``pltpu.roll`` was NOT among the tried primitives (it
post-dates the experiment). A lane-dense implicit-GEMM conv would express
each dx tap as a 32-lane circular roll plus a sublane-shifted masked fix
for the wrapped lanes — IF roll lowers at register/bandwidth speed.

This probe measures exactly that, before any kernel investment:

  copy      out = x                          (the bandwidth baseline)
  roll      out = roll(x, 32, axis=lanes)
  tapmix    out = roll(x, 32) merged with a sublane-shifted copy under an
            iota mask, + arithmetic — one patch-assembly "tap" worth of work

Verdict rule: if roll/tapmix run within ~1.5x of copy, the conv kernel
idea is ALIVE (assembly ~9 taps x near-bandwidth ≈ affordable); if they
lower through relayouts (many-x slower), the conv-codegen closure memo
(RESULTS 7a) stands and the idea is dead without further spend.

Numerics are checked in interpret mode on CPU first (run with --cpu).
Timing uses the chained-dependency method (axon tunnel: block_until_ready
does not synchronize; bench.py pattern).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode numerics check only")
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--lanes", type=int, default=16384,
                    help="512 w-positions x 32 channels, the final-stage "
                         "lane-dense row width")
    ap.add_argument("--chain", type=int, default=32)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = args.rows, args.lanes
    interp = bool(args.cpu)

    def copy_body(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def _roll_lanes(x, shift):
        """bf16 lane roll via the i32-packed view: Mosaic's rotate is
        "not implemented: Rotate with non-32-bit data" (measured on this
        toolchain), but bitcast packs SUBLANE pairs — (R, L) bf16 ->
        (R/2, L) i32 with lanes untouched — so an i32 lane roll by k IS a
        bf16 lane roll by k."""
        xi = pltpu.bitcast(x, jnp.int32)
        return pltpu.bitcast(pltpu.roll(xi, shift=shift, axis=1),
                             jnp.bfloat16)

    def roll32_body(x_ref, o_ref):
        o_ref[...] = _roll_lanes(x_ref[...], 32)

    def taps3_body(x_ref, o_ref):
        """One dy-column of implicit-GEMM patch assembly: three
        sublane-offset reads (dy taps) + a lane roll with edge mask (a dx
        tap; in the lane-dense (W*C) layout the roll's wrapped lanes are
        the image edge, where the conv's zero padding applies — masked,
        no fix needed) + adds standing in for the MXU feed."""
        a = x_ref[pl.ds(0, R), :]
        b = x_ref[pl.ds(1, R), :]
        c = x_ref[pl.ds(2, R), :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        rolled = jnp.where(lane < 32, jnp.bfloat16(0.0),
                           _roll_lanes(b, 32))
        o_ref[...] = a + rolled + c

    def build(body, in_rows=None):
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.bfloat16),
            interpret=interp)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((R, L)),
                    jnp.bfloat16)
    xh = jnp.asarray(np.random.default_rng(1).standard_normal((R + 2, L)),
                     jnp.bfloat16)

    # numerics (both modes; cheap)
    got = np.asarray(build(roll32_body)(x), np.float32)
    want = np.roll(np.asarray(x, np.float32), 32, axis=1)
    np.testing.assert_array_equal(got, want)
    xr = np.asarray(xh, np.float32)
    lane = np.arange(L)[None, :]
    rolled = np.where(lane < 32, 0.0, np.roll(xr[1:R + 1], 32, axis=1))
    want = np.asarray(
        jnp.asarray(np.asarray(
            jnp.asarray(xr[0:R], jnp.bfloat16)
            + jnp.asarray(rolled, jnp.bfloat16), np.float32),
            jnp.bfloat16) + jnp.asarray(xr[2:R + 2], jnp.bfloat16),
        np.float32)
    got = np.asarray(build(taps3_body)(xh), np.float32)
    np.testing.assert_array_equal(got, want)
    print("numerics: roll32 + taps3 exact "
          f"({'interpret' if interp else 'compiled'})", flush=True)
    if args.cpu:
        return

    # timing: chained calls so the tunnel's fake synchronization cannot lie
    def chained(body, n, arg):
        fn = build(body)
        pad = arg.shape[0] - R

        def run(x0):
            def step(i, t):
                y = fn(t)
                if pad:
                    y = jnp.concatenate([y, t[R:]], axis=0)
                return y
            return lax.fori_loop(0, n, step, x0)

        return jax.jit(run)

    bytes_moved = 2 * R * L * 2  # read + write bf16
    for name, body, arg in (("copy", copy_body, x),
                            ("roll32", roll32_body, x),
                            ("taps3", taps3_body, xh)):
        f1 = chained(body, args.chain, arg)
        f2 = chained(body, 2 * args.chain, arg)
        np.asarray(f1(arg))  # compile + warm
        np.asarray(f2(arg))
        t1 = time.perf_counter(); np.asarray(f1(arg))
        t2 = time.perf_counter(); np.asarray(f2(arg))
        t3 = time.perf_counter()
        per_call = ((t3 - t2) - (t2 - t1)) / args.chain
        print(f"{name:7s} {per_call * 1e6:9.1f} us/call  "
              f"{bytes_moved / per_call / 1e9:8.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
