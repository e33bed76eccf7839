#!/usr/bin/env python
"""Gate probe for ONE more Mosaic conv attempt (VERDICT r4 item 5).

The closed column-packed conv kernel (experiments/conv_pallas.py) died on
patch assembly: Mosaic lowered every tried layout-move (lane-merging
reshape, offset lane-concat, sub-128-lane DMA) through relayouts costing
5x the matmul. ``pltpu.roll`` was NOT among the tried primitives (it
post-dates the experiment). A lane-dense implicit-GEMM conv over the
(W*C)-flattened layout would express each dx tap as a 32-lane roll with
an edge mask (the roll's wrapped lanes are the image edge, where the
conv's zero padding applies) and each dy tap as a sublane-offset read.
IF those primitives run near bandwidth, the kernel is alive.

Findings so far (hardware, recorded here so the probe self-documents):
- ``pltpu.roll`` on bf16: "not implemented: Rotate with non-32-bit
  data" (Mosaic on this toolchain). Workaround measured below:
  ``pltpu.bitcast`` packs SUBLANE pairs — (R, L) bf16 -> (R/2, L) i32
  with lanes untouched — so an i32 lane roll by k IS a bf16 lane roll
  by k. Numerically exact (interpret + compiled).
- whole-array blocks VMEM-OOM at (512, 16384) (32 MB > the 16 MB scoped
  vmem limit); the probe grids over 64-row blocks like a real kernel.

Kernels (per 64-row block of a (rows, lanes) bf16 array):
  copy     out = x                                (bandwidth baseline)
  roll32   out = bf16-lane-roll(x, 32) via the i32 view
  taps3    x[0:Rb-2] + edge-masked roll32 of x[1:Rb-1] + x[2:Rb]
           (three sublane-offset reads incl. an ODD offset on packed
           bf16 + one rolled tap + adds — one dy-column of patch
           assembly, the MXU feed's worth of layout work)

Verdict rule: within ~1.5x of copy -> the conv idea is ALIVE; many-x
slower (relayouts) -> the conv-codegen closure memo (RESULTS 7a) stands.

Usage: --cpu for interpret-mode numerics; default runs+times on TPU
(chained-dependency timing; bench.py pattern — block_until_ready does
not synchronize through the axon tunnel).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np

R_BLK = 64


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
    assert R % R_BLK == 0
    interp = bool(args.cpu)

    def _roll_lanes(x, shift):
        xi = pltpu.bitcast(x, jnp.int32)          # (r/2, L): sublane pack
        return pltpu.bitcast(pltpu.roll(xi, shift=shift, axis=1),
                             jnp.bfloat16)

    def copy_body(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def roll32_body(x_ref, o_ref):
        o_ref[...] = _roll_lanes(x_ref[...], 32)

    def taps3_body(x_ref, o_ref):
        rb = R_BLK
        a = x_ref[pl.ds(0, rb - 2), :]
        b = x_ref[pl.ds(1, rb - 2), :]
        c = x_ref[pl.ds(2, rb - 2), :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rb - 2, L), 1)
        rolled = jnp.where(lane < 32, jnp.bfloat16(0.0),
                           _roll_lanes(b, 32))
        o_ref[pl.ds(0, rb - 2), :] = a + rolled + c
        o_ref[pl.ds(rb - 2, 2), :] = x_ref[pl.ds(rb - 2, 2), :]

    def build(body):
        return pl.pallas_call(
            body,
            grid=(R // R_BLK,),
            in_specs=[pl.BlockSpec((R_BLK, L), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((R_BLK, L), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.bfloat16),
            interpret=interp)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((R, L)),
                    jnp.bfloat16)

    # numerics (both modes; cheap)
    got = np.asarray(build(roll32_body)(x), np.float32)
    want = np.roll(np.asarray(x, np.float32), 32, axis=1)
    np.testing.assert_array_equal(got, want)

    got = np.asarray(build(taps3_body)(x), np.float32)
    xr = np.asarray(x, np.float32)
    lane = np.arange(L)[None, :]
    want = np.empty_like(xr)
    for blk in range(R // R_BLK):
        s = blk * R_BLK
        xb = xr[s:s + R_BLK]
        rolled = np.where(lane < 32, 0.0, np.roll(xb[1:R_BLK - 1], 32, 1))
        acc = np.asarray(
            jnp.asarray(np.asarray(
                jnp.asarray(xb[0:R_BLK - 2], jnp.bfloat16)
                + jnp.asarray(rolled, jnp.bfloat16), np.float32),
                jnp.bfloat16)
            + jnp.asarray(xb[2:R_BLK], jnp.bfloat16), np.float32)
        want[s:s + R_BLK - 2] = acc
        want[s + R_BLK - 2:s + R_BLK] = xb[R_BLK - 2:]
    np.testing.assert_array_equal(got, want)
    print("numerics: roll32 + taps3 exact "
          f"({'interpret' if interp else 'compiled'})", flush=True)
    if args.cpu:
        return

    # timing: chained calls so the tunnel's fake synchronization cannot
    # lie — and fetch only a SCALAR (fetching the array itself would move
    # 2 bytes/elem through the ~21 MB/s tunnel and drown the measurement)
    def chained(body, n):
        fn = build(body)

        def run(x0):
            return jnp.sum(lax.fori_loop(0, n, lambda i, t: fn(t), x0)
                           .astype(jnp.float32))

        return jax.jit(run)

    # XLA elementwise baseline (same chained harness): separates Pallas
    # dispatch/grid overhead from real HBM limits
    def xla_chained(n):
        def run(x0):
            return jnp.sum(
                lax.fori_loop(0, n, lambda i, t: t + jnp.bfloat16(1), x0)
                .astype(jnp.float32))
        return jax.jit(run)

    bytes_moved = 2 * R * L * 2  # read + write bf16
    fx1, fx2 = xla_chained(args.chain), xla_chained(2 * args.chain)
    np.asarray(fx1(x)); np.asarray(fx2(x))
    t1 = time.perf_counter(); np.asarray(fx1(x))
    t2 = time.perf_counter(); np.asarray(fx2(x))
    t3 = time.perf_counter()
    per_call = ((t3 - t2) - (t2 - t1)) / args.chain
    print(f"xla+1   {per_call * 1e6:9.1f} us/call  "
          f"{bytes_moved / per_call / 1e9:8.1f} GB/s", flush=True)
    for name, body in (("copy", copy_body), ("roll32", roll32_body),
                       ("taps3", taps3_body)):
        f1 = chained(body, args.chain)
        f2 = chained(body, 2 * args.chain)
        np.asarray(f1(x))  # compile + warm
        np.asarray(f2(x))
        t1 = time.perf_counter(); np.asarray(f1(x))
        t2 = time.perf_counter(); np.asarray(f2(x))
        t3 = time.perf_counter()
        per_call = ((t3 - t2) - (t2 - t1)) / args.chain
        print(f"{name:7s} {per_call * 1e6:9.1f} us/call  "
              f"{bytes_moved / per_call / 1e9:8.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
