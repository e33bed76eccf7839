#!/usr/bin/env python
"""Characterize host<->device transfer on the serving path: latency vs
bandwidth of device_put (upload) and np.asarray fetch (download) across
payload sizes, plus the dispatch overhead of an empty jitted call.

Why: pipelined volume serving (infer/engine.upscale_batches) is bounded by
max(compute, transfer) per batch. On the axon tunnel a B=64x256^2 batch
costs 2.16 s/round-trip vs 45 ms of compute (RESULTS.md 5i) — this probe
separates the FIXED per-RPC latency from the per-BYTE bandwidth so the e2e
serving benchmark (tools/bench_serve_e2e.py) can model what a
directly-attached chip would do and pick the transfer dtype (fp32 vs
uint16/uint8) rationally.

Usage: python tools/bench_tunnel_io.py [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}")

    # empty-dispatch overhead: jitted identity on a 128-byte array,
    # fetch synchronizes (block_until_ready does not, CLAUDE.md)
    tiny = jnp.zeros((32,), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    np.asarray(f(tiny))  # compile
    t0 = time.perf_counter()
    n_disp = 10
    for _ in range(n_disp):
        np.asarray(f(tiny))
    rtt = (time.perf_counter() - t0) / n_disp
    print(f"tiny dispatch+fetch round trip: {rtt * 1e3:.1f} ms")

    rows = []
    for mb in (1, 4, 16, 64, 256):
        n = mb * (1 << 20) // 4
        host = np.random.default_rng(0).random(n).astype(np.float32)
        up_best, down_best = 1e9, 1e9
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            d = jax.device_put(host, dev)
            # force arrival on device: run + fetch a scalar of it
            np.asarray(f(d)[0])
            up = time.perf_counter() - t0
            y = f(d)
            t0 = time.perf_counter()
            np.asarray(y)
            down = time.perf_counter() - t0
            up_best, down_best = min(up_best, up), min(down_best, down)
        rows.append({"mb": mb, "up_s": round(up_best, 4),
                     "down_s": round(down_best, 4),
                     "up_mbs": round(mb / up_best, 1),
                     "down_mbs": round(mb / down_best, 1)})
        print(f"{mb:4d} MB  up {up_best:7.3f}s ({mb / up_best:7.1f} MB/s)  "
              f"down {down_best:7.3f}s ({mb / down_best:7.1f} MB/s)")

    # linear fit: time = latency + bytes/bw for the download side
    xs = np.array([r["mb"] for r in rows], np.float64)
    ys = np.array([r["down_s"] for r in rows], np.float64)
    bw = (xs[-1] - xs[0]) / (ys[-1] - ys[0])
    lat = ys[0] - xs[0] / bw
    print(f"download model: {lat * 1e3:.0f} ms latency + {bw:.0f} MB/s")
    ysu = np.array([r["up_s"] for r in rows], np.float64)
    bwu = (xs[-1] - xs[0]) / (ysu[-1] - ysu[0])
    latu = ysu[0] - xs[0] / bwu
    print(f"upload model:   {latu * 1e3:.0f} ms latency + {bwu:.0f} MB/s")
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 1), "rows": rows,
                      "down_lat_ms": round(lat * 1e3, 1),
                      "down_mbs": round(bw, 1),
                      "up_lat_ms": round(latu * 1e3, 1),
                      "up_mbs": round(bwu, 1)}))


if __name__ == "__main__":
    main()
