#!/usr/bin/env python
"""Measure the serving daemon's overhead vs direct engine calls.

The daemon's whole job is to keep the device fed with coalesced batches
while paying only host-side costs (HTTP parse, .npy codec, queue
handoff). This tool times the same slice stream three ways:

1. direct engine.upscale_batch over pre-built batches (the floor);
2. through the DynamicBatcher (queue + per-request future overhead);
3. through the full HTTP daemon with N concurrent clients posting
   (K, H, W) volumes.

and reports slices/s + overhead fraction for 2 and 3. Run with --cpu
for a backend-independent overhead number (the host costs are identical
whatever serves the forward); on the axon tunnel the engine itself is
link-bound, so overhead fractions there understate an attached host.
"""

import argparse
import io
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from scripts._bootstrap import force_cpu_if_requested  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16,
                    help="slices per client POST and per direct batch")
    ap.add_argument("--n_batches", type=int, default=12)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--base_filters", type=int, default=16)
    ap.add_argument("--model_type", default="unet")
    ap.add_argument("--max_batch", type=int, default=128)
    ap.add_argument("--window_ms", type=float, default=5.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    force_cpu_if_requested()

    import numpy as np
    import jax
    from mri_superresolution_tpu.config import ModelConfig
    from mri_superresolution_tpu.infer.engine import InferenceEngine
    from mri_superresolution_tpu.infer.server import (DynamicBatcher,
                                                      serve_http)
    from mri_superresolution_tpu.models import build_model, init_params

    cfg = ModelConfig(model_type=args.model_type,
                      base_filters=args.base_filters)
    model = build_model(cfg)
    params = init_params(model, jax.random.key(0), (args.size, args.size))
    engine = InferenceEngine(cfg, params)
    rng = np.random.default_rng(0)
    batches = [rng.random((args.batch, args.size, args.size),
                          dtype=np.float32)
               for _ in range(args.n_batches)]
    total = args.batch * args.n_batches

    def timed(fn):
        fn()                      # warm pass: compiles land here
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def direct():
        for b in batches:
            engine.upscale_batch(b)

    direct_s = timed(direct)
    direct_rate = total / direct_s
    print(f"direct engine     : {direct_rate:10.1f} slices/s "
          f"({direct_s * 1e3:.0f} ms)")

    batcher = DynamicBatcher(engine, max_batch=args.max_batch,
                             batch_window_ms=args.window_ms)

    def via_batcher():
        reqs = [batcher.submit(s) for b in batches for s in b]
        for r in reqs:
            batcher.wait(r, 600)

    batcher_s = timed(via_batcher)
    batcher.close()
    print(f"DynamicBatcher    : {total / batcher_s:10.1f} slices/s "
          f"(+{(batcher_s / direct_s - 1) * 100:5.1f}% vs direct)")

    server = serve_http(engine, host="127.0.0.1", port=0,
                        max_batch=args.max_batch,
                        batch_window_ms=args.window_ms)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}/upscale"

    def post(vol):
        buf = io.BytesIO()
        np.save(buf, vol)
        with urllib.request.urlopen(urllib.request.Request(
                url, data=buf.getvalue()), timeout=600) as resp:
            return np.load(io.BytesIO(resp.read()))

    post(batches[0][:1])  # connection + codec warmup
    work = []
    lock = threading.Lock()

    def client():
        while True:
            with lock:
                if not work:
                    return
                vol = work.pop()
            post(vol)

    def via_http():
        work.extend(batches)
        threads = [threading.Thread(target=client)
                   for _ in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    http_s = timed(via_http)
    stats = server.batcher.stats
    server.shutdown()
    server.server_close()
    server.batcher.close()
    print(f"HTTP x{args.clients} clients : {total / http_s:10.1f} slices/s "
          f"(+{(http_s / direct_s - 1) * 100:5.1f}% vs direct); "
          f"device batches {stats['batches']}, "
          f"largest {stats['max_batch_seen']}")


if __name__ == "__main__":
    main()
