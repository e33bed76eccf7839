#!/usr/bin/env python
"""Mixed-workload soak of the serving daemon (operational evidence).

Drives a live `serve_http` server with concurrent clients of BOTH kinds
for a fixed duration — slice clients POSTing `.npy` batches to /upscale
and volume clients POSTing `.nii` bytes to /upscale_volume — then checks
the books balance:

- every response decodes and has the right shape/dtype,
- no handler crashed (each error surfaced as a clean HTTP status),
- /metrics' request count equals the slices the clients got back,
- the queue drained (depth 0) and peak_pending stayed under the bound.

Defaults exercise the zero-copy raw path (the round-5 flagship surface).
Run on the real chip for latency-realistic interleaving, or --cpu.

Usage:
  python tools/soak_server.py [--seconds 120] [--slice_clients 6]
      [--volume_clients 2] [--hw 128] [--cpu]
"""

import argparse
import io
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--slice_clients", type=int, default=6)
    ap.add_argument("--volume_clients", type=int, default=2)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--vol_slices", type=int, default=24)
    ap.add_argument("--base_filters", type=int, default=16)
    ap.add_argument("--max_pending", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from mri_superresolution_tpu import nifti
    from mri_superresolution_tpu.config import ModelConfig
    from mri_superresolution_tpu.infer.engine import InferenceEngine
    from mri_superresolution_tpu.infer.server import serve_http
    from mri_superresolution_tpu.models import build_model, init_params

    hw = args.hw
    cfg = ModelConfig(base_filters=args.base_filters)
    model = build_model(cfg, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.key(0), (hw, hw))
    eng = InferenceEngine(cfg, params, normalize_inputs=True,
                          transpose_io=True, out_dtype=np.int16)
    server = serve_http(eng, host="127.0.0.1", port=0, max_batch=64,
                        batch_window_ms=3.0, max_pending=args.max_pending,
                        request_timeout_s=1800)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    rng = np.random.default_rng(0)

    # warm the two shapes (slice batches arrive transposed (w, h) = square
    # here, volumes go through the chunked raw path)
    buf = io.BytesIO()
    np.save(buf, (rng.random((2, hw, hw)) * 900).astype(np.int16))
    urllib.request.urlopen(urllib.request.Request(
        base + "/upscale", data=buf.getvalue()), timeout=1800).read()
    vol = (rng.random((hw, hw, args.vol_slices)) * 900).astype(np.int16)
    vol_blob = nifti.save_bytes(vol)
    urllib.request.urlopen(urllib.request.Request(
        base + "/upscale_volume", data=vol_blob), timeout=1800).read()

    stop = time.monotonic() + args.seconds
    ok = {"slices": 0, "volumes": 0}
    errors = []
    lock = threading.Lock()

    def slice_client(i):
        r = np.random.default_rng(i)
        while time.monotonic() < stop:
            n = int(r.integers(1, args.batch + 1))
            arr = (r.random((n, hw, hw)) * 900).astype(np.int16)
            b = io.BytesIO()
            np.save(b, arr)
            try:
                resp = urllib.request.urlopen(urllib.request.Request(
                    base + "/upscale", data=b.getvalue()), timeout=1800)
                out = np.load(io.BytesIO(resp.read()))
                assert out.shape == (n, 2 * hw, 2 * hw), out.shape
                assert out.dtype == np.int16
                with lock:
                    ok["slices"] += n
            except Exception as e:
                with lock:
                    errors.append(f"slice[{i}]: {type(e).__name__} {e}")
                return

    def volume_client(i):
        while time.monotonic() < stop:
            try:
                resp = urllib.request.urlopen(urllib.request.Request(
                    base + "/upscale_volume", data=vol_blob), timeout=1800)
                sr, hdr = nifti.load_bytes(resp.read(), raw=True)
                assert sr.shape == (2 * hw, 2 * hw, args.vol_slices)
                assert sr.dtype == np.int16
                with lock:
                    ok["volumes"] += 1
            except Exception as e:
                with lock:
                    errors.append(f"vol[{i}]: {type(e).__name__} {e}")
                return

    threads = ([threading.Thread(target=slice_client, args=(i,))
                for i in range(args.slice_clients)]
               + [threading.Thread(target=volume_client, args=(i,))
                  for i in range(args.volume_clients)])
    t0 = time.monotonic()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    dur = time.monotonic() - t0

    import json
    m = json.loads(urllib.request.urlopen(base + "/metrics",
                                          timeout=60).read())
    served = ok["slices"] + ok["volumes"] * args.vol_slices
    print(f"soak {dur:.0f}s: {ok['slices']} slices + {ok['volumes']} "
          f"volumes = {served} served "
          f"({served / dur:.1f} slices/s aggregate)")
    print(f"metrics: requests={m['stats']['requests']} "
          f"batches={m['stats']['batches']} "
          f"peak_pending={m['stats']['peak_pending']} "
          f"errors={m['stats']['errors']} "
          f"queue_depth={m['queue_depth']}")
    assert not errors, errors[:5]
    # +2 warmup requests' slices
    assert m["stats"]["requests"] == served + 2 + args.vol_slices, \
        (m["stats"]["requests"], served)
    assert m["queue_depth"] == 0
    assert m["stats"]["errors"] == 0
    assert m["stats"]["peak_pending"] <= args.max_pending
    print("SOAK OK")
    server.shutdown()
    server.server_close()
    server.batcher.close()
    t.join(10)


if __name__ == "__main__":
    main()
