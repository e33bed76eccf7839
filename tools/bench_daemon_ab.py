#!/usr/bin/env python
"""A/B the zero-copy volume path across ALL THREE serving surfaces
(VERDICT r4 item 1 'done' criterion): same volume, same chip, same
transfer controls —

  cli       the in-process engine path scripts/infer_volume.py
            --serve_raw --out_dtype int16 runs (decode -> raw transposed
            slices -> pipelined upscale_batches -> F-order write)
  daemon    POST the same .nii bytes to /upscale_volume on a
            --serve_raw --out_dtype int16 server (z-chunked streaming)
  artifact  the same volume served through a serve_raw AOT artifact
            (jax.export program with the normalize/pack baked in)

Each surface is warmed first (compiles + int16 program), then timed on
the full volume. Engines are built identically; the daemon runs in-process
(ThreadingHTTPServer on localhost), so the A/B isolates the surface
overhead (HTTP + batcher + chunked re-encode vs the direct loop), not the
link — which is shared.

Usage:
  python tools/bench_daemon_ab.py [--hw 256] [--slices 256] [--batch 64]
      [--model unet] [--base_filters 32] [--skip_artifact] [--cpu]
"""

import argparse
import io
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--slices", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--model", default="unet")
    ap.add_argument("--base_filters", type=int, default=32)
    ap.add_argument("--skip_artifact", action="store_true")
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

    hw, nsl, bs = args.hw, args.slices, args.batch
    rng = np.random.default_rng(0)
    vol = (rng.random((hw, hw, nsl)) * 900).astype(np.int16)
    work = tempfile.mkdtemp(prefix="daemon_ab_")
    vol_path = os.path.join(work, "t1.nii")
    nifti.save(vol_path, vol, zooms=(1.0, 1.0, 1.0))
    blob = open(vol_path, "rb").read()

    cfg = ModelConfig(model_type=args.model, base_filters=args.base_filters)
    model = build_model(cfg, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.key(0), (hw, hw))

    def make_engine():
        return InferenceEngine(cfg, params, normalize_inputs=True,
                               transpose_io=True, out_dtype=np.int16)

    results = {}

    # ---- cli surface (the infer_volume.py --serve_raw hot loop) ---------
    eng = make_engine()
    def cli_once(path_out):
        data, hdr = nifti.load(vol_path, raw=True)
        norm = np.ascontiguousarray(data.T)
        starts = list(range(0, nsl, bs))
        outs = list(eng.upscale_batches(norm[s:s + bs] for s in starts))
        sr = np.concatenate(outs, axis=0)
        nifti.save(path_out, sr.T, zooms=(0.5, 0.5, 1.0),
                   scl_slope=1.0 / 32767.0)
    cli_once(os.path.join(work, "warm.nii"))           # compile + warm
    t0 = time.perf_counter()
    cli_once(os.path.join(work, "cli.nii"))
    results["cli"] = nsl / (time.perf_counter() - t0)

    # ---- daemon surface -------------------------------------------------
    server = serve_http(make_engine(), host="127.0.0.1", port=0,
                        max_batch=bs, batch_window_ms=2.0)
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    def post_volume():
        req = urllib.request.Request(base + "/upscale_volume", data=blob)
        with urllib.request.urlopen(req, timeout=1800) as resp:
            return resp.read()
    post_volume()                                      # compile + warm
    t0 = time.perf_counter()
    out_blob = post_volume()
    results["daemon"] = nsl / (time.perf_counter() - t0)
    open(os.path.join(work, "daemon.nii"), "wb").write(out_blob)
    server.shutdown(); server.server_close(); server.batcher.close()
    st.join(10)

    # outputs must agree to bf16 forward tolerance (different program
    # fusings shift bf16 ULPs ~ 256 int16 codes; decode and compare in
    # the float domain)
    def _close(pa, pb, tag):
        va, _ = nifti.load(os.path.join(work, pa))    # scl_slope applied
        vb, _ = nifti.load(os.path.join(work, pb))
        d = np.abs(va - vb)
        assert d.mean() < 2e-3 and np.quantile(d, 0.999) < 0.05, \
            f"{tag} outputs disagree (mean {d.mean():.4f})"

    _close("cli.nii", "daemon.nii", "cli/daemon")

    # ---- artifact surface -----------------------------------------------
    if not args.skip_artifact:
        from mri_superresolution_tpu.infer.export import (export_artifact,
                                                          load_artifact)
        art_path = os.path.join(work, "model.mrisrx")
        platform = "cpu" if args.cpu else "tpu"
        export_artifact(art_path, params, cfg, shapes=[(hw, hw)],
                        platforms=(platform,), serve_raw=True,
                        raw_dtype="int16", out_dtype="int16")
        art = load_artifact(art_path)
        def art_once(path_out):
            data, hdr = nifti.load(vol_path, raw=True)
            norm = np.ascontiguousarray(data.T)
            starts = list(range(0, nsl, bs))
            outs = list(art.upscale_batches(
                norm[s:s + bs] for s in starts))
            sr = np.concatenate(outs, axis=0)
            nifti.save(path_out, sr.T, zooms=(0.5, 0.5, 1.0),
                       scl_slope=1.0 / 32767.0)
        art_once(os.path.join(work, "warm2.nii"))
        t0 = time.perf_counter()
        art_once(os.path.join(work, "art.nii"))
        results["artifact"] = nsl / (time.perf_counter() - t0)
        _close("cli.nii", "art.nii", "cli/artifact")

    print(f"\nzero-copy volume A/B ({args.model} bf={args.base_filters}, "
          f"{hw}^2 x {nsl} int16, batch {bs}):")
    for k, v in results.items():
        rel = v / results["cli"]
        print(f"  {k:9s} {v:8.1f} slices/s   ({rel:5.1%} of cli)")
    import shutil
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
