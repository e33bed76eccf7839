"""Serving daemon: dynamic batching + HTTP front end (infer/server.py)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import ModelConfig
from mri_superresolution_tpu.infer.engine import InferenceEngine
from mri_superresolution_tpu.infer.server import DynamicBatcher, serve_http
from mri_superresolution_tpu.models import UNetSuperRes, init_params


@pytest.fixture(scope="module")
def engine():
    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (16, 16))
    eng = InferenceEngine(ModelConfig(base_filters=16), params, bf16=False)
    eng.upscale_batch(np.zeros((1, 16, 16), np.float32))  # warm compile
    return eng


def test_batcher_coalesces_concurrent_requests(engine, rng):
    """Concurrent clients' slices must be served in coalesced device
    batches, with outputs identical to a direct batched forward."""
    images = [rng.random((16, 16), dtype=np.float32) for _ in range(12)]
    want = engine.upscale_batch(np.stack(images))
    b = DynamicBatcher(engine, max_batch=32, batch_window_ms=300.0)
    try:
        results = [None] * len(images)

        def client(i):
            results[i] = b.upscale(images[i], timeout=60)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(images))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(len(images)):
            np.testing.assert_allclose(results[i], want[i],
                                       rtol=1e-5, atol=1e-6)
        assert b.stats["max_batch_seen"] > 1, (
            f"no coalescing happened: {b.stats}")
        assert b.stats["requests"] == len(images)
    finally:
        b.close()


def test_batcher_groups_by_shape(engine, rng):
    """Mixed shapes in one window are grouped into per-shape forwards."""
    a = rng.random((16, 16), dtype=np.float32)
    c = rng.random((16, 24), dtype=np.float32)
    b = DynamicBatcher(engine, max_batch=8, batch_window_ms=200.0)
    try:
        ra, rc = b.submit(a), b.submit(c)
        ya, yc = b.wait(ra, 60), b.wait(rc, 60)
        np.testing.assert_allclose(ya, engine.upscale_image(a),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(yc, engine.upscale_image(c),
                                   rtol=1e-5, atol=1e-6)
        assert ya.shape == (32, 32) and yc.shape == (32, 48)
    finally:
        b.close()


def test_batcher_artifact_backend_and_error_propagation(tmp_path, rng):
    """A ServingArtifact serves through the batcher (pad=True inferred
    from its signature); an unservable shape raises in the CALLER while
    the worker keeps serving."""
    from mri_superresolution_tpu.infer.export import (export_artifact,
                                                      load_artifact)

    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (16, 16))
    path = str(tmp_path / "m.mrisrx")
    export_artifact(path, params, ModelConfig(base_filters=16),
                    shapes=[(16, 16)], bf16=False, platforms=("cpu",))
    art = load_artifact(path)
    b = DynamicBatcher(art, max_batch=8, batch_window_ms=1.0)
    try:
        y = b.upscale(rng.random((8, 8), dtype=np.float32), timeout=60)
        assert y.shape == (16, 16)  # padded to the 16x16 program, cropped
        with pytest.raises(ValueError, match="no exported shape fits"):
            b.upscale(rng.random((32, 32), dtype=np.float32), timeout=60)
        # worker survived the error and still serves
        assert b.upscale(rng.random((16, 16), dtype=np.float32),
                         timeout=60).shape == (32, 32)
    finally:
        b.close()


def test_batcher_pads_engine_batches_to_pow2(engine, rng):
    """Engine backends quantize coalesced batch sizes to powers of two
    (bounding per-shape compiles to log2(max_batch) programs — a stream
    of arbitrary sizes would recompile per size, minutes each on the
    TPU tunnel); artifact backends keep exact sizes (symbolic batch,
    compute scales with padding)."""
    from mri_superresolution_tpu.infer.export import ServingArtifact

    b = DynamicBatcher(engine, max_batch=16, batch_window_ms=200.0)
    try:
        assert b.pad_batches  # engine default
        reqs = [b.submit(rng.random((16, 16), dtype=np.float32))
                for _ in range(5)]
        outs = [b.wait(r, 60) for r in reqs]
        assert all(o.shape == (32, 32) for o in outs)
        # 5 requests served as ONE group (padded to 8 internally)
        assert b.stats["batches"] == 1
        assert b.stats["requests"] == 5
    finally:
        b.close()
    # the artifact default is exact sizes
    art = ServingArtifact.__new__(ServingArtifact)
    art.header, art.mode, art._programs = {}, "plain", {}
    ab = DynamicBatcher(art)
    try:
        assert not ab.pad_batches
    finally:
        ab.close()


def test_batcher_spatial_engine(rng):
    """serve.py --spatial_shards: the batcher composes with a
    row-sharded engine (halo-exchange forward under shard_map)."""
    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (32, 32))
    eng = InferenceEngine(ModelConfig(base_filters=16), params, bf16=False,
                          spatial_shards=2, num_devices=2)
    x = rng.random((3, 32, 32), dtype=np.float32)
    want = eng.upscale_batch(x)
    b = DynamicBatcher(eng, max_batch=8, batch_window_ms=100.0)
    try:
        reqs = [b.submit(s) for s in x]
        got = np.stack([b.wait(r, 120) for r in reqs])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    finally:
        b.close()


def test_batcher_routed_int8_artifact(tmp_path, rng):
    """Routed int8 artifacts compose with the daemon: rich batches serve
    the int8 program, near-empty batches hit the baked bf16 fallback —
    the routing decision travels inside the artifact, not the server."""
    from mri_superresolution_tpu.infer.export import (export_artifact,
                                                      load_artifact)
    from mri_superresolution_tpu.models import quant_forward as qf

    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (16, 16))
    cfg = ModelConfig(base_filters=16)
    scales = qf.calibrate(params, [rng.random((2, 16, 16, 1),
                                              dtype=np.float32)],
                          cfg.model_type, dtype=jnp.float32)
    path = str(tmp_path / "i8.mrisrx")
    export_artifact(path, params, cfg, shapes=[(16, 16)], bf16=False,
                    platforms=("cpu",), mode="int8", quant_scales=scales)
    art = load_artifact(path)
    b = DynamicBatcher(art, max_batch=8, batch_window_ms=1.0)
    try:
        rich = rng.random((16, 16), dtype=np.float32)
        np.testing.assert_allclose(b.upscale(rich, timeout=120),
                                   art.upscale_batch(rich[None])[0],
                                   rtol=1e-6, atol=1e-7)
        empty = np.zeros((16, 16), np.float32)
        empty[:2, :2] = 0.5
        got = b.upscale(empty, timeout=120)
        fn = jax.jit(qf.build_int8_forward(params, scales, cfg.model_type,
                                           dtype=jnp.float32))
        int8_out = np.clip(np.asarray(
            fn(params, empty[None, ..., None]))[0, :, :, 0], 0.0, 1.0)
        assert not np.allclose(got, int8_out, rtol=1e-5, atol=1e-6), \
            "near-empty request was served int8, not the bf16 fallback"
    finally:
        b.close()


def test_batcher_rejects_bad_max_batch(engine):
    with pytest.raises(ValueError, match="max_batch"):
        DynamicBatcher(engine, max_batch=0)


def test_batcher_skips_padding_while_calibrating(rng):
    """Zero pad rows must never be counted as int8 calibration slices:
    while the engine's streaming calibration runs, groups serve at
    exact sizes (engine._calib_seen counts only real slices)."""
    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (16, 16))
    eng = InferenceEngine(ModelConfig(base_filters=16), params, bf16=False,
                          quant="int8", quant_calib_slices=5)
    assert eng.quant_calibrating
    b = DynamicBatcher(eng, max_batch=8, batch_window_ms=150.0)
    try:
        reqs = [b.submit(rng.random((16, 16), dtype=np.float32))
                for _ in range(3)]
        for r in reqs:
            b.wait(r, 120)
        assert eng._calib_seen == 3, (
            f"pad rows were counted as calibration slices "
            f"({eng._calib_seen} != 3)")
        # once frozen, padding resumes
        for _ in range(2):
            b.upscale(rng.random((16, 16), dtype=np.float32), timeout=120)
        assert not eng.quant_calibrating
    finally:
        b.close()


def test_http_server_roundtrip(engine, rng):
    """POST /upscale serves .npy in/out; GET /healthz reports stats; a
    (N, H, W) volume payload coalesces into batched forwards."""
    import io

    server = serve_http(engine, host="127.0.0.1", port=0, max_batch=16,
                        batch_window_ms=50.0, describe="test-engine")
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        vol = rng.random((5, 16, 16)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, vol)
        req = urllib.request.Request(
            base + "/upscale", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = np.load(io.BytesIO(resp.read()))
        np.testing.assert_allclose(out, engine.upscale_batch(vol),
                                   rtol=1e-5, atol=1e-6)

        # uint8 payloads are normalized like the CLI
        img8 = (rng.random((16, 16)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        np.save(buf, img8)
        req = urllib.request.Request(base + "/upscale", data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=120) as resp:
            out8 = np.load(io.BytesIO(resp.read()))
        np.testing.assert_allclose(
            out8, engine.upscale_image(img8.astype(np.float32) / 255.0),
            rtol=1e-5, atol=1e-6)

        with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["backend"] == "test-engine"
        assert health["stats"]["requests"] >= 6
        assert health["stats"]["max_batch_seen"] > 1  # the volume coalesced

        # bad payloads are a 400 with a reason, not a dead server
        req = urllib.request.Request(base + "/upscale", data=b"garbage")
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400

        # NIfTI-in -> NIfTI-out volume endpoint: one POST is the whole
        # MRI service (decode, per-slice normalize, batched serve,
        # halved in-plane spacing, gzip iff the upload was)
        from mri_superresolution_tpu import nifti
        from mri_superresolution_tpu.infer.engine import (
            preprocess_image_array)
        raw_vol = (rng.random((16, 16, 6)) * 900).astype(np.float32)
        blob = nifti.save_bytes(raw_vol, zooms=(2.0, 2.0, 3.0),
                                compress=True)
        req = urllib.request.Request(base + "/upscale_volume", data=blob)
        with urllib.request.urlopen(req, timeout=120) as resp:
            out_blob = resp.read()
        assert out_blob[:2] == b"\x1f\x8b"  # gz in, gz out
        sr, hdr = nifti.load_bytes(out_blob)
        assert sr.shape == (32, 32, 6)
        assert hdr.zooms == (1.0, 1.0, 3.0)
        want = np.stack([engine.upscale_image(
            preprocess_image_array(raw_vol[:, :, k]))
            for k in range(6)], axis=2)
        np.testing.assert_allclose(sr, want, rtol=1e-5, atol=1e-5)
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()
        thread.join(10)


def test_serve_cli_help():
    """The CLI parses (smoke: flag surface exists)."""
    import os
    import subprocess
    import sys
    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "serve.py"),
         "--help"], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    for flag in ("--artifact", "--max_batch", "--batch_window_ms",
                 "--quant", "--tta", "--port"):
        assert flag in r.stdout
