"""Serving daemon: dynamic batching + HTTP front end (infer/server.py)."""

import json
import threading
import time
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


# ------------------------------------------- round-5 hardening + raw volumes

class _SlowBackend:
    """Controllable fake backend: blocks in upscale_batch until released.
    Lets tests pin queue/timeout semantics without device timing races."""

    def __init__(self):
        self.release = threading.Event()
        self.slices_served = 0

    def upscale_batch(self, batch):
        self.release.wait(30)
        self.slices_served += batch.shape[0]
        n, h, w = batch.shape
        return np.zeros((n, 2 * h, 2 * w), np.float32)


def test_batcher_bounded_queue_rejects():
    from mri_superresolution_tpu.infer.server import QueueFullError

    be = _SlowBackend()
    b = DynamicBatcher(be, max_batch=1, batch_window_ms=1.0, max_pending=2)
    try:
        img = np.zeros((8, 8), np.float32)
        b.submit(img)              # taken by the worker (blocks in backend)
        time.sleep(0.3)            # let the worker drain it from the queue
        b.submit(img)              # pending 1
        b.submit(img)              # pending 2 == max_pending
        with pytest.raises(QueueFullError):
            b.submit(img)
        assert b.stats["rejected"] == 1
        assert b.stats["peak_pending"] == 2
    finally:
        be.release.set()
        b.close()


def test_request_timeout_abandons_queued_work():
    """A timed-out wait marks the request abandoned: the worker never
    spends a forward on it (load under timeout pressure sheds instead of
    computing for clients that already gave up)."""
    be = _SlowBackend()
    b = DynamicBatcher(be, max_batch=1, batch_window_ms=1.0)
    try:
        img = np.zeros((8, 8), np.float32)
        first = b.submit(img)      # in flight, blocks in the backend
        time.sleep(0.2)
        doomed = b.submit(img)     # still queued
        with pytest.raises(TimeoutError):
            b.wait(doomed, timeout=0.05)
        assert b.stats["abandoned"] == 1
        be.release.set()
        b.wait(first, timeout=30)
        out = b.upscale(img, timeout=30)     # a fresh request still serves
        assert out.shape == (16, 16)
        # first + fresh were served; the abandoned one was dropped
        assert be.slices_served == 2
    finally:
        be.release.set()
        b.close()


def _start(server):
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t, f"http://127.0.0.1:{server.server_address[1]}"


def _post(base, path, data, timeout=60):
    req = urllib.request.Request(base + path, data=data)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read()


def test_http_503_when_queue_full_and_504_on_timeout():
    import io

    be = _SlowBackend()
    server = serve_http(be, host="127.0.0.1", port=0, max_batch=1,
                        batch_window_ms=1.0, max_pending=1,
                        request_timeout_s=0.5)
    thread, base = _start(server)
    try:
        buf = io.BytesIO()
        np.save(buf, np.zeros((8, 8), np.float32))
        payload = buf.getvalue()
        # 2 background requests: one in flight + one filling the queue
        errs = []

        def fire():
            try:
                _post(base, "/upscale", payload)
            except urllib.error.HTTPError as e:
                errs.append(e.code)

        t1 = threading.Thread(target=fire)
        t1.start()
        time.sleep(0.3)            # worker took it; blocked in backend
        t2 = threading.Thread(target=fire)
        t2.start()
        time.sleep(0.2)            # now 1 pending == max_pending
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "/upscale", payload)
        assert ei.value.code == 503
        assert ei.value.headers.get("Retry-After") == "1"
        t1.join(30)
        t2.join(30)
        # the in-flight/queued requests outlived request_timeout_s -> 504
        assert errs and all(c == 504 for c in errs)
        be.release.set()
    finally:
        be.release.set()
        server.shutdown()
        server.server_close()
        server.batcher.close()
        thread.join(10)


def test_http_body_cap_and_missing_length():
    import http.client
    import io

    be = _SlowBackend()
    be.release.set()
    server = serve_http(be, host="127.0.0.1", port=0,
                        max_body_bytes=1024)
    thread, base = _start(server)
    try:
        big = io.BytesIO()
        np.save(big, np.zeros((64, 64), np.float32))   # ~16 KiB > cap
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "/upscale", big.getvalue())
        assert ei.value.code == 413

        # POST without Content-Length -> 411 (never blocks reading)
        conn = http.client.HTTPConnection("127.0.0.1",
                                          server.server_address[1],
                                          timeout=30)
        conn.putrequest("POST", "/upscale", skip_accept_encoding=True)
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 411
        conn.close()
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()
        thread.join(10)


def test_metrics_endpoint(engine, rng):
    import io

    server = serve_http(engine, host="127.0.0.1", port=0, max_batch=8,
                        batch_window_ms=30.0)
    thread, base = _start(server)
    try:
        buf = io.BytesIO()
        np.save(buf, rng.random((3, 16, 16)).astype(np.float32))
        _post(base, "/upscale", buf.getvalue())
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            m = json.loads(r.read())
        assert m["stats"]["requests"] >= 3
        assert m["queue_depth"] == 0
        assert sum(m["batch_size_hist"].values()) == m["stats"]["batches"]
        assert m["limits"]["max_batch"] == 8
        assert "quant_batches" in m          # engine backend exposes routing
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()
        thread.join(10)


def test_stress_sixteen_clients_mixed_shapes(engine, rng):
    """>=16 concurrent clients across mixed shapes (VERDICT r4 item 2):
    every request serves correctly (or sheds with 503 — never hangs,
    never corrupts), pending stays within the bound, and the histogram
    accounts for every batch."""
    import io

    server = serve_http(engine, host="127.0.0.1", port=0, max_batch=8,
                        batch_window_ms=20.0, max_pending=256)
    thread, base = _start(server)
    results, failures = [], []
    shapes = [(16, 16), (24, 24), (16, 24)]

    def client(i):
        shape = shapes[i % len(shapes)]
        img = rng.random(shape).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, img)
        try:
            out = np.load(
                __import__("io").BytesIO(_post(base, "/upscale",
                                               buf.getvalue(), timeout=300)))
            results.append((shape, out.shape))
        except urllib.error.HTTPError as e:
            failures.append(e.code)

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(300)
        assert not failures            # 256-deep queue never sheds 16 slices
        assert len(results) == 16
        for shape, out_shape in results:
            assert out_shape == (2 * shape[0], 2 * shape[1])
        assert server.batcher.stats["peak_pending"] <= 256
        assert sum(server.batcher.batch_size_hist.values()) == \
            server.batcher.stats["batches"]
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()
        thread.join(10)


@pytest.fixture(scope="module")
def raw_engine():
    """Engine on the zero-copy transfer path: raw inputs, device-side
    normalize, transposed IO, int16-packed outputs."""
    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (16, 16))
    return InferenceEngine(ModelConfig(base_filters=16), params, bf16=False,
                           normalize_inputs=True, transpose_io=True,
                           out_dtype=np.int16)


@pytest.mark.parametrize("compress", [False, True])
def test_volume_endpoint_raw_zero_copy(raw_engine, rng, compress):
    """/upscale_volume on a --serve_raw engine: int16 NIfTI in ->
    int16 NIfTI out (scl_slope 1/32767), byte-identical to the direct
    engine call on the volume's raw F-order slices."""
    from mri_superresolution_tpu import nifti

    # 4 slices == max_batch: the server's one device batch is the SAME
    # program+shape as the direct call, so int16 codes match bit-for-bit
    # (different batch shapes re-fuse fp32 reductions -> +-1-code flips
    # at round() half boundaries, the usual refusing phenomenon)
    vol = (rng.random((16, 16, 4)) * 900).astype(np.int16)
    blob = nifti.save_bytes(vol, zooms=(2.0, 2.0, 3.0), scl_slope=2.0,
                            compress=compress)
    server = serve_http(raw_engine, host="127.0.0.1", port=0, max_batch=4,
                        batch_window_ms=5.0)
    thread, base = _start(server)
    try:
        out_blob = _post(base, "/upscale_volume", blob, timeout=300)
        assert (out_blob[:2] == b"\x1f\x8b") == compress
        sr_raw, hdr = nifti.load_bytes(out_blob, raw=True)
        assert sr_raw.dtype == np.int16 and sr_raw.shape == (32, 32, 4)
        assert hdr.zooms == (1.0, 1.0, 3.0)
        assert abs(hdr.scl_slope - 1.0 / 32767.0) < 1e-12
        # direct engine path on the same raw slices: (n, w, h) C-order
        # views of the F-order buffer, outputs (n, 2w, 2h)
        want = raw_engine.upscale_batch(np.ascontiguousarray(vol.T))
        np.testing.assert_array_equal(sr_raw, want.T)
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()
        thread.join(10)


def test_upscale_endpoint_raw_native_dtype(raw_engine, rng):
    """POST /upscale with a native-dtype array on a raw engine: served
    without host normalization (the device normalize handles it)."""
    import io

    server = serve_http(raw_engine, host="127.0.0.1", port=0, max_batch=4)
    thread, base = _start(server)
    try:
        img = (rng.random((16, 16)) * 4000).astype(np.uint16)
        buf = io.BytesIO()
        np.save(buf, img.T)        # transpose_io: submit the (w, h) layout
        out = np.load(io.BytesIO(_post(base, "/upscale", buf.getvalue(),
                                       timeout=300)))
        want = raw_engine.upscale_batch(img.T[None])[0]
        np.testing.assert_array_equal(out, want)
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()
        thread.join(10)


def test_volume_endpoint_streams_bounded_memory():
    """Large-volume peak-RSS bound (VERDICT r4 item 8): the z-chunked
    path never materializes the float64 volume + fp32 stack + full
    output the legacy path held. With a 50 MB int16 body whose legacy
    peak would be >1.3 GB (float64 400 MB + fp32 200 MB + fp32 output
    800 MB), the streamed path stays within a fraction of that.
    (ru_maxrss is a process-wide high-water mark, so the assertion is
    strongest when this test runs standalone; in-suite it can only
    pass-trivially, never false-fail.)"""
    import resource

    class _InstantRaw:
        normalize_inputs = True
        transpose_io = True
        out_dtype = np.dtype(np.int16)

        def upscale_batch(self, batch):
            n, w, h = batch.shape
            return np.zeros((n, 2 * w, 2 * h), np.int16)

    from mri_superresolution_tpu import nifti

    vol = np.zeros((256, 256, 400), np.int16)       # 50 MB raw
    blob = nifti.save_bytes(vol, zooms=(1.0, 1.0, 1.0))
    del vol
    server = serve_http(_InstantRaw(), host="127.0.0.1", port=0,
                        max_batch=32, batch_window_ms=1.0)
    thread, base = _start(server)
    try:
        before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        out = _post(base, "/upscale_volume", blob, timeout=300)
        after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        # response: header + 512*512*400 int16 = 200 MB (held by the
        # test client, not the server path) -> allow body+response+chunks
        # with margin, far below the legacy >1.3 GB
        assert (after - before) < 700 * 1024        # KiB on Linux
        sr, hdr = nifti.load_bytes(out, raw=True)
        assert sr.shape == (512, 512, 400) and sr.dtype == np.int16
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()
        thread.join(10)


def test_volume_endpoint_negative_paths(raw_engine, rng):
    """Streaming volume endpoint edge cases: corrupt bytes, truncated
    gzip, negative scl_slope on the raw path, and 4D inputs (timepoint 0
    served) — errors are clean 400s BEFORE any bytes stream."""
    import gzip as _gzip

    from mri_superresolution_tpu import nifti

    server = serve_http(raw_engine, host="127.0.0.1", port=0, max_batch=4)
    thread, base = _start(server)
    try:
        # corrupt body
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "/upscale_volume", b"not a nifti at all")
        assert ei.value.code == 400

        # truncated voxel data (valid header, half the bytes)
        vol = (rng.random((16, 16, 4)) * 900).astype(np.int16)
        blob = nifti.save_bytes(vol)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "/upscale_volume", blob[:len(blob) // 2])
        assert ei.value.code == 400

        # truncated GZIP stream decodes short -> clean 400 too
        gz = _gzip.compress(blob)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "/upscale_volume", gz[:len(gz) // 2])
        assert ei.value.code == 400

        # negative scl_slope is refused on the raw path (flips intensity
        # order; the device-side normalize cannot absorb it)
        neg = nifti.save_bytes(vol, scl_slope=-1.0)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "/upscale_volume", neg)
        assert ei.value.code == 400

        # 4D volume: timepoint 0 served, later timepoints ignored
        vol4 = (rng.random((16, 16, 4, 3)) * 900).astype(np.int16)
        out = _post(base, "/upscale_volume", nifti.save_bytes(vol4),
                    timeout=300)
        sr, _ = nifti.load_bytes(out, raw=True)
        assert sr.shape == (32, 32, 4)
        want = raw_engine.upscale_batch(
            np.ascontiguousarray(vol4[:, :, :, 0].T))
        np.testing.assert_array_equal(sr, want.T)
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()
        thread.join(10)
