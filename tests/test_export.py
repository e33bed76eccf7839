"""Portable AOT serving artifacts (infer/export.py, jax.export)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import ModelConfig
from mri_superresolution_tpu.infer.engine import InferenceEngine
from mri_superresolution_tpu.infer.export import (ServingArtifact,
                                                  export_artifact,
                                                  load_artifact)
from mri_superresolution_tpu.models import UNetSuperRes, init_params


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (16, 16))
    cfg = ModelConfig(base_filters=16)
    path = str(tmp_path_factory.mktemp("art") / "model.mrisrx")
    export_artifact(path, params, cfg, shapes=[(16, 16), (16, 24)],
                    bf16=False, platforms=("cpu",))
    return path, cfg, params


def test_artifact_matches_engine(artifact, rng):
    """Artifact output == the engine's clipped forward, at every exported
    shape and across batch sizes (batch is symbolic: ONE program)."""
    path, cfg, params = artifact
    art = load_artifact(path)
    eng = InferenceEngine(cfg, params, bf16=False)
    assert art.shapes == [(16, 16), (16, 24)]
    for shape in ((1, 16, 16), (5, 16, 16), (3, 16, 24)):
        x = rng.random(shape, dtype=np.float32)
        np.testing.assert_allclose(art.upscale_batch(x),
                                   eng.upscale_batch(x),
                                   rtol=1e-5, atol=1e-6)


def test_artifact_needs_no_model_code(artifact, rng, monkeypatch):
    """Loading + serving an artifact must never touch the model zoo — the
    whole point of shipping StableHLO with baked-in weights."""
    path, _cfg, _params = artifact
    import mri_superresolution_tpu.models as models

    def boom(*a, **k):
        raise AssertionError("model zoo touched during artifact serving")

    monkeypatch.setattr(models, "build_model", boom)
    monkeypatch.setattr(models, "init_params", boom)
    art = load_artifact(path)
    y = art.upscale_batch(rng.random((2, 16, 16), dtype=np.float32))
    assert y.shape == (2, 32, 32) and np.isfinite(y).all()


def test_artifact_rejects_unexported_shape(artifact, rng):
    path, _cfg, _params = artifact
    art = load_artifact(path)
    with pytest.raises(ValueError, match="no program for 24x24"):
        art.upscale_batch(rng.random((1, 24, 24), dtype=np.float32))


def test_artifact_single_image_pipeline(artifact, tmp_path, rng):
    """The engine's full single-image pipeline (normalize, histogram
    matching, metrics, PNG out) runs off the artifact's forward."""
    cv2 = pytest.importorskip("cv2")
    path, _cfg, _params = artifact
    art = load_artifact(path)
    inp = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    tgt = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    ip, tp = str(tmp_path / "in.png"), str(tmp_path / "tgt.png")
    op = str(tmp_path / "out.png")
    cv2.imwrite(ip, inp)
    cv2.imwrite(tp, tgt)
    out, metrics = art.process_single_image(ip, op, tp)
    assert out.shape == (32, 32)
    assert metrics and "ssim" in metrics


def test_artifact_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.mrisrx")
    open(p, "wb").write(b"not an artifact")
    with pytest.raises(ValueError, match="not a serving artifact"):
        load_artifact(p)


def test_export_rejects_non_mod8_shape(artifact):
    _path, cfg, params = artifact
    with pytest.raises(ValueError, match="%8"):
        export_artifact("/tmp/never.mrisrx", params, cfg, shapes=[(10, 16)],
                        bf16=False, platforms=("cpu",))


def test_artifact_padded_serving(artifact, rng):
    """pad=True zero-pads to the smallest fitting exported shape and
    crops the output — checked against a manual pad + exact-shape call."""
    path, _cfg, _params = artifact
    art = load_artifact(path)
    x = rng.random((2, 8, 20), dtype=np.float32)
    got = art.upscale_batch(x, pad=True)
    assert got.shape == (2, 16, 40)
    padded = np.zeros((2, 16, 24), np.float32)   # smallest fit: (16, 24)
    padded[:, :8, :20] = x
    want = art.upscale_batch(padded)[:, :16, :40]
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="no exported shape fits"):
        art.upscale_batch(rng.random((1, 32, 8), dtype=np.float32),
                          pad=True)


def test_artifact_upscale_batches_pipelined_equivalence(artifact, rng):
    """The pipelined generator equals per-batch upscale_batch, including
    mixed exact/padded shapes in one stream."""
    path, _cfg, _params = artifact
    art = load_artifact(path)
    batches = [rng.random((2, 16, 16), dtype=np.float32),
               rng.random((3, 8, 20), dtype=np.float32),
               rng.random((1, 16, 24), dtype=np.float32)]
    outs = list(art.upscale_batches(iter(batches), pad=True))
    assert len(outs) == 3
    for b, got in zip(batches, outs):
        np.testing.assert_array_equal(got, art.upscale_batch(b, pad=True))


def test_artifact_tta_mode_refuses_padding(artifact, tmp_path, rng):
    """A tta-mode artifact transforms the padded array inside its baked
    program, so host-side padding would corrupt the ensemble — refused."""
    _p, cfg, params = artifact
    path = str(tmp_path / "tta_pad.mrisrx")
    export_artifact(path, params, cfg, shapes=[(16, 16)],
                    bf16=False, platforms=("cpu",), mode="tta")
    art = load_artifact(path)
    with pytest.raises(ValueError, match="tta-mode artifact cannot serve"):
        art.upscale_batch(rng.random((1, 8, 8), dtype=np.float32),
                          pad=True)


def test_artifact_tta_mode(artifact, tmp_path, rng):
    """mode='tta' bakes the full dihedral ensemble into ONE program:
    8 members for square shapes, 4 for non-square — checked against an
    independent host-side loop over the PLAIN artifact's forward.
    Non-%8 shapes are legal for tta artifacts (each member pads to %8
    AFTER its transform inside the program — the engine's order), so the
    host check pads each transformed member and crops before inverting."""
    from mri_superresolution_tpu.ops.tta import dihedral_pairs

    plain_path, cfg, params = artifact
    plain = load_artifact(plain_path)
    path = str(tmp_path / "tta.mrisrx")
    export_artifact(path, params, cfg, shapes=[(16, 16), (16, 24), (12, 20)],
                    bf16=False, platforms=("cpu",), mode="tta")
    art = load_artifact(path)
    assert art.mode == "tta"
    for shape in ((2, 16, 16), (3, 16, 24), (2, 12, 20)):
        n, h, w = shape
        x = rng.random(shape, dtype=np.float32)
        square = h == w
        acc = np.zeros((n, 2 * h, 2 * w), np.float64)
        for fwd, inv in dihedral_pairs(square):
            tx = np.ascontiguousarray(fwd(x[..., None])[..., 0])
            th, tw = tx.shape[1:]
            ph, pw = -(-th // 8) * 8, -(-tw // 8) * 8
            padded = np.zeros((n, ph, pw), np.float32)
            padded[:, :th, :tw] = tx
            y = plain.upscale_batch(padded)[:, :2 * th, :2 * tw]
            acc += inv(y[..., None])[..., 0]
        want = acc / len(dihedral_pairs(square))
        np.testing.assert_allclose(art.upscale_batch(x), want,
                                   rtol=1e-5, atol=1e-5)


def test_artifact_int8_mode(artifact, tmp_path, rng):
    """mode='int8' bakes the frozen-scale quantized forward (weights
    pre-quantized) PLUS a plain-forward fallback per shape: rich batches
    match the in-process int8 forward, near-empty batches route to the
    bf16 fallback (the engine's guardrail), and scales are required."""
    from mri_superresolution_tpu.models import quant_forward as qf

    plain_path, cfg, params = artifact
    calib = rng.random((2, 16, 16, 1), dtype=np.float32)
    scales = qf.calibrate(params, [calib], cfg.model_type,
                          dtype=jnp.float32)
    path = str(tmp_path / "int8.mrisrx")
    export_artifact(path, params, cfg, shapes=[(16, 16)], bf16=False,
                    platforms=("cpu",), mode="int8", quant_scales=scales)
    art = load_artifact(path)
    assert art.mode == "int8" and art.routed
    x = rng.random((3, 16, 16), dtype=np.float32)
    fn = jax.jit(qf.build_int8_forward(params, scales, cfg.model_type,
                                       dtype=jnp.float32))
    want = np.clip(np.asarray(fn(params, x[..., None]))[..., 0], 0.0, 1.0)
    np.testing.assert_allclose(art.upscale_batch(x), want,
                               rtol=1e-5, atol=1e-6)
    # a near-empty batch (<5% foreground) serves the baked bf16 fallback
    empty = np.zeros((2, 16, 16), np.float32)
    empty[:, :2, :2] = 0.5
    plain = load_artifact(plain_path)
    np.testing.assert_allclose(art.upscale_batch(empty),
                               plain.upscale_batch(empty),
                               rtol=1e-6, atol=1e-7)
    int8_out = np.clip(np.asarray(
        fn(params, empty[..., None]))[..., 0], 0.0, 1.0)
    assert not np.allclose(art.upscale_batch(empty), int8_out,
                           rtol=1e-5, atol=1e-6), \
        "routing had no effect (int8 == bf16 on this input?)"
    with pytest.raises(ValueError, match="requires quant_scales"):
        export_artifact(str(tmp_path / "no.mrisrx"), params, cfg,
                        shapes=[(16, 16)], bf16=False, platforms=("cpu",),
                        mode="int8")


# ---------------------------------------- round-5 transfer-control artifacts

def test_artifact_packed_output(artifact, rng):
    """out_dtype int16: the program packs on device; values equal the
    engine's device packing of the plain output."""
    path, cfg, params = artifact
    p2 = path + ".int16"
    export_artifact(p2, params, cfg, shapes=[(16, 16)], bf16=False,
                    platforms=("cpu",), out_dtype="int16")
    art = load_artifact(p2)
    assert art.out_dtype == np.dtype(np.int16)
    x = rng.random((3, 16, 16), dtype=np.float32)
    got = art.upscale_batch(x)
    assert got.dtype == np.int16
    eng = InferenceEngine(cfg, params, bf16=False, out_dtype=np.int16)
    # the artifact fuses pack INTO the forward program; the engine packs
    # in a second program — different fusings shift fp32 ULPs, flipping
    # round() at exact half-codes for a sparse set of pixels (the
    # documented refusing phenomenon). Contract: +-1 code, rare.
    d = np.abs(got.astype(np.int32)
               - eng.upscale_batch(x).astype(np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 0.01


def test_artifact_tta_packed_output(artifact, rng):
    """tta x out_dtype: the ensemble packs its fp32 MEAN (engine order)."""
    path, cfg, params = artifact
    plain_tta = path + ".tta"
    packed_tta = path + ".tta8"
    export_artifact(plain_tta, params, cfg, shapes=[(16, 16)], bf16=False,
                    platforms=("cpu",), mode="tta")
    export_artifact(packed_tta, params, cfg, shapes=[(16, 16)], bf16=False,
                    platforms=("cpu",), mode="tta", out_dtype="uint8")
    x = rng.random((2, 16, 16), dtype=np.float32)
    mean = load_artifact(plain_tta).upscale_batch(x)
    got = load_artifact(packed_tta).upscale_batch(x)
    assert got.dtype == np.uint8
    want = np.round(np.clip(mean, 0, 1) * 255.0).astype(np.uint8)
    d = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 0.01   # half-code flips only


def test_artifact_serve_raw_matches_raw_engine(artifact, rng):
    """serve_raw: raw int16 transposed batches through the AOT program ==
    the engine's zero-copy path (same normalize/forward/pack graph)."""
    path, cfg, params = artifact
    p2 = path + ".raw"
    export_artifact(p2, params, cfg, shapes=[(16, 24)], bf16=False,
                    platforms=("cpu",), serve_raw=True, raw_dtype="int16",
                    out_dtype="int16")
    art = load_artifact(p2)
    assert art.normalize_inputs and art.transpose_io
    assert art.raw_dtype == np.dtype(np.int16)
    assert art.header["format"] == "mri-sr-serving-artifact-v3"
    # content shape 16x24 -> transposed batches are (n, 24, 16)
    batch = (rng.random((2, 24, 16)) * 900).astype(np.int16)
    got = art.upscale_batch(batch)
    assert got.shape == (2, 48, 32) and got.dtype == np.int16
    eng = InferenceEngine(cfg, params, bf16=False, normalize_inputs=True,
                          transpose_io=True, out_dtype=np.int16)
    d = np.abs(got.astype(np.int32)
               - eng.upscale_batch(batch).astype(np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 0.01   # half-code flips only


def test_artifact_serve_raw_validation(artifact, rng):
    path, cfg, params = artifact
    p2 = path + ".rawv"
    with pytest.raises(ValueError, match="plain"):
        export_artifact(p2, params, cfg, shapes=[(16, 16)], bf16=False,
                        platforms=("cpu",), mode="tta", serve_raw=True)
    with pytest.raises(ValueError, match="int8"):
        export_artifact(p2, params, cfg, shapes=[(16, 16)], bf16=False,
                        platforms=("cpu",), mode="int8",
                        out_dtype="int16")
    export_artifact(p2, params, cfg, shapes=[(16, 16)], bf16=False,
                    platforms=("cpu",), serve_raw=True, raw_dtype="uint16")
    art = load_artifact(p2)
    with pytest.raises(ValueError, match="uint16"):
        art.upscale_batch(rng.random((1, 16, 16), dtype=np.float32))
    with pytest.raises(ValueError, match="padding|pad"):
        art.upscale_batch((rng.random((1, 24, 24)) * 99).astype(np.uint16),
                          pad=True)
    with pytest.raises(ValueError, match="single-image|PNG|standard"):
        art.process_single_image("x.png", "y.png")


def test_raw_artifact_serves_volumes_through_daemon(artifact, rng):
    """A serve_raw artifact exposes the engine's transfer attributes, so
    the daemon's zero-copy volume endpoint works with NO model code on
    the serving host — the full AOT deployment story."""
    import threading
    import urllib.request

    from mri_superresolution_tpu import nifti
    from mri_superresolution_tpu.infer.server import serve_http

    path, cfg, params = artifact
    p2 = path + ".rawd"
    export_artifact(p2, params, cfg, shapes=[(16, 16)], bf16=False,
                    platforms=("cpu",), serve_raw=True, raw_dtype="int16",
                    out_dtype="int16")
    art = load_artifact(p2)
    vol = (rng.random((16, 16, 4)) * 900).astype(np.int16)
    blob = nifti.save_bytes(vol, zooms=(2.0, 2.0, 2.0))
    server = serve_http(art, host="127.0.0.1", port=0, max_batch=4,
                        batch_window_ms=5.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.server_address[1]}/upscale_volume",
            data=blob)
        with urllib.request.urlopen(req, timeout=300) as resp:
            sr, hdr = nifti.load_bytes(resp.read(), raw=True)
        assert sr.shape == (32, 32, 4) and sr.dtype == np.int16
        assert abs(hdr.scl_slope - 1.0 / 32767.0) < 1e-12
        want = art.upscale_batch(np.ascontiguousarray(vol.T))
        np.testing.assert_array_equal(sr, want.T)
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()
        t.join(10)


# ------------------------------------------------ round-5 spatial artifacts

@pytest.fixture(scope="module")
def spatial_artifact(artifact):
    path, cfg, params = artifact
    p2 = path + ".sp"
    export_artifact(p2, params, cfg, shapes=[(32, 32)], bf16=False,
                    platforms=("cpu",), spatial_shards=4,
                    spatial_devices=8)
    return p2


def test_artifact_spatial_plain(artifact, spatial_artifact, rng):
    """Row-sharded artifact (shard_map baked into StableHLO): serves on
    an 8-device mesh with no model code, matches the dense engine, and
    chunks arbitrary batch sizes exactly (concrete-batch programs;
    symbolic batch does not export with multi-device programs)."""
    path, cfg, params = artifact
    art = load_artifact(spatial_artifact)
    assert art.spatial == {"n_data": 2, "n_space": 4, "batch": 2}
    assert art.header["format"] == "mri-sr-serving-artifact-v3"
    x = rng.random((5, 32, 32), dtype=np.float32)
    y = art.upscale_batch(x)
    assert y.shape == (5, 64, 64)
    dense = InferenceEngine(cfg, params, bf16=False).upscale_batch(x)
    np.testing.assert_allclose(y, dense, rtol=1e-4, atol=3e-5)
    # chunk exactness: per-sample computations are pad-row independent
    np.testing.assert_array_equal(art.upscale_batch(x[:1]), y[:1])


def test_artifact_spatial_tta_and_int8(artifact, rng, tmp_path):
    """tta and routed-int8 modes compose with spatial artifacts: the
    ensemble / frozen-scale int8 forward wrap the row-sharded program."""
    from mri_superresolution_tpu.models import quant_forward as qf

    path, cfg, params = artifact
    rich = rng.random((2, 32, 32), dtype=np.float32)

    p_tta = path + ".sptta"
    export_artifact(p_tta, params, cfg, shapes=[(32, 32)], bf16=False,
                    platforms=("cpu",), mode="tta", spatial_shards=4,
                    spatial_devices=8)
    art = load_artifact(p_tta)
    y = art.upscale_batch(rich)
    assert y.shape == (2, 64, 64) and np.isfinite(y).all()
    dense_tta = InferenceEngine(cfg, params, bf16=False,
                                tta=True).upscale_batch(rich)
    np.testing.assert_allclose(y, dense_tta, rtol=1e-4, atol=3e-5)

    scales = qf.calibrate(params, [rich[..., None]], "unet",
                          dtype=jnp.float32)
    p_i8 = path + ".spi8"
    export_artifact(p_i8, params, cfg, shapes=[(32, 32)], bf16=False,
                    platforms=("cpu",), mode="int8", quant_scales=scales,
                    spatial_shards=4, spatial_devices=8)
    art8 = load_artifact(p_i8)
    assert art8.routed
    y8 = art8.upscale_batch(rich)
    assert y8.shape == (2, 64, 64) and np.isfinite(y8).all()
    assert np.abs(y8 - y).mean() > 0           # int8 path differs from tta
    # near-empty batches route to the row-sharded bf16 fallback
    empty = np.zeros((2, 32, 32), np.float32)
    empty[:, 14:16, 14:16] = 1.0
    base = InferenceEngine(cfg, params, bf16=False).upscale_batch(empty)
    np.testing.assert_allclose(art8.upscale_batch(empty), base,
                               rtol=1e-4, atol=3e-5)


def test_artifact_spatial_validation(artifact, spatial_artifact, rng):
    path, cfg, params = artifact
    with pytest.raises(ValueError, match="H %"):
        export_artifact(path + ".x", params, cfg, shapes=[(16, 16)],
                        bf16=False, platforms=("cpu",), spatial_shards=4,
                        spatial_devices=8)
    with pytest.raises(ValueError, match="serve_raw"):
        export_artifact(path + ".x", params, cfg, shapes=[(32, 32)],
                        bf16=False, platforms=("cpu",), spatial_shards=4,
                        spatial_devices=8, serve_raw=True)
    art = load_artifact(spatial_artifact)
    with pytest.raises(ValueError, match="no program"):
        art.upscale_batch(rng.random((1, 64, 64), dtype=np.float32),
                          pad=True)


def test_spatial_artifact_through_daemon_batcher(artifact, spatial_artifact,
                                                 rng):
    """The serving daemon's batcher composes with a row-sharded artifact
    backend: slices coalesce, the loader's mesh serves them, outputs
    match the direct artifact call."""
    from mri_superresolution_tpu.infer.server import DynamicBatcher

    art = load_artifact(spatial_artifact)
    b = DynamicBatcher(art, max_batch=4, batch_window_ms=100.0)
    try:
        batch = rng.random((3, 32, 32), dtype=np.float32)
        reqs = [b.submit(s) for s in batch]
        outs = np.stack([b.wait(r, timeout=300) for r in reqs])
        want = art.upscale_batch(batch)
        np.testing.assert_array_equal(outs, want)
        assert b.stats["max_batch_seen"] == 3
    finally:
        b.close()
