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
