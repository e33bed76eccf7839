"""int8 PTQ serving path (ops/quant.py + models/quant_forward.py).

The functional `ref` mode is the correctness anchor: asserted bit-identical
to model.apply for both supported families, so calib/int8 modes (same code
path, different conv sites) inherit the structure. int8 closeness bounds
here are loose because random-init nets amplify quantization noise through
GroupNorm; the trained-model quality delta is measured in RESULTS.md.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import ModelConfig
from mri_superresolution_tpu.models import build_model
from mri_superresolution_tpu.models import quant_forward as qf
from mri_superresolution_tpu.ops.quant import (int8_conv, quantize_tensor,
                                               weight_qparams)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _model_and_params(model_type, base_filters=16):
    model = build_model(ModelConfig(model_type=model_type,
                                    base_filters=base_filters),
                        dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))["params"]
    return model, params


def test_weight_qparams_roundtrip(rng):
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    qk, sk = weight_qparams(k)
    assert qk.dtype == jnp.int8 and sk.shape == (16,)
    deq = qk.astype(jnp.float32) * sk
    # symmetric per-channel: error bounded by scale/2 per element
    assert float(jnp.max(jnp.abs(deq - k) / sk)) <= 0.5 + 1e-6


def test_weight_qparams_zero_channel():
    k = jnp.zeros((3, 3, 4, 2))
    qk, sk = weight_qparams(k)
    assert bool(jnp.all(qk == 0)) and bool(jnp.all(sk == 1.0))


def test_int8_conv_exact_vs_int32():
    r = np.random.default_rng(0)
    qx = jnp.asarray(r.integers(-127, 128, (2, 9, 9, 8)), jnp.int8)
    qk = jnp.asarray(r.integers(-127, 128, (3, 3, 8, 4)), jnp.int8)
    sk = jnp.asarray(r.random(4, np.float32) + 0.5)
    got = int8_conv(qx, qk, sk, padding=1, out_dtype=jnp.float32)
    from jax import lax
    want = lax.conv_general_dilated(
        qx.astype(jnp.int32), qk.astype(jnp.int32), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(np.float32)
    want = want * sk
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_weight_qparams_act_scale_folding():
    """Per-input-channel activation-scale folding: q_x @ w_folded dequants
    with the weight scale alone."""
    r = np.random.default_rng(3)
    x = jnp.asarray(r.normal(size=(2, 8, 8, 6)).astype(np.float32))
    k = jnp.asarray(r.normal(size=(3, 3, 6, 4)).astype(np.float32))
    s_act = jnp.asarray(np.abs(x).max(axis=(0, 1, 2)) / 127.0)
    qk, sk = weight_qparams(k, act_scale=s_act)
    got = int8_conv(quantize_tensor(x, s_act), qk, sk, padding=1,
                    out_dtype=jnp.float32)
    from jax import lax
    want = lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert err < 0.05


def test_quantize_tensor_saturates():
    x = jnp.asarray([-10.0, -1.0, 0.0, 0.4, 10.0])
    q = quantize_tensor(x, 0.01)
    np.testing.assert_array_equal(np.asarray(q), [-127, -100, 0, 40, 127])


N_QUANT_SITES = {"unet": 20, "unet_tpu": 20, "edsr": 18, "simple": 2}


@pytest.mark.parametrize("model_type",
                         ["unet", "unet_tpu", "edsr", "simple"])
def test_ref_forward_bit_identical_to_model_apply(model_type, rng):
    model, params = _model_and_params(model_type)
    x = jnp.asarray(rng.random((2, 40, 48, 1), np.float32))
    want = model.apply({"params": params}, x)
    got = qf.reference_forward(params, x, model_type)
    assert bool(jnp.all(want == got))


@pytest.mark.parametrize("model_type",
                         ["unet", "unet_tpu", "edsr", "simple"])
def test_calibrate_covers_all_sites(model_type, rng):
    _, params = _model_and_params(model_type)
    x = rng.random((2, 32, 32, 1), np.float32)
    scales = qf.calibrate(params, [x], model_type)
    # unet families: 2 (inc) + 6 (downs) + 9 (ups) + 3 family-specific
    # quantized convs; edsr: head + 2 per block + body_out; simple: 2
    assert len(scales) == N_QUANT_SITES[model_type]
    assert all(np.all(np.asarray(s) > 0) for s in scales.values())
    assert "__out__" not in scales
    fn = qf.build_int8_forward(params, scales, model_type)
    y = jax.jit(fn)(params, jnp.asarray(x))
    assert y.shape == (2, 64, 64, 1)


@pytest.mark.parametrize("model_type",
                         ["unet", "unet_tpu", "edsr", "simple"])
def test_int8_forward_close_and_bounded(model_type, rng):
    model, params = _model_and_params(model_type)
    x = jnp.asarray(rng.random((2, 40, 40, 1), np.float32))
    want = np.asarray(model.apply({"params": params}, x))
    scales = qf.calibrate(params, [np.asarray(x)], model_type)
    got = np.asarray(jax.jit(qf.build_int8_forward(
        params, scales, model_type))(params, x))
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    assert got.min() >= 0.0 and got.max() <= 1.0       # sigmoid output
    assert np.mean(np.abs(got - want)) < 0.05          # random-weights bound


def test_missing_scales_raise(rng):
    _, params = _model_and_params("unet")
    with pytest.raises(ValueError, match="missing"):
        qf.build_int8_forward(params, {"inc.conv1": 0.1}, "unet")


def test_engine_int8_serving_close_to_bf16(rng):
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    cfg = ModelConfig(model_type="unet", base_filters=16)
    _, params = _model_and_params("unet")
    batch = rng.random((3, 40, 40), np.float32)
    base = InferenceEngine(cfg, params).upscale_batch(batch)
    qeng = InferenceEngine(cfg, params, quant="int8", quant_calib_slices=4)
    calib = qeng.upscale_batch(batch)   # 3 < 4 slices: bf16 calib serve
    assert qeng._quant_fwd is None      # still calibrating after batch 1
    # calib mode is the same bf16 math but its extra stat ops change XLA
    # fusion (hence bf16 rounding points) — close, not bit-equal
    assert np.mean(np.abs(calib - base)) < 0.02
    mid = qeng.upscale_batch(batch)     # completes (6 >= 4): bf16 y served,
    assert qeng._quant_fwd is not None  # int8 starts NEXT batch
    assert np.mean(np.abs(mid - base)) < 0.02
    quant = qeng.upscale_batch(batch)   # int8-served
    assert quant.shape == base.shape == (3, 80, 80)
    assert np.isfinite(quant).all()
    assert quant.min() >= 0.0 and quant.max() <= 1.0
    assert np.mean(np.abs(quant - base)) < 0.05
    assert qeng._quant_batches == {"int8": 1, "bf16": 2}


def test_engine_single_batch_calibration_serves_int8(rng):
    """A batch that single-handedly completes calibration is re-served
    int8 — the single-image --quant int8 CLI contract."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    cfg = ModelConfig(model_type="unet", base_filters=16)
    _, params = _model_and_params("unet")
    batch = rng.random((2, 40, 40), np.float32)
    base = InferenceEngine(cfg, params).upscale_batch(batch)
    qeng = InferenceEngine(cfg, params, quant="int8", quant_calib_slices=1)
    out = qeng.upscale_batch(batch)
    assert qeng._quant_fwd is not None
    assert qeng._quant_batches["int8"] == 1
    assert np.abs(out - base).mean() > 0.0      # int8, not the bf16 output
    assert "frozen" in qeng.quant_summary()


def test_engine_routes_near_empty_batches_to_bf16(rng):
    """Content-aware quality guardrail: once scales are frozen, a batch
    below the foreground threshold serves on the exact bf16 engine path."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    cfg = ModelConfig(model_type="unet", base_filters=16)
    _, params = _model_and_params("unet")
    rich = rng.random((2, 40, 40), np.float32)
    empty = np.zeros((2, 40, 40), np.float32)
    empty[:, 18:20, 18:20] = 1.0      # 0.25% foreground

    base = InferenceEngine(cfg, params)
    qeng = InferenceEngine(cfg, params, quant="int8", quant_calib_slices=1)
    qeng.upscale_batch(rich)                   # calibrate + freeze
    assert qeng._quant_fwd is not None
    routed = qeng.upscale_batch(empty)         # routed to bf16: identical
    np.testing.assert_array_equal(routed, base.upscale_batch(empty))
    quant = qeng.upscale_batch(rich)           # rich batch stays int8
    assert np.abs(quant - base.upscale_batch(rich)).mean() > 0.0


def test_engine_near_empty_batches_do_not_calibrate(rng):
    """Background-heavy batches are excluded from calibration (their
    ranges would hard-clip later anatomy) and served bf16."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    cfg = ModelConfig(model_type="unet", base_filters=16)
    _, params = _model_and_params("unet")
    empty = np.zeros((2, 40, 40), np.float32)
    empty[:, 18:20, 18:20] = 1.0               # 0.25% foreground
    qeng = InferenceEngine(cfg, params, quant="int8", quant_calib_slices=1)
    out = qeng.upscale_batch(empty)
    assert qeng._calib_seen == 0               # not used for calibration
    assert qeng._quant_fwd is None             # scales not frozen
    assert qeng._quant_batches["bf16"] == 1
    assert out.shape == (2, 80, 80)
    assert "INCOMPLETE" in qeng.quant_summary()


def test_engine_quant_with_bucket_padding(rng):
    """bucket > 1 zero-pads spatially; the foreground fraction must come
    from the real pixels, so a content-rich odd-size batch still serves
    int8 after calibration."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    cfg = ModelConfig(model_type="unet", base_filters=16)
    _, params = _model_and_params("unet")
    batch = rng.random((2, 40, 40), np.float32)     # pads to 64x64: fg/2.6
    qeng = InferenceEngine(cfg, params, quant="int8", quant_calib_slices=1,
                           bucket=64)
    out = qeng.upscale_batch(batch)
    assert qeng._quant_fwd is not None
    assert qeng._quant_batches["int8"] == 1         # not diluted-misrouted
    assert out.shape == (2, 80, 80)


def test_engine_quant_validation(rng):
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    _, params = _model_and_params("unet")
    with pytest.raises(ValueError, match="unknown quant"):
        InferenceEngine(ModelConfig(model_type="unet", base_filters=16),
                        params, quant="fp8")
    # every registered family now has a quantizable forward, so the only
    # rejectable model type is an unknown one (build_model raises first;
    # the engine's supported() gate stays as defense for future families)
    with pytest.raises(ValueError, match="Unknown model type"):
        InferenceEngine(ModelConfig(model_type="hourglass",
                                    base_filters=16),
                        params, quant="int8")
    with pytest.raises(ValueError, match="calib_slices"):
        InferenceEngine(ModelConfig(model_type="unet", base_filters=16),
                        params, quant="int8", quant_calib_slices=0)


def test_calibrate_multiple_batches_takes_max(rng):
    _, params = _model_and_params("unet")
    small = rng.random((1, 32, 32, 1), np.float32) * 0.1
    big = rng.random((1, 32, 32, 1), np.float32)
    s_small = qf.calibrate(params, [small], "unet")
    s_both = qf.calibrate(params, [small, big], "unet")
    assert np.all(s_both["inc.conv1"] >= s_small["inc.conv1"])
    assert s_both["inc.conv2"].shape == (16,)   # per-input-channel


def test_scales_save_load_roundtrip(tmp_path, rng):
    _, params = _model_and_params("unet")
    scales = qf.calibrate(params, [rng.random((1, 32, 32, 1), np.float32)],
                          "unet")
    path = str(tmp_path / "scales.json")
    qf.save_scales(path, scales, "unet")
    loaded, mtype = qf.load_scales(path)
    assert mtype == "unet"
    assert set(loaded) == set(scales)
    for k in scales:
        np.testing.assert_array_equal(loaded[k],
                                      np.asarray(scales[k], np.float32))


def test_load_scales_rejects_foreign_json(tmp_path):
    path = tmp_path / "not_scales.json"
    path.write_text('{"hello": 1}')
    with pytest.raises(ValueError, match="scales file"):
        qf.load_scales(str(path))


def test_engine_quant_calib_path_persistence(tmp_path, rng):
    """--quant_calib PATH makes int8 serving deterministic across
    processes: run 1 self-calibrates and saves; runs 2 and 3 load the
    frozen scales, serve int8 from batch 0, and emit byte-identical
    outputs (VERDICT r2 item 4)."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    cfg = ModelConfig(model_type="unet", base_filters=16)
    _, params = _model_and_params("unet")
    batch = rng.random((2, 40, 40), np.float32)
    path = str(tmp_path / "calib.json")

    eng1 = InferenceEngine(cfg, params, quant="int8", quant_calib_slices=1,
                           quant_calib_path=path)
    assert eng1._quant_fwd is None          # file absent: streaming calib
    out1 = eng1.upscale_batch(batch)        # calibrates, freezes, saves
    assert (tmp_path / "calib.json").exists()

    eng2 = InferenceEngine(cfg, params, quant="int8", quant_calib_slices=1,
                           quant_calib_path=path)
    assert eng2._quant_fwd is not None      # loaded: int8 from batch 0
    out2 = eng2.upscale_batch(batch)
    assert eng2._quant_batches == {"int8": 1, "bf16": 0}
    np.testing.assert_array_equal(out1, out2)   # same frozen scales

    eng3 = InferenceEngine(cfg, params, quant="int8", quant_calib_slices=1,
                           quant_calib_path=path)
    np.testing.assert_array_equal(out2, eng3.upscale_batch(batch))


def test_engine_quant_calib_path_model_mismatch(tmp_path, rng):
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    _, params = _model_and_params("unet")
    scales = qf.calibrate(params, [rng.random((1, 32, 32, 1), np.float32)],
                          "unet")
    path = str(tmp_path / "calib.json")
    qf.save_scales(path, scales, "unet")
    _, tparams = _model_and_params("unet_tpu")
    with pytest.raises(ValueError, match="model type"):
        InferenceEngine(ModelConfig(model_type="unet_tpu", base_filters=16),
                        tparams, quant="int8", quant_calib_path=path)


def test_engine_unet_tpu_int8_advisory(caplog, rng):
    """Choosing --quant int8 for unet_tpu logs the measured-slower advisory
    (RESULTS.md 2b) instead of failing silently-slower."""
    import logging
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    _, tparams = _model_and_params("unet_tpu")
    # the package logger sets propagate=False, so hook its handler directly
    eng_logger = logging.getLogger("mri_superresolution_tpu.infer")
    eng_logger.addHandler(caplog.handler)
    try:
        InferenceEngine(ModelConfig(model_type="unet_tpu", base_filters=16),
                        tparams, quant="int8")
    finally:
        eng_logger.removeHandler(caplog.handler)
    assert any("MEASURED SLOWER" in r.message for r in caplog.records)
