"""Inference engine + baseline tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import InferConfig, ModelConfig
from mri_superresolution_tpu.evalsuite import (sharpen3x3,
                                               upscale_with_interpolation)
from mri_superresolution_tpu.infer import (InferenceEngine, load_engine,
                                           preprocess_image_array)
from mri_superresolution_tpu.models import UNetSuperRes, init_params
from mri_superresolution_tpu.train import checkpoint as ckpt


def _engine(base_filters=16, num_devices=1, **kw):
    model = UNetSuperRes(base_filters=base_filters)
    params = init_params(model, jax.random.key(0), (16, 16))
    return InferenceEngine(ModelConfig(base_filters=base_filters), params,
                           bf16=False, num_devices=num_devices, **kw)


def test_preprocess_image_array(rng):
    img = rng.integers(0, 255, (40, 40)).astype(np.float32)
    out = preprocess_image_array(img)
    assert out.min() >= 0 and out.max() <= 1
    lo, hi = np.percentile(img, 0.5), np.percentile(img, 99.5)
    want = np.clip(img, lo, hi)
    want = (want - lo) / (hi - lo)
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_upscale_shapes_and_bucketing(rng):
    eng = _engine()
    # non-%8, non-bucket-aligned size
    x = rng.random((3, 27, 35)).astype(np.float32)
    y = eng.upscale_batch(x)
    assert y.shape == (3, 54, 70)
    assert y.min() >= 0 and y.max() <= 1
    # bucketed padding must not change the result vs direct forward
    y1 = eng.upscale_image(x[0])
    np.testing.assert_allclose(y[0], y1, atol=1e-5)


def test_upscale_sharded_over_mesh(rng):
    eng = _engine(num_devices=8)
    assert eng.n_devices == 8
    x = rng.random((5, 16, 16)).astype(np.float32)  # 5 → padded to 8 rows
    y = eng.upscale_batch(x)
    assert y.shape == (5, 32, 32)
    # same result as single-device engine with identical params
    eng1 = InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                           num_devices=1)
    y1 = eng1.upscale_batch(x)
    np.testing.assert_allclose(y, y1, atol=1e-5)


def test_metrics_resizes_mismatched_target(rng):
    out = rng.random((32, 32)).astype(np.float32)
    target = rng.random((30, 30)).astype(np.float32)
    m = InferenceEngine.calculate_metrics(out, target)
    assert set(m) == {"ssim", "rmse", "mae"}
    assert all(np.isfinite(v) for v in m.values())


def test_process_single_image_end_to_end(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    eng = _engine()
    inp = rng.integers(0, 255, (24, 24), dtype=np.uint8)
    tgt = rng.integers(0, 255, (48, 48), dtype=np.uint8)
    ipath, tpath = str(tmp_path / "in.png"), str(tmp_path / "tgt.png")
    opath = str(tmp_path / "out.png")
    fpath = str(tmp_path / "fig.png")
    cv2.imwrite(ipath, inp)
    cv2.imwrite(tpath, tgt)
    out, metrics = eng.process_single_image(
        ipath, opath, tpath, show_comparison=True, show_diff=True,
        save_figures_to=fpath)
    assert out.shape == (48, 48)
    assert os.path.exists(opath) and os.path.exists(fpath)
    assert metrics and "ssim" in metrics
    # histogram matching pulls output distribution toward the target's
    saved = cv2.imread(opath, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255
    tgt01 = preprocess_image_array(tgt.astype(np.float32))
    assert abs(np.median(saved) - np.median(tgt01)) < 0.1


def test_load_engine_from_checkpoint(tmp_path, rng):
    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (16, 16))
    d = str(tmp_path)
    ckpt.save_checkpoint(os.path.join(d, "best_model_unet"), params,
                         meta={"config": {"model": {
                             "model_type": "unet", "base_filters": 16}}})
    # engine must pick up base_filters from the checkpoint even though the
    # CLI default differs (fixes the reference's 32-vs-64 default clash)
    eng = load_engine(InferConfig(model=ModelConfig(base_filters=64),
                                  checkpoint_dir=d, bf16=False))
    assert eng.model_cfg.base_filters == 16
    y = eng.upscale_batch(rng.random((1, 16, 16)).astype(np.float32))
    assert y.shape == (1, 32, 32)

    # every quant field must thread through to the engine (a dropped
    # kwarg here silently disables --quant_calib persistence)
    calib = os.path.join(d, "calib.json")
    qeng = load_engine(InferConfig(
        model=ModelConfig(base_filters=64), checkpoint_dir=d,
        quant="int8", quant_calib_slices=1, quant_calib_path=calib))
    assert qeng.quant_calib_path == calib
    qeng.upscale_batch(rng.random((1, 16, 16)).astype(np.float32))
    assert os.path.exists(calib)        # frozen scales persisted


def test_sharpen_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((20, 24)).astype(np.float32)
    got = np.asarray(sharpen3x3(jnp.asarray(img)))
    kern = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]], np.float32)
    want = cv2.filter2D(img, -1, kern)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("method", ["bilinear", "sharp_bilinear", "bicubic"])
def test_baseline_upscales(rng, method):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((16, 20)).astype(np.float32)
    got = np.asarray(upscale_with_interpolation(jnp.asarray(img), method))
    assert got.shape == (32, 40)
    if method != "sharp_bilinear":
        flag = cv2.INTER_LINEAR if method == "bilinear" else cv2.INTER_CUBIC
        want = cv2.resize(img, (40, 32), interpolation=flag)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_native_size_forward_no_padding_distortion(rng):
    """Default engine (bucket=1) must produce the same result as a direct
    native-shape forward — zero padding into shape buckets would corrupt
    GroupNorm's whole-image statistics."""
    import jax.numpy as jnp
    eng = _engine()
    img = rng.random((40, 40)).astype(np.float32)
    got = eng.upscale_image(img)
    direct = np.asarray(jnp.clip(eng.model.apply(
        {"params": eng.params}, jnp.asarray(img)[None, :, :, None]),
        0.0, 1.0))[0, :, :, 0]
    np.testing.assert_allclose(got, direct, atol=1e-4)


def test_tta_matches_manual_dihedral_average(rng):
    """tta=True must equal the hand-computed mean over t⁻¹(upscale(t(x)))
    for the 8 square-input dihedral transforms (4 for non-square), using
    the same engine's plain forward as the oracle."""
    eng = _engine()
    eng_tta = InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                              tta=True)

    def manual(batch, transforms):
        acc = np.zeros((batch.shape[0], 2 * batch.shape[1],
                        2 * batch.shape[2]), np.float32)
        for t, inv in transforms:
            acc += inv(eng.upscale_batch(np.ascontiguousarray(t(batch))))
        return acc / len(transforms)

    flips = [(lambda x: x, lambda y: y),
             (lambda x: x[:, ::-1], lambda y: y[:, ::-1]),
             (lambda x: x[:, :, ::-1], lambda y: y[:, :, ::-1]),
             (lambda x: x[:, ::-1, ::-1], lambda y: y[:, ::-1, ::-1])]
    tr = lambda a: np.ascontiguousarray(a.transpose(0, 2, 1))

    # square input: 8 transforms (flips x optional transpose)
    sq = rng.random((2, 16, 16), dtype=np.float32)
    eight = flips + [(lambda x, f=f: f(tr(x)), lambda y, f=f: tr(f(y)))
                     for f, _ in flips]
    np.testing.assert_allclose(eng_tta.upscale_batch(sq), manual(sq, eight),
                               rtol=1e-5, atol=1e-6)

    # non-square input: the 4 flips only (transpose would change the shape)
    nsq = rng.random((2, 16, 24), dtype=np.float32)
    np.testing.assert_allclose(eng_tta.upscale_batch(nsq),
                               manual(nsq, flips), rtol=1e-5, atol=1e-6)

    # the ensemble is dihedral-equivariant BY CONSTRUCTION even though the
    # model itself is not: flipping the input flips the TTA output exactly
    flipped = eng_tta.upscale_batch(np.ascontiguousarray(sq[:, ::-1]))
    np.testing.assert_allclose(flipped[:, ::-1], eng_tta.upscale_batch(sq),
                               rtol=1e-5, atol=1e-6)


def test_tta_routes_on_device_vs_host(rng):
    """Dense TTA batches — including bucketed/padded ones — AND
    row-sharded (spatial) batches run the on-device ensemble (ops/tta.py,
    one jitted program); only a still-calibrating int8 engine falls back
    to the host-side transform loop. Pins the ROUTING so a regression
    can't silently send everything down the 8-round-trip host path."""
    eng = _engine(tta=True)
    # %8 square input, bucket=1: no spatial padding -> device ensemble
    y = eng.upscale_batch(rng.random((2, 16, 16), dtype=np.float32))
    assert y.shape == (2, 32, 32)
    assert (True, "bf16", None) in eng._tta_fwd  # square ensemble built
    assert ("tta", "bf16", 2, 16, 16) in eng._compiled_shapes
    # rect input: 4-flip device ensemble (bucket=1 never pads spatially,
    # so the model's own internal %8 padding sees the same transformed
    # input on either path)
    eng.upscale_batch(rng.random((2, 16, 24), dtype=np.float32))
    assert (False, "bf16", None) in eng._tta_fwd
    # bucket>1 pads non-aligned sizes INSIDE the traced body (transform-
    # then-pad) — still the device ensemble, never the host loop
    eng2 = _engine(tta=True, bucket=32)
    y2 = eng2.upscale_batch(rng.random((2, 10, 10), dtype=np.float32))
    assert y2.shape == (2, 20, 20)
    assert (True, "bf16", None) in eng2._tta_fwd
    assert ("tta", "bf16", 2, 10, 10) in eng2._compiled_shapes
    assert all(s[0] == "tta" for s in eng2._compiled_shapes)
    # spatial sharding: on-device too — the ensemble wraps the shard_map
    # forward, keyed by the (bh, bw) it was built for
    eng3 = _engine(num_devices=2, spatial_shards=2, tta=True)
    eng3.upscale_batch(rng.random((2, 16, 16), dtype=np.float32))
    assert (True, "bf16", (16, 16)) in eng3._tta_fwd
    # still-calibrating int8: the one remaining host-loop ensemble
    eng4 = _engine(tta=True, quant="int8", quant_calib_slices=100,
                   quant_min_foreground=0.0)
    eng4.upscale_batch(rng.random((2, 16, 16), dtype=np.float32))
    assert eng4._tta_fwd == {}


def test_tta_padded_bucket_matches_host_loop(rng):
    """Under bucket>1 the on-device ensemble pads each member AFTER its
    dihedral transform and crops before the inverse — exactly the host
    loop's _upscale_once order, so a hand-run host loop over a non-TTA
    engine with the SAME bucket is an exact oracle (square: 8 members,
    rect: 4)."""
    from mri_superresolution_tpu.ops.tta import dihedral_pairs

    for shape in ((2, 10, 10), (3, 10, 14)):
        eng_tta = _engine(tta=True, bucket=32)
        eng = InferenceEngine(eng_tta.model_cfg, eng_tta.params, bf16=False,
                              bucket=32)
        x = rng.random(shape, dtype=np.float32)
        transforms = dihedral_pairs(square=(shape[1] == shape[2]))
        acc = np.zeros((shape[0], 2 * shape[1], 2 * shape[2]), np.float32)
        for t, inv in transforms:
            acc += np.asarray(
                inv(eng.upscale_batch(np.ascontiguousarray(t(x)))))
        np.testing.assert_allclose(eng_tta.upscale_batch(x),
                                   acc / len(transforms),
                                   rtol=1e-5, atol=1e-6)


def test_tta_on_device_over_mesh(rng):
    """The on-device ensemble compiles and runs data-sharded over the
    8-device mesh (batch axis sharded; the stacked transform axis and the
    fori_loop carry must not break GSPMD propagation)."""
    eng = _engine(num_devices=8, tta=True)
    x = rng.random((8, 16, 16), dtype=np.float32)
    y = eng.upscale_batch(x)
    assert y.shape == (8, 32, 32) and np.isfinite(y).all()
    assert (True, "bf16", None) in eng._tta_fwd


def test_tta_int8_frozen_routes_on_device(rng, tmp_path):
    """Once int8 scales are frozen (here: via a saved sidecar), TTA runs
    the on-device ensemble over the int8 forward — and matches the
    host-side loop over the same frozen int8 program exactly. Near-empty
    batches still route to the bf16 ensemble."""
    from mri_superresolution_tpu.models import quant_forward

    eng0 = _engine()
    calib = rng.random((4, 16, 16, 1), dtype=np.float32)
    scales = quant_forward.calibrate(jax.device_get(eng0.params), [calib],
                                     "unet", dtype=jnp.float32)
    path = str(tmp_path / "scales.json")
    quant_forward.save_scales(path, scales, "unet")

    eng = InferenceEngine(eng0.model_cfg, eng0.params, bf16=False,
                          quant="int8", quant_calib_path=path,
                          quant_min_foreground=0.05, tta=True)
    x = rng.random((2, 16, 16), dtype=np.float32)
    y = eng.upscale_batch(x)
    assert (True, "int8", None) in eng._tta_fwd  # int8 ensemble compiled
    assert eng._quant_batches["int8"] == 1

    # oracle: host loop over the jitted frozen-int8 single forward
    flips = [(lambda a: a, lambda b: b),
             (lambda a: a[:, ::-1], lambda b: b[:, ::-1]),
             (lambda a: a[:, :, ::-1], lambda b: b[:, :, ::-1]),
             (lambda a: a[:, ::-1, ::-1], lambda b: b[:, ::-1, ::-1])]
    tr = lambda a: np.ascontiguousarray(a.transpose(0, 2, 1))
    eight = flips + [(lambda a, f=f: f(tr(a)), lambda b, f=f: tr(f(b)))
                     for f, _ in flips]
    acc = np.zeros((2, 32, 32), np.float32)
    for t, inv in eight:
        out = eng._quant_fwd(eng.params,
                             jnp.asarray(np.ascontiguousarray(
                                 t(x))[..., None]))
        acc += inv(np.asarray(out[..., 0]))
    np.testing.assert_allclose(y, acc / 8, rtol=1e-5, atol=1e-6)

    # near-empty batch: bf16 ensemble, not int8
    bg = np.zeros((2, 16, 16), np.float32)
    eng.upscale_batch(bg)
    assert (True, "bf16", None) in eng._tta_fwd
    assert eng._quant_batches["bf16"] == 1


def test_tta_composes_with_bucketing(rng):
    """tta + bucket>1: transforms run through the padded/cropped path
    unchanged — output shape exact, finite, and flip-equivariant."""
    eng = _engine(bucket=32, tta=True)
    x = rng.random((3, 20, 24), dtype=np.float32)
    y = eng.upscale_batch(x)
    assert y.shape == (3, 40, 48) and np.isfinite(y).all()
    yf = eng.upscale_batch(np.ascontiguousarray(x[:, :, ::-1]))
    np.testing.assert_allclose(yf[:, :, ::-1], y, rtol=1e-5, atol=1e-6)


def test_tta_int8_calibration_counts_slices_once(rng):
    """Under TTA, only the identity pass feeds int8 streaming calibration
    (8 flips of one slice are not 8 calibration slices) and a calibrating
    ensemble never mixes bf16 and int8 members."""
    eng = _engine(quant="int8", quant_calib_slices=100,
                  quant_min_foreground=0.0, tta=True)
    x = rng.random((2, 16, 16), dtype=np.float32)
    y = eng.upscale_batch(x)
    assert y.shape == (2, 32, 32) and np.isfinite(y).all()
    assert eng._calib_seen == 2          # counted once, not 8x
    assert eng._quant_fwd is None        # still calibrating (target 100)
    # all 8 members served bf16 while calibrating: the ensemble must equal
    # the plain-bf16 TTA engine's output exactly
    plain = InferenceEngine(eng.model_cfg, eng.params, bf16=False, tta=True)
    np.testing.assert_allclose(y, plain.upscale_batch(x), rtol=1e-6,
                               atol=1e-7)


def test_tta_int8_calibration_completing_mid_ensemble_stays_bf16(rng):
    """The hard uniformity case: a TTA batch whose IDENTITY pass completes
    streaming calibration (freezing the scales, but itself served bf16 from
    the calibration forward) must serve the remaining 7 members bf16 too —
    r3 review: they used to find the freshly-frozen _quant_fwd and serve
    int8, mixing precisions inside one averaged ensemble. Also pins the
    batch accounting: one ensemble counts as ONE batch on both TTA routes.
    """
    eng = _engine(quant="int8", quant_calib_slices=3,
                  quant_min_foreground=0.0, tta=True)
    x1 = rng.random((2, 16, 16), dtype=np.float32)
    x2 = rng.random((2, 16, 16), dtype=np.float32)
    plain = InferenceEngine(eng.model_cfg, eng.params, bf16=False, tta=True)

    eng.upscale_batch(x1)                  # 2/3 slices: still calibrating
    assert eng._quant_fwd is None
    y2 = eng.upscale_batch(x2)             # identity pass completes (4/3)
    assert eng._quant_fwd is not None      # scales froze mid-ensemble...
    np.testing.assert_allclose(            # ...but the ensemble stayed bf16
        y2, plain.upscale_batch(x2), rtol=1e-6, atol=1e-7)
    assert eng._quant_batches == {"bf16": 2, "int8": 0}

    # next batch: frozen scales + unpadded -> on-device int8 ensemble,
    # counted once per batch just like the host loop
    eng.upscale_batch(rng.random((2, 16, 16), dtype=np.float32))
    assert eng._quant_batches == {"bf16": 2, "int8": 1}


def test_upscale_batches_matches_sequential(rng):
    """Pipelined serving (upscale_batches): dispatch i+1 before fetching i
    must yield exactly map(upscale_batch, ...) — values AND order — across
    mixed shapes; the deferred fetch is a scheduling change only."""
    eng, ref_eng = _engine(), _engine()
    batches = [rng.random((2, 16, 16), dtype=np.float32),
               rng.random((3, 24, 16), dtype=np.float32),
               rng.random((1, 16, 16), dtype=np.float32)]
    ref = [ref_eng.upscale_batch(b) for b in batches]
    got = list(eng.upscale_batches(iter(batches)))
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        assert r.shape == g.shape
        np.testing.assert_array_equal(r, g)


def test_upscale_batches_pipelines_on_device_tta(rng):
    """On-device TTA ensembles are single dispatches, so they pipeline."""
    eng, ref_eng = _engine(tta=True), _engine(tta=True)
    batches = [rng.random((2, 16, 16), dtype=np.float32) for _ in range(3)]
    ref = [ref_eng.upscale_batch(b) for b in batches]
    got = list(eng.upscale_batches(iter(batches)))
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_upscale_batches_int8_freeze_mid_stream(rng):
    """The stateful int8 routing runs at DISPATCH time in batch order, so a
    stream whose streaming calibration completes mid-stream serves the same
    precision batch-for-batch as the sequential loop (bf16 while
    calibrating, int8 after the freeze)."""
    kw = dict(quant="int8", quant_calib_slices=3, quant_min_foreground=0.0)
    eng, ref_eng = _engine(**kw), _engine(**kw)
    batches = [rng.random((2, 16, 16), dtype=np.float32) for _ in range(4)]
    ref = [ref_eng.upscale_batch(b) for b in batches]
    got = list(eng.upscale_batches(iter(batches)))
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)
    assert eng._quant_fwd is not None
    assert eng._quant_batches == ref_eng._quant_batches


def test_upscale_batches_host_loop_tta_flushes(rng):
    """Host-loop TTA ensembles (still-calibrating int8) are inherently
    synchronous: the generator flushes its pending fetch and falls back to
    sequential upscale_batch calls — identical values, identical order."""
    kw = dict(quant="int8", quant_calib_slices=100,
              quant_min_foreground=0.0, tta=True)
    eng, ref_eng = _engine(**kw), _engine(**kw)
    batches = [rng.random((2, 16, 16), dtype=np.float32) for _ in range(2)]
    ref = [ref_eng.upscale_batch(b) for b in batches]
    got = list(eng.upscale_batches(iter(batches)))
    assert eng._tta_fwd == {}            # really exercised the host loop
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def _spatial_engine(rng, tta=False, spatial_shards=2, num_devices=8):
    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (16, 16))
    cfg = ModelConfig(base_filters=16)
    return InferenceEngine(cfg, params, bf16=False,
                           num_devices=num_devices,
                           spatial_shards=spatial_shards, tta=tta)


def test_upscale_batches_spatial_pipelines(rng):
    """The pipelined non-TTA spatial path (deferred-fetch branch) must
    equal map(upscale_batch, ...) — pins the shard_map forward's deferred
    fetch too (r3 advisor finding)."""
    eng, ref_eng = _spatial_engine(rng), _spatial_engine(rng)
    batches = [rng.random((2, 16, 16), dtype=np.float32),
               rng.random((3, 32, 16), dtype=np.float32),
               rng.random((1, 16, 16), dtype=np.float32)]
    ref = [ref_eng.upscale_batch(b) for b in batches]
    got = list(eng.upscale_batches(iter(batches)))
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        assert r.shape == g.shape
        np.testing.assert_array_equal(r, g)


def test_tta_spatial_on_device_matches_host_loop(rng):
    """Row-sharded TTA runs ON DEVICE (the ensemble wraps the shard_map
    forward). Oracle: the hand-run host loop over a non-TTA spatial
    engine with identical params — same transform-then-pad order, so the
    results agree to float tolerance, for conforming (16x16), padded
    (12x12 -> 16x16) and rectangular (16x24) shapes."""
    from mri_superresolution_tpu.ops.tta import dihedral_pairs

    for shape in ((2, 16, 16), (2, 12, 12), (3, 16, 24)):
        eng_tta = _spatial_engine(rng, tta=True)
        eng = _spatial_engine(rng)
        x = rng.random(shape, dtype=np.float32)
        y = eng_tta.upscale_batch(x)
        assert y.shape == (shape[0], 2 * shape[1], 2 * shape[2])
        assert len(eng_tta._tta_fwd) == 1          # on-device ensemble
        transforms = dihedral_pairs(square=(shape[1] == shape[2]))
        acc = np.zeros(y.shape, np.float32)
        for t, inv in transforms:
            acc += np.asarray(
                inv(eng.upscale_batch(np.ascontiguousarray(t(x)))))
        np.testing.assert_allclose(y, acc / len(transforms),
                                   rtol=1e-5, atol=1e-6)


def test_normalize_inputs_on_device_matches_host(rng):
    """normalize_inputs=True: the engine ingests RAW uint16/int16/uint8
    batches, normalizes (percentile window + minmax) inside the device
    program, and must match host preprocess_image_array + the plain
    engine exactly — including under bucket padding (the percentiles see
    only real pixels: normalize-then-pad)."""
    eng_raw = _engine(normalize_inputs=True)
    eng = _engine()
    for dtype, hi in ((np.uint16, 4000), (np.int16, 2000), (np.uint8, 255)):
        raw = rng.integers(0, hi, (3, 24, 24)).astype(dtype)
        want = np.stack([preprocess_image_array(s.astype(np.float32))
                         for s in raw])
        got = eng_raw.upscale_batch(raw)
        ref = eng.upscale_batch(want)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # bucketed: normalize still sees the unpadded slice
    eng_raw_b = InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                                bucket=32, normalize_inputs=True)
    eng_b = InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                            bucket=32)
    raw = rng.integers(0, 4000, (2, 20, 20)).astype(np.uint16)
    want = np.stack([preprocess_image_array(s.astype(np.float32))
                     for s in raw])
    np.testing.assert_allclose(eng_raw_b.upscale_batch(raw),
                               eng_b.upscale_batch(want),
                               rtol=1e-5, atol=1e-5)


def test_normalize_inputs_composes_with_tta_and_spatial(rng):
    """The on-device normalize commutes with the dihedral transforms and
    the row-sharded forward: raw-input TTA == normalized-input TTA, raw
    spatial == normalized spatial."""
    eng = _engine()
    raw = rng.integers(0, 4000, (2, 16, 16)).astype(np.uint16)
    want01 = np.stack([preprocess_image_array(s.astype(np.float32))
                       for s in raw])
    tta_raw = InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                              tta=True, normalize_inputs=True)
    tta = InferenceEngine(eng.model_cfg, eng.params, bf16=False, tta=True)
    np.testing.assert_allclose(tta_raw.upscale_batch(raw),
                               tta.upscale_batch(want01),
                               rtol=1e-5, atol=1e-5)
    sp_raw = InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                             num_devices=8, spatial_shards=2,
                             normalize_inputs=True)
    sp = InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                         num_devices=8, spatial_shards=2)
    np.testing.assert_allclose(sp_raw.upscale_batch(raw),
                               sp.upscale_batch(want01),
                               rtol=1e-5, atol=1e-5)


def test_out_dtype_packs_on_device(rng):
    """out_dtype uint8/int16: outputs are the device-packed
    round(y*scale) of the fp32 engine's outputs — across the dense, TTA
    and pipelined paths (uint8 equals the PNG writer's own coding)."""
    eng = _engine()
    x = rng.random((2, 16, 16), dtype=np.float32)
    y32 = eng.upscale_batch(x)
    for dtype, scale in ((np.uint8, 255.0), (np.int16, 32767.0)):
        eng_p = InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                                out_dtype=dtype)
        got = eng_p.upscale_batch(x)
        assert got.dtype == dtype
        want = np.round(np.clip(y32, 0, 1) * scale).astype(dtype)
        # device vs host rounding may differ by 1 code at exact halves
        assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
        piped = list(eng_p.upscale_batches(iter([x, x])))
        np.testing.assert_array_equal(piped[0], got)
    # TTA: pack applies to the ensemble MEAN on both routes
    tta_p = InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                            tta=True, out_dtype=np.uint8)
    tta = InferenceEngine(eng.model_cfg, eng.params, bf16=False, tta=True)
    got = tta_p.upscale_batch(x)
    want = np.round(np.clip(tta.upscale_batch(x), 0, 1) * 255)
    assert got.dtype == np.uint8
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_transpose_io_zero_copy_layout(rng):
    """transpose_io: batches arrive (N, w, h) (a NIfTI F-order buffer's
    free C-view), outputs return (N, 2w, 2h) — both swaps on device —
    and the values equal the standard layout's exactly. Composes with
    spatial sharding; rejected without normalize_inputs and with tta."""
    eng = _engine()
    raw = rng.integers(0, 4000, (3, 24, 16)).astype(np.uint16)  # (n, w, h)
    want01 = np.stack([preprocess_image_array(s.T.astype(np.float32))
                       for s in raw])                           # (n, h, w)
    ref = _engine().upscale_batch(want01)                       # (n, 2h, 2w)
    eng_t = InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                            normalize_inputs=True, transpose_io=True)
    got = eng_t.upscale_batch(raw)                              # (n, 2w, 2h)
    assert got.shape == (3, 48, 32)
    np.testing.assert_allclose(got.swapaxes(1, 2), ref,
                               rtol=1e-5, atol=1e-5)
    # spatial + transpose_io + packed int16
    sp = InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                         num_devices=8, spatial_shards=2,
                         normalize_inputs=True, transpose_io=True,
                         out_dtype=np.int16)
    got_sp = sp.upscale_batch(raw)
    assert got_sp.dtype == np.int16 and got_sp.shape == (3, 48, 32)
    want_sp = np.round(np.clip(ref, 0, 1) * 32767).astype(np.int32)
    assert np.abs(got_sp.swapaxes(1, 2).astype(np.int32)
                  - want_sp).max() <= 1
    with pytest.raises(ValueError, match="transpose_io requires"):
        InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                        transpose_io=True)
    with pytest.raises(ValueError, match="does not compose with tta"):
        InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                        normalize_inputs=True, transpose_io=True, tta=True)


def test_normalize_inputs_rejects_int8_and_tiled(rng):
    eng = _engine()
    with pytest.raises(ValueError, match="normalize_inputs"):
        InferenceEngine(eng.model_cfg, eng.params, bf16=False,
                        quant="int8", normalize_inputs=True)
    eng_raw = _engine(normalize_inputs=True)
    with pytest.raises(ValueError, match="per-TILE"):
        eng_raw.upscale_tiled(rng.random((64, 64)).astype(np.float32),
                              tile=32, halo=8)


def test_tta_spatial_matches_dense_tta(rng):
    """On conforming shapes (no bucket padding) spatial TTA must agree
    with DENSE TTA — the shard_map forward is dense-equivalent and the
    ensemble math is identical."""
    eng_sp = _spatial_engine(rng, tta=True)
    eng_dn = InferenceEngine(eng_sp.model_cfg, eng_sp.params, bf16=False,
                             tta=True)
    x = rng.random((2, 16, 16), dtype=np.float32)
    np.testing.assert_allclose(eng_sp.upscale_batch(x),
                               eng_dn.upscale_batch(x),
                               rtol=1e-5, atol=1e-5)
