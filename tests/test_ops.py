"""Golden tests for normalization, k-space simulator, SSIM, metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.ops.normalize import (
    robust_normalize, minmax_normalize, percentile_window, apply_windowing,
    histogram_equalization,
)
from mri_superresolution_tpu.ops.kspace import simulate_low_field_mri
from mri_superresolution_tpu.ops.ssim import ssim, gaussian_window
from mri_superresolution_tpu.ops.metrics import (
    psnr, mse, rmse, mae, match_histograms, match_histograms_np,
)


# ---------------------------------------------------------------- normalize

def _robust_normalize_np(x, lo_p=0.5, hi_p=99.5, rng=(0, 1)):
    """Reference formula (utils/preprocessing.py:126-163), re-derived in numpy."""
    if x.size == 0 or np.all(x == x.flat[0]):
        return np.zeros_like(x, dtype=np.float32)
    lo = np.percentile(x, lo_p)
    hi = np.percentile(x, hi_p)
    if hi == lo:
        return np.zeros_like(x, dtype=np.float32)
    n = (np.clip(x, lo, hi) - lo) / (hi - lo)
    return (n * (rng[1] - rng[0]) + rng[0]).astype(np.float32)


def test_robust_normalize_matches_numpy(rng):
    x = (rng.random((64, 48), dtype=np.float32) * 1000 - 200).astype(np.float32)
    got = np.asarray(robust_normalize(jnp.asarray(x)))
    want = _robust_normalize_np(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_robust_normalize_constant_image():
    x = np.full((16, 16), 7.0, np.float32)
    got = np.asarray(robust_normalize(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.zeros_like(x))


def test_percentile_window_and_minmax(rng):
    x = rng.normal(100, 30, (50, 50)).astype(np.float32)
    got = np.asarray(percentile_window(jnp.asarray(x)))
    lo, hi = np.percentile(x, 0.5), np.percentile(x, 99.5)
    np.testing.assert_allclose(got, np.clip(x, lo, hi), rtol=1e-5, atol=1e-4)
    m = np.asarray(minmax_normalize(jnp.asarray(got)))
    assert abs(m.min()) < 1e-6 and abs(m.max() - 1) < 1e-6


def test_apply_windowing():
    x = np.linspace(-100, 300, 64 * 64, dtype=np.float32).reshape(64, 64)
    got = np.asarray(apply_windowing(jnp.asarray(x), 100.0, 200.0))
    w = np.clip(x, 0.0, 200.0) / 200.0
    np.testing.assert_allclose(got, w, rtol=1e-6, atol=1e-6)


def test_histogram_equalization_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((64, 64), dtype=np.float32)
    got = np.asarray(histogram_equalization(jnp.asarray(img)))
    u8 = np.clip(img * 255, 0, 255).astype(np.uint8)
    want = cv2.equalizeHist(u8).astype(np.float32) / 255.0
    np.testing.assert_allclose(got, want, atol=1 / 255.0 + 1e-6)


# ------------------------------------------------------------------ k-space

def _simulate_np(data, crop, noise_std, noise_real, noise_imag):
    """Reference math (utils/preprocessing.py:225-293) in numpy with
    injected noise so we can compare deterministically."""
    orig_min, orig_max = data.min(), data.max()
    k = np.fft.fftshift(np.fft.fft2(data))
    rows, cols = k.shape
    cr, cc = rows // 2, cols // 2
    csr, csc = int(rows * crop), int(cols * crop)
    mask = np.zeros((rows, cols), np.complex128)
    mask[cr - csr // 2:cr + csr // 2, cc - csc // 2:cc + csc // 2] = 1
    lk = k * mask
    nk = lk + noise_real + 1j * noise_imag
    img = np.fft.ifft2(np.fft.ifftshift(nk))
    mag = np.abs(img)
    sim = (mag - mag.min()) / (mag.max() - mag.min())
    return sim * (orig_max - orig_min) + orig_min


def test_kspace_sim_matches_reference_math_zero_noise(rng):
    x = rng.random((48, 40), dtype=np.float32)
    got = np.asarray(simulate_low_field_mri(
        jnp.asarray(x), jax.random.key(0), kspace_crop_factor=0.5, noise_std=0.0))
    want = _simulate_np(x.astype(np.float64), 0.5,
                        0.0, np.zeros_like(x), np.zeros_like(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kspace_sim_noise_statistics():
    """Rician magnitude noise: with full k-space kept and noise injected, the
    output must differ from the input and keep the original range per slice."""
    x = np.tile(np.linspace(0, 1, 64, dtype=np.float32), (64, 1))
    batch = jnp.stack([jnp.asarray(x)] * 4)
    out = np.asarray(simulate_low_field_mri(
        batch, jax.random.key(1), kspace_crop_factor=1.0, noise_std=10.0))
    assert out.shape == (4, 64, 64)
    for i in range(4):
        assert abs(out[i].min() - x.min()) < 1e-5
        assert abs(out[i].max() - x.max()) < 1e-5
        assert np.abs(out[i] - x).mean() > 1e-4  # noise actually present
    # different slices got different noise
    assert np.abs(out[0] - out[1]).mean() > 1e-5


def test_kspace_crop_removes_high_frequencies():
    x = np.zeros((64, 64), np.float32)
    x[::2] = 1.0  # highest vertical frequency
    out = np.asarray(simulate_low_field_mri(
        jnp.asarray(x), jax.random.key(0), kspace_crop_factor=0.25, noise_std=0.0))
    # cropping kills the Nyquist stripe pattern → much smoother
    assert np.abs(np.diff(out, axis=0)).mean() < 0.5 * np.abs(np.diff(x, axis=0)).mean()


# --------------------------------------------------------------------- SSIM

def _ssim_torch(a, b, window_size=11, sigma=1.5, val_range=1.0):
    """Golden SSIM via torch F.conv2d, following the published formula
    (utils/losses.py:27-81) independently."""
    import torch
    import torch.nn.functional as F
    coords = torch.arange(window_size, dtype=torch.float32) - window_size // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).unsqueeze(1)
    win = (g @ g.t()).expand(1, 1, window_size, window_size).contiguous()
    t1 = torch.from_numpy(a)
    t2 = torch.from_numpy(b)
    pad = window_size // 2
    mu1 = F.conv2d(t1, win, padding=pad, groups=1)
    mu2 = F.conv2d(t2, win, padding=pad, groups=1)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(t1 * t1, win, padding=pad, groups=1) - mu1_sq
    s2 = F.conv2d(t2 * t2, win, padding=pad, groups=1) - mu2_sq
    s12 = F.conv2d(t1 * t2, win, padding=pad, groups=1) - mu1_mu2
    c1, c2 = (0.01 * val_range) ** 2, (0.03 * val_range) ** 2
    smap = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return smap.mean().item()


def test_ssim_matches_torch_golden(rng):
    pytest.importorskip("torch")
    a = rng.random((2, 1, 32, 32), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    want = _ssim_torch(a, b)
    got = float(ssim(jnp.asarray(a.transpose(0, 2, 3, 1)),
                     jnp.asarray(b.transpose(0, 2, 3, 1))))
    assert abs(got - want) < 1e-5


def test_ssim_identical_images_is_one(rng):
    a = rng.random((1, 24, 24, 1), dtype=np.float32)
    assert abs(float(ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-6


def test_ssim_gradient_flows(rng):
    a = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    g = jax.grad(lambda x: 1.0 - ssim(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_gaussian_window_properties():
    w = np.asarray(gaussian_window(11, 1.5))
    assert w.shape == (11, 11)
    assert abs(w.sum() - 1.0) < 1e-6
    assert w[5, 5] == w.max()


# ------------------------------------------------------------------ metrics

def test_psnr_sentinel_and_value(rng):
    a = rng.random((32, 32), dtype=np.float32)
    assert float(psnr(jnp.asarray(a), jnp.asarray(a))) == 100.0
    b = np.clip(a + 0.1, 0, 1).astype(np.float32)
    m = np.mean((a - b) ** 2)
    want = 10 * np.log10(1.0 / m)
    assert abs(float(psnr(jnp.asarray(a), jnp.asarray(b))) - want) < 1e-4


def test_basic_metrics(rng):
    a = rng.random((16, 16), dtype=np.float32)
    b = rng.random((16, 16), dtype=np.float32)
    assert abs(float(mse(jnp.asarray(a), jnp.asarray(b))) - np.mean((a - b) ** 2)) < 1e-6
    assert abs(float(rmse(jnp.asarray(a), jnp.asarray(b))) - np.sqrt(np.mean((a - b) ** 2))) < 1e-6
    assert abs(float(mae(jnp.asarray(a), jnp.asarray(b))) - np.mean(np.abs(a - b))) < 1e-6


def test_match_histograms_device_vs_host(rng):
    src = rng.random((40, 40)).astype(np.float32)
    ref = (rng.random((40, 40)) ** 2).astype(np.float32)
    host = match_histograms_np(src, ref)
    dev = np.asarray(match_histograms(jnp.asarray(src), jnp.asarray(ref)))
    # distinct-valued continuous inputs → algorithms agree
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)
    # matched output's histogram ≈ reference histogram
    np.testing.assert_allclose(
        np.quantile(dev, [0.1, 0.5, 0.9]),
        np.quantile(ref, [0.1, 0.5, 0.9]), atol=0.02)


# ------------------------------------------------------------ CLAHE/pipeline

def test_clahe_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    from mri_superresolution_tpu.ops.normalize import clahe
    img8 = (rng.random((64, 64)) * 255).astype(np.uint8)
    want = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img8)
    got = np.asarray(clahe(jnp.asarray(img8.astype(np.float32) / 255.0)))
    got8 = np.clip(np.round(got * 255), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got8, want)
    # non-divisible size: <=1 quantization step off
    img8b = (rng.random((100, 90)) * 255).astype(np.uint8)
    want_b = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img8b)
    got_b = np.asarray(clahe(jnp.asarray(img8b.astype(np.float32) / 255.0)))
    got8_b = np.clip(np.round(got_b * 255), 0, 255).astype(np.uint8)
    assert np.abs(got8_b.astype(int) - want_b.astype(int)).max() <= 1


def test_preprocess_slice_orchestrator(rng):
    from mri_superresolution_tpu.ops.pipeline import (ResizeMethod,
                                                      preprocess_slice)
    from mri_superresolution_tpu.ops.resize import Interp
    x = jnp.asarray(rng.normal(200, 80, (60, 50)).astype(np.float32))
    # default auto-window + letterbox
    out = preprocess_slice(x, target_size=(64, 64),
                           interpolation=Interp.LANCZOS)
    assert out.shape == (64, 64)
    # LANCZOS ringing may overshoot slightly; the reference likewise defers
    # clipping to the uint8 save (utils/extraction_utils.py:131)
    assert float(out.min()) >= -0.15 and float(out.max()) <= 1.15
    # manual windowing + stretch
    out2 = preprocess_slice(x, target_size=(32, 48), window_center=200.0,
                            window_width=100.0,
                            resize_method=ResizeMethod.STRETCH)
    assert out2.shape == (48, 32)
    # simulation branch (deterministic by key)
    out3a = preprocess_slice(x, apply_simulation=True,
                             rng_key=jax.random.key(3))
    out3b = preprocess_slice(x, apply_simulation=True,
                             rng_key=jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(out3a), np.asarray(out3b))
    # equalize branch runs
    out4 = preprocess_slice(x, equalize=True)
    assert out4.shape == x.shape


def test_pack_unit_round_trip_and_slope():
    """ops/functional packing helpers: single source for engine/artifact/
    daemon packing + scl_slope (review r5 dedup). Device and host twins
    agree bit-for-bit; slope decodes codes back into [0,1]."""
    import numpy as np
    import jax.numpy as jnp
    from mri_superresolution_tpu.ops.functional import (pack_unit,
                                                        pack_unit_np,
                                                        unit_slope)

    y = np.linspace(-0.2, 1.2, 97, dtype=np.float32).reshape(1, 97)
    for dt in ("uint8", "int16"):
        dev = np.asarray(pack_unit(jnp.asarray(y), dt))
        host = pack_unit_np(y, dt)
        np.testing.assert_array_equal(dev, host)
        assert dev.dtype == np.dtype(dt)
        decoded = dev.astype(np.float64) * unit_slope(dt)
        np.testing.assert_allclose(decoded, np.clip(y, 0, 1),
                                   atol=unit_slope(dt) * 0.5 + 1e-12)
    # float32 is the identity (and slope 1.0)
    assert pack_unit_np(y, "float32") is y
    assert unit_slope("float32") == 1.0
