"""Image-quality metrics + histogram matching (jnp, plus exact host variants).

Parity targets:
- MSE/RMSE/MAE as in scripts/infer.py:148-171 and scripts/test_comparison.py:164-202.
- PSNR with data_range and the reference's PSNR=100 sentinel when MSE<1e-10
  (scripts/test_comparison.py:191-194).
- Histogram matching equivalent to skimage.exposure.match_histograms
  (scripts/infer.py:278-314) — skimage is not a dependency here, so the
  quantile-mapping algorithm is implemented from scratch: exact unique-value
  version on host NumPy, and a sort-based jittable version for batched
  on-device use.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def rmse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(mse(a, b))


def mae(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0,
         sentinel: float = 100.0) -> jnp.ndarray:
    """PSNR in dB; returns ``sentinel`` when MSE < 1e-10 (reference
    convention at scripts/test_comparison.py:191-194)."""
    err = mse(a, b)
    value = 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(err, 1e-30))
    return jnp.where(err < 1e-10, sentinel, value)


def match_histograms_np(image: np.ndarray, reference: np.ndarray) -> np.ndarray:
    """Exact quantile-mapping histogram match (host, unique-value based).

    Same algorithm as skimage.exposure.match_histograms for single-channel
    input: map each source value's empirical quantile to the reference's
    inverse CDF (linear interpolation between unique reference values).
    """
    src = np.asarray(image)
    ref = np.asarray(reference)
    _, src_unique_indices, src_counts = np.unique(
        src.ravel(), return_inverse=True, return_counts=True)
    src_quantiles = np.cumsum(src_counts) / src.size
    ref_values, ref_counts = np.unique(ref.ravel(), return_counts=True)
    ref_quantiles = np.cumsum(ref_counts) / ref.size
    interp_values = np.interp(src_quantiles, ref_quantiles, ref_values)
    return interp_values[src_unique_indices].reshape(src.shape).astype(src.dtype)


def match_histograms(image: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """Jittable sort-based histogram match for a single 2D image.

    Ranks source pixels, maps rank quantiles onto the sorted reference via
    linear interpolation. Agrees with the unique-value algorithm up to ties
    (identical when source values are distinct, which holds for continuous
    model outputs).
    """
    src = image.astype(jnp.float32)
    ref = reference.astype(jnp.float32)
    n = src.size
    m = ref.size
    flat = src.reshape(-1)
    order = jnp.argsort(flat)
    ranks = jnp.zeros((n,), jnp.float32).at[order].set(
        jnp.arange(1, n + 1, dtype=jnp.float32))
    src_quantiles = ranks / n
    ref_sorted = jnp.sort(ref.reshape(-1))
    ref_quantiles = jnp.arange(1, m + 1, dtype=jnp.float32) / m
    matched = jnp.interp(src_quantiles, ref_quantiles, ref_sorted)
    return matched.reshape(src.shape)


def metric_suite(output: jnp.ndarray, target: jnp.ndarray,
                 data_range: float = 1.0) -> dict:
    """SSIM/PSNR/MSE/RMSE/MAE bundle used by the eval CLIs
    (scripts/test_comparison.py:164-202)."""
    from mri_superresolution_tpu.ops.ssim import ssim

    if output.ndim == 2:
        output = output[None, :, :, None]
    if target.ndim == 2:
        target = target[None, :, :, None]
    m = mse(output, target)
    return {
        "ssim": float(ssim(output, target)),
        "psnr": float(psnr(output, target, data_range)),
        "mse": float(m),
        "rmse": float(jnp.sqrt(m)),
        "mae": float(mae(output, target)),
    }
