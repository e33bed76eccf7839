"""SSIM with exact reference parity (window 11, sigma 1.5, val_range 1.0).

Reference math: utils/losses.py:10-81 — a 2D Gaussian window applied as a
zero-padded depthwise convolution to img1, img2, img1², img2², img1·img2;
then the standard SSIM map with C1=(0.01·L)², C2=(0.03·L)².

TPU-first design:
- the five blurs share one pass: the five maps are stacked on the channel
  axis and blurred with a single separable depthwise convolution (two 1-D
  passes, exactly equal to the 2-D window since the window is an outer
  product of the 1-D Gaussian with itself),
- everything is fp32 regardless of input dtype (parity with the reference's
  fp32 metric math at utils/losses.py:41-50),
- NHWC layout, fully jittable and differentiable.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=16)
def _gaussian_window_np(window_size: int, sigma: float) -> np.ndarray:
    """1D Gaussian window, normalized to sum 1 (utils/losses.py:10-18)."""
    coords = np.arange(window_size, dtype=np.float32) - window_size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """2D Gaussian window (outer product of the 1-D window)."""
    g = _gaussian_window_np(window_size, sigma)
    return jnp.asarray(np.outer(g, g))


def _separable_blur(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Zero-padded depthwise Gaussian blur of an NHWC tensor.

    Equivalent to F.conv2d(x, window, padding=window_size//2, groups=C)
    (utils/losses.py:55-64) because outer(g, g) separates exactly.
    """
    c = x.shape[-1]
    g = _gaussian_window_np(window_size, sigma)
    kh = jnp.asarray(g.reshape(window_size, 1, 1, 1))  # HWIO, depthwise
    kw = jnp.asarray(g.reshape(1, window_size, 1, 1))
    kh = jnp.tile(kh, (1, 1, 1, c))
    kw = jnp.tile(kw, (1, 1, 1, c))
    pad = window_size // 2
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    # HIGHEST precision: the TPU default lowers f32 convs to bf16 MXU
    # multiplies (~1e-3 error), which breaks the 0.1 dB metric-parity budget;
    # the window convs are tiny, so exact fp32 costs nothing measurable.
    x = lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)],
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)],
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    return x


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray,
             window_size: int = 11, sigma: float = 1.5,
             val_range: float = 1.0, blur_fn=None) -> jnp.ndarray:
    """Per-pixel SSIM map for NHWC images (fp32).

    ``blur_fn`` overrides the depthwise Gaussian blur (default: the local
    ``_separable_blur``); the spatially-sharded loss passes its halo'd
    variant so this stays the single copy of the SSIM formula."""
    x1 = img1.astype(jnp.float32)
    x2 = img2.astype(jnp.float32)
    c = x1.shape[-1]

    stacked = jnp.concatenate([x1, x2, x1 * x1, x2 * x2, x1 * x2], axis=-1)
    if blur_fn is None:
        blurred = _separable_blur(stacked, window_size, sigma)
    else:
        blurred = blur_fn(stacked)
    mu1 = blurred[..., 0 * c:1 * c]
    mu2 = blurred[..., 1 * c:2 * c]
    e11 = blurred[..., 2 * c:3 * c]
    e22 = blurred[..., 3 * c:4 * c]
    e12 = blurred[..., 4 * c:5 * c]

    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = e11 - mu1_sq
    sigma2_sq = e22 - mu2_sq
    sigma12 = e12 - mu1_mu2

    c1 = (0.01 * val_range) ** 2
    c2 = (0.03 * val_range) ** 2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11, sigma: float = 1.5, val_range: float = 1.0,
         size_average: bool = True,
         sample_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SSIM index between NHWC image batches (parity: utils/losses.py:27-81).

    Args:
        size_average: True → scalar mean over everything; False → per-sample
            mean over (H, W, C), like the reference's ``mean(1).mean(1).mean(1)``.
        sample_weights: optional (B,) weights for masked/padded batches — the
            weighted mean over valid samples (our extension; the reference is
            unweighted).
    """
    smap = ssim_map(img1, img2, window_size, sigma, val_range)
    per_sample = jnp.mean(smap, axis=(1, 2, 3))
    if not size_average:
        return per_sample
    if sample_weights is not None:
        w = sample_weights.astype(jnp.float32)
        return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.mean(per_sample)


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim_jit(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
             sigma: float = 1.5, val_range: float = 1.0) -> jnp.ndarray:
    return ssim(img1, img2, window_size, sigma, val_range)
