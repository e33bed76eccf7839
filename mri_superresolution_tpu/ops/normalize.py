"""Intensity normalization kernels (jittable, batch-friendly).

Reproduce the reference's NumPy/cv2 intensity pipeline
(utils/preprocessing.py:126-223) as pure jnp functions that vmap over a
leading slice/batch axis.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _percentiles(x: jnp.ndarray, lower: float, upper: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Percentiles over all elements of ``x`` with NumPy's default 'linear'
    interpolation (parity with np.percentile at utils/preprocessing.py:148-149)."""
    flat = x.reshape(-1).astype(jnp.float32)
    lo = jnp.percentile(flat, lower)
    hi = jnp.percentile(flat, upper)
    return lo, hi


def robust_normalize(x: jnp.ndarray,
                     lower_percentile: float = 0.5,
                     upper_percentile: float = 99.5,
                     target_range: Tuple[float, float] = (0.0, 1.0)) -> jnp.ndarray:
    """Percentile-clip then rescale to ``target_range``.

    Mirrors reference ``robust_normalize`` (utils/preprocessing.py:126-163)
    including its constant-image → zeros behavior.
    """
    x = x.astype(jnp.float32)
    lo, hi = _percentiles(x, lower_percentile, upper_percentile)
    clipped = jnp.clip(x, lo, hi)
    denom = hi - lo
    normalized = jnp.where(denom > 0, (clipped - lo) / jnp.where(denom == 0, 1.0, denom), 0.0)
    mn, mx = target_range
    return normalized * (mx - mn) + mn


def percentile_window(x: jnp.ndarray,
                      min_percentile: float = 0.5,
                      max_percentile: float = 99.5) -> jnp.ndarray:
    """Auto-windowing: clip to [p_min, p_max] without rescaling.

    Mirrors the auto branch of ``preprocess_slice``
    (utils/preprocessing.py:335-338).
    """
    x = x.astype(jnp.float32)
    lo, hi = _percentiles(x, min_percentile, max_percentile)
    return jnp.clip(x, lo, hi)


def minmax_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Scale to [0, 1] by min/max; constant images pass through unchanged
    (parity with utils/preprocessing.py:341-343)."""
    x = x.astype(jnp.float32)
    mn = jnp.min(x)
    mx = jnp.max(x)
    denom = mx - mn
    return jnp.where(denom > 0, (x - mn) / jnp.where(denom == 0, 1.0, denom), x)


def apply_windowing(x: jnp.ndarray, window_center: float, window_width: float,
                    output_range: Tuple[float, float] = (0.0, 1.0)) -> jnp.ndarray:
    """Manual intensity windowing (reference utils/preprocessing.py:193-223)."""
    mn, mx = output_range
    w_min = window_center - window_width / 2.0
    w_max = window_center + window_width / 2.0
    windowed = jnp.clip(x.astype(jnp.float32), w_min, w_max)
    if w_max > w_min:
        windowed = (windowed - w_min) / (w_max - w_min)
        windowed = windowed * (mx - mn) + mn
    return windowed


def clahe(image: jnp.ndarray, clip_limit: float = 2.0,
          tile_grid_size: Tuple[int, int] = (8, 8)) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization on a [0,1] image.

    Reimplements cv2.createCLAHE(...).apply semantics (the reference's
    adaptive branch at utils/preprocessing.py:185-188): uint8 quantization,
    per-tile 256-bin histograms (reflect-101 padding to a divisible grid),
    clip + exact cv2 residual redistribution, per-tile LUTs, and bilinear
    interpolation between the four neighboring tile LUTs. Returns float
    in [0,1].
    """
    # truncating uint8 quantization — exactly the reference's conversion
    # before cv2 (utils/preprocessing.py:182-183 astype(np.uint8))
    x8 = jnp.clip(image.astype(jnp.float32) * 255.0, 0, 255).astype(jnp.int32)
    h, w = x8.shape
    gh, gw = tile_grid_size[1], tile_grid_size[0]  # cv2: (width, height)
    th = -(-h // gh)
    tw = -(-w // gw)
    ph, pw = th * gh - h, tw * gw - w
    padded = jnp.pad(x8, ((0, ph), (0, pw)), mode="reflect")

    tiles = padded.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(gh * gw, th * tw)
    n_tiles = gh * gw
    tile_area = th * tw

    # per-tile histograms via scatter-add
    flat_idx = (jnp.arange(n_tiles)[:, None] * 256 + tiles).reshape(-1)
    hist = jnp.zeros((n_tiles * 256,), jnp.int32).at[flat_idx].add(1)
    hist = hist.reshape(n_tiles, 256)

    # clip + cv2-exact residual redistribution
    clip = max(int(clip_limit * tile_area / 256), 1)
    clipped_amt = jnp.sum(jnp.maximum(hist - clip, 0), axis=1)  # (T,)
    hist = jnp.minimum(hist, clip)
    redist = clipped_amt // 256
    residual = clipped_amt - redist * 256
    hist = hist + redist[:, None]
    # cv2: step = max(256 // residual, 1); +1 at bins i = k*step, k<residual
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
    bins = jnp.arange(256)[None, :]
    add1 = ((bins % step[:, None] == 0) &
            (bins // step[:, None] < residual[:, None]) &
            (residual[:, None] > 0))
    hist = hist + add1.astype(jnp.int32)

    scale = 255.0 / tile_area
    lut = jnp.round(jnp.cumsum(hist, axis=1) * scale)
    lut = jnp.clip(lut, 0, 255).astype(jnp.float32)  # (T, 256)

    # bilinear interpolation between the 4 neighboring tile LUTs
    yy = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)
    tyf = yy / th - 0.5
    txf = xx / tw - 0.5
    ty1 = jnp.floor(tyf).astype(jnp.int32)
    tx1 = jnp.floor(txf).astype(jnp.int32)
    ya = (tyf - ty1)[:, None]
    xa = (txf - tx1)[None, :]
    ty1c = jnp.clip(ty1, 0, gh - 1)[:, None]
    ty2c = jnp.clip(ty1 + 1, 0, gh - 1)[:, None]
    tx1c = jnp.clip(tx1, 0, gw - 1)[None, :]
    tx2c = jnp.clip(tx1 + 1, 0, gw - 1)[None, :]

    lut_flat = lut.reshape(-1)

    def look(ty, tx):
        tile_id = ty * gw + tx
        return lut_flat[(tile_id * 256 + x8).reshape(-1)].reshape(h, w)

    out = (look(ty1c, tx1c) * (1 - xa) * (1 - ya) +
           look(ty1c, tx2c) * xa * (1 - ya) +
           look(ty2c, tx1c) * (1 - xa) * ya +
           look(ty2c, tx2c) * xa * ya)
    return jnp.clip(jnp.round(out), 0, 255) / 255.0


def histogram_equalization(image: jnp.ndarray, n_bins: int = 256) -> jnp.ndarray:
    """Global histogram equalization on a [0,1] float image.

    Parity with cv2.equalizeHist on the uint8 quantization the reference
    applies first (utils/preprocessing.py:181-191): quantize to 256 bins,
    equalize via the cv2 LUT rule, return float in [0,1].
    """
    x = jnp.clip(image.astype(jnp.float32) * 255.0, 0.0, 255.0).astype(jnp.uint8)
    flat = x.reshape(-1)
    hist = jnp.zeros((n_bins,), jnp.int32).at[flat].add(1)
    cdf = jnp.cumsum(hist)
    total = flat.shape[0]
    # cv2 rule: scale = 255 / (total - cdf_min_nonzero_bin_count); lut built
    # from cumulative counts excluding the first occupied bin.
    nonzero = hist > 0
    first_idx = jnp.argmax(nonzero)
    cdf_min = cdf[first_idx]
    denom = jnp.maximum(total - cdf_min, 1)
    lut = jnp.round((cdf - cdf_min).astype(jnp.float32) * 255.0 / denom.astype(jnp.float32))
    lut = jnp.clip(lut, 0, 255).astype(jnp.uint8)
    eq = lut[flat].reshape(image.shape)
    return eq.astype(jnp.float32) / 255.0
