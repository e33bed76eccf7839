"""Separable resampling expressed as matrix multiplies (MXU-friendly).

TPU-first design: instead of gather-based interpolation, every resize is two
dense matmuls ``out = W_rows @ img @ W_cols^T`` where the per-axis weight
matrices are built on the host (NumPy, at trace time — shapes are static
under jit) and become XLA constants. This keeps the FLOPs on the MXU and
makes the op trivially batchable/vmappable.

The weight construction reproduces OpenCV's ``cv2.resize`` float path
exactly (coordinate convention ``fx = (dst + 0.5) * scale - 0.5``, clamped
replicate borders, Catmull-Rom cubic with A = -0.75, 8-tap normalized
Lanczos4, true area averaging for downscale and OpenCV's special 2-tap rule
for AREA upscale), so outputs match the reference pipeline's cv2 calls
(reference: utils/preprocessing.py:23-57 letterbox, :368 stretch;
utils/extraction_utils.py:150-157 AREA downsample) to float tolerance.
"""

from __future__ import annotations

import enum
import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp


class Interp(enum.Enum):
    """Interpolation kernels, mirroring cv2's enum semantics
    (reference: utils/preprocessing.py:15-21)."""

    NEAREST = "nearest"
    LINEAR = "linear"
    CUBIC = "cubic"
    AREA = "area"
    LANCZOS = "lanczos4"


_CUBIC_A = -0.75  # OpenCV's fixed Catmull-Rom-like coefficient


def _cubic_weights(fx: np.ndarray) -> np.ndarray:
    """4 cubic tap weights for fractional offsets fx in [0,1). Shape (n, 4)."""
    A = _CUBIC_A
    w0 = ((A * (fx + 1) - 5 * A) * (fx + 1) + 8 * A) * (fx + 1) - 4 * A
    w1 = ((A + 2) * fx - (A + 3)) * fx * fx + 1
    w2 = ((A + 2) * (1 - fx) - (A + 3)) * (1 - fx) * (1 - fx) + 1
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)


def _lanczos4_weights(fx: np.ndarray) -> np.ndarray:
    """8 Lanczos4 tap weights (normalized to sum 1). Shape (n, 8)."""
    # distance from sample point to tap i (taps at sx-3 .. sx+4)
    d = fx[:, None] + 3.0 - np.arange(8)[None, :]

    def sinc(x):
        x = np.where(x == 0, 1e-30, x)
        return np.sin(np.pi * x) / (np.pi * x)

    w = np.where(np.abs(d) < 1e-7, 1.0, sinc(d) * sinc(d / 4.0))
    return w / w.sum(axis=-1, keepdims=True)


def _linear_weights(fx: np.ndarray) -> np.ndarray:
    return np.stack([1.0 - fx, fx], axis=-1)


def _tap_matrix(in_size: int, taps: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Scatter (out, k) tap weights into a dense (out, in) matrix.

    Taps outside [0, in_size) are clamped to the border (cv2
    BORDER_REPLICATE), i.e. their weight accumulates onto the edge pixel.
    """
    out_size, k = taps.shape
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    clamped = np.clip(taps, 0, in_size - 1)
    for j in range(k):
        np.add.at(mat, (np.arange(out_size), clamped[:, j]), weights[:, j])
    return mat


def _area_down_matrix(in_size: int, out_size: int) -> np.ndarray:
    """True area-average weights for downscale (cv2 INTER_AREA, scale >= 1)."""
    scale = in_size / out_size
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        lo = o * scale
        hi = (o + 1) * scale
        j0 = int(np.floor(lo))
        j1 = min(int(np.ceil(hi)), in_size)
        for j in range(j0, j1):
            overlap = min(hi, j + 1) - max(lo, j)
            if overlap > 0:
                mat[o, j] = overlap / scale
    return mat


@functools.lru_cache(maxsize=512)
def resample_matrix(in_size: int, out_size: int, method: str,
                    area_fast_ok: bool = True) -> np.ndarray:
    """Build the (out_size, in_size) float32 resampling matrix for one axis.

    ``method`` is an ``Interp`` value string. Cached — under jit these become
    compile-time constants.
    """
    dst = np.arange(out_size, dtype=np.float64)
    scale = in_size / out_size

    if method == Interp.NEAREST.value:
        sx = np.clip(np.floor(dst * scale).astype(np.int64), 0, in_size - 1)
        mat = np.zeros((out_size, in_size), dtype=np.float64)
        mat[np.arange(out_size), sx] = 1.0
        return mat.astype(np.float32)

    if method == Interp.AREA.value:
        if scale >= 1.0:
            return _area_down_matrix(in_size, out_size).astype(np.float32)
        # cv2 AREA upscale: special coordinate rule + 2-tap linear weights
        inv_scale = 1.0 / scale
        sx = np.floor(dst * scale).astype(np.int64)
        fx = (dst + 1) - (sx + 1) * inv_scale
        fx = np.where(fx <= 0, 0.0, fx - np.floor(fx))
        taps = np.stack([sx, sx + 1], axis=-1)
        return _tap_matrix(in_size, taps, _linear_weights(fx)).astype(np.float32)

    fx_full = (dst + 0.5) * scale - 0.5
    sx = np.floor(fx_full).astype(np.int64)
    fx = fx_full - sx

    if method == Interp.LINEAR.value:
        taps = np.stack([sx, sx + 1], axis=-1)
        w = _linear_weights(fx)
    elif method == Interp.CUBIC.value:
        taps = sx[:, None] + np.arange(-1, 3)[None, :]
        w = _cubic_weights(fx)
    elif method == Interp.LANCZOS.value:
        taps = sx[:, None] + np.arange(-3, 5)[None, :]
        w = _lanczos4_weights(fx)
    else:
        raise ValueError(f"Unknown interpolation method: {method}")

    return _tap_matrix(in_size, taps, w).astype(np.float32)


def resize(image: jnp.ndarray, target_hw: Tuple[int, int],
           method: Interp = Interp.LINEAR) -> jnp.ndarray:
    """Resize the trailing two spatial axes of ``image`` to ``target_hw``.

    ``image`` may be (H, W) or (..., H, W). Runs as two matmuls on the MXU.
    Matches cv2.resize's float32 path (reference cv2 usage at
    utils/preprocessing.py:45,368).
    """
    h, w = image.shape[-2], image.shape[-1]
    th, tw = target_hw
    if (h, w) == (th, tw):
        return image
    wr = jnp.asarray(resample_matrix(h, th, method.value))
    wc = jnp.asarray(resample_matrix(w, tw, method.value))
    dt = image.dtype if image.dtype in (jnp.float32, jnp.float64) else jnp.float32
    x = image.astype(dt)
    # out[..., o, p] = sum_{h,w} Wr[o,h] * x[..., h, w] * Wc[p,w]
    x = jnp.einsum("oh,...hw->...ow", wr.astype(dt), x)
    x = jnp.einsum("pw,...ow->...op", wc.astype(dt), x)
    return x


def upsample_bilinear_align_corners(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """2x (or Nx) bilinear upsample with align_corners=True on NHWC tensors.

    Matches torch ``nn.Upsample(scale_factor=f, mode='bilinear',
    align_corners=True)`` (reference: models/unet_model.py:71,151), expressed
    as two matmuls over the spatial axes.

    A zero-matmul factor-2 shift-and-lerp form (even/odd rows have
    closed-form 2-tap weights) was TRIED and measured 1428 -> 963
    slices/s on v5e: the stack-interleaves and shift concats cost far more
    than the dense matmuls at ~59% MXU utilization. Keep the matmuls.
    """
    b, h, w, c = x.shape
    th, tw = h * factor, w * factor
    wr = jnp.asarray(_align_corners_matrix(h, th), dtype=x.dtype)
    wc = jnp.asarray(_align_corners_matrix(w, tw), dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wr, x)
    x = jnp.einsum("pw,bowc->bopc", wc, x)
    return x




@functools.lru_cache(maxsize=128)
def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    if in_size == 1:
        return np.ones((out_size, 1), dtype=np.float32)
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    f = src - i0
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.arange(out_size), i0), 1.0 - f)
    np.add.at(mat, (np.arange(out_size), i1), f)
    return mat.astype(np.float32)


def letterbox_geometry(in_hw: Tuple[int, int],
                       target_size: Tuple[int, int]) -> Tuple[int, int, int, int]:
    """Static letterbox geometry: (new_h, new_w, y_offset, x_offset).

    ``target_size`` is (width, height) to mirror the reference's convention
    (utils/preprocessing.py:23-57).
    """
    h, w = in_hw
    target_w, target_h = target_size
    scale = min(target_w / w, target_h / h)
    new_w, new_h = int(w * scale), int(h * scale)
    x_off = (target_w - new_w) // 2
    y_off = (target_h - new_h) // 2
    return new_h, new_w, y_off, x_off


def letterbox_resize(image: jnp.ndarray, target_size: Tuple[int, int],
                     method: Interp = Interp.LANCZOS,
                     pad_value: float = 0.0) -> jnp.ndarray:
    """Aspect-preserving resize onto a padded canvas.

    Mirrors reference ``letterbox_resize`` (utils/preprocessing.py:23-57):
    scale = min(tw/w, th/h), centered placement, constant padding.
    ``image``: (..., H, W); ``target_size``: (width, height).
    """
    h, w = image.shape[-2], image.shape[-1]
    target_w, target_h = target_size
    new_h, new_w, y_off, x_off = letterbox_geometry((h, w), target_size)
    resized = resize(image, (new_h, new_w), method)
    pad_cfg = [(0, 0)] * (image.ndim - 2) + [
        (y_off, target_h - new_h - y_off),
        (x_off, target_w - new_w - x_off),
    ]
    return jnp.pad(resized, pad_cfg, constant_values=pad_value)


def center_crop(image: jnp.ndarray, target_size: Tuple[int, int]) -> jnp.ndarray:
    """Center crop to (width, height); pads with zeros if input is smaller.

    Mirrors reference ``center_crop`` (utils/preprocessing.py:59-91).
    """
    h, w = image.shape[-2], image.shape[-1]
    target_w, target_h = target_size
    start_x = max(0, (w - target_w) // 2)
    start_y = max(0, (h - target_h) // 2)
    end_x = min(w, start_x + target_w)
    end_y = min(h, start_y + target_h)
    cropped = image[..., start_y:end_y, start_x:end_x]
    ch, cw = cropped.shape[-2], cropped.shape[-1]
    if ch < target_h or cw < target_w:
        py = (target_h - ch) // 2
        px = (target_w - cw) // 2
        pad_cfg = [(0, 0)] * (image.ndim - 2) + [
            (py, target_h - ch - py),
            (px, target_w - cw - px),
        ]
        return jnp.pad(cropped, pad_cfg, constant_values=0.0)
    return cropped


def pad_to_size(image: jnp.ndarray, target_size: Tuple[int, int],
                pad_value: float = 0.0) -> jnp.ndarray:
    """Pad (no resize) to (width, height), centered; crops if larger.

    Mirrors reference ``pad_to_size`` (utils/preprocessing.py:93-124).
    """
    h, w = image.shape[-2], image.shape[-1]
    target_w, target_h = target_size
    paste_h, paste_w = min(h, target_h), min(w, target_w)
    img = image[..., :paste_h, :paste_w]
    py = (target_h - h) // 2
    px = (target_w - w) // 2
    # Reference places at max(0, center offset); with larger inputs it
    # top-left crops via the slicing above.
    py, px = max(0, py), max(0, px)
    pad_cfg = [(0, 0)] * (image.ndim - 2) + [
        (py, target_h - paste_h - py),
        (px, target_w - paste_w - px),
    ]
    return jnp.pad(img, pad_cfg, constant_values=pad_value)
