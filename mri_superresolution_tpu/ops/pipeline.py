"""The single-slice preprocessing orchestrator.

Mirrors the reference ``preprocess_slice`` (utils/preprocessing.py:295-374)
option-for-option: manual or percentile auto-windowing, min-max
normalization, optional k-space low-field simulation, optional (adaptive)
histogram equalization, and letterbox/crop/stretch/pad resizing. All device
ops; the function is jittable for fixed option combinations.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.ops.kspace import simulate_low_field_mri
from mri_superresolution_tpu.ops.normalize import (apply_windowing, clahe,
                                                   minmax_normalize,
                                                   percentile_window)
from mri_superresolution_tpu.ops.resize import (Interp, center_crop,
                                                letterbox_resize, pad_to_size,
                                                resize)


class ResizeMethod(enum.Enum):
    """Reference utils/preprocessing.py:8-13."""
    LETTERBOX = "letterbox"
    CROP = "crop"
    STRETCH = "stretch"
    PAD = "pad"


def preprocess_slice(slice_data: jnp.ndarray,
                     target_size: Optional[Tuple[int, int]] = None,
                     interpolation: Interp = Interp.CUBIC,
                     equalize: bool = False,
                     window_center: Optional[float] = None,
                     window_width: Optional[float] = None,
                     min_percentile: float = 0.5,
                     max_percentile: float = 99.5,
                     resize_method: ResizeMethod = ResizeMethod.LETTERBOX,
                     apply_simulation: bool = False,
                     noise_std: float = 5.0,
                     pad_value: float = 0.0,
                     kspace_crop_factor: float = 0.5,
                     rng_key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Process one 2D slice → float32 in [0, 1] (reference parity)."""
    x = slice_data.astype(jnp.float32)

    # windowing: manual or percentile auto (utils/preprocessing.py:331-338)
    if window_center is not None and window_width is not None:
        x = apply_windowing(x, window_center, window_width)
    else:
        x = percentile_window(x, min_percentile, max_percentile)

    x = minmax_normalize(x)

    if apply_simulation:
        if rng_key is None:
            rng_key = jax.random.key(0)
        x = simulate_low_field_mri(x, rng_key, kspace_crop_factor, noise_std)
        x = jnp.clip(x, 0.0, 1.0)

    if equalize:  # reference always uses the adaptive (CLAHE) variant here
        x = clahe(x)

    if target_size:
        if resize_method == ResizeMethod.LETTERBOX:
            x = letterbox_resize(x, target_size, interpolation, pad_value)
        elif resize_method == ResizeMethod.CROP:
            x = center_crop(x, target_size)
        elif resize_method == ResizeMethod.PAD:
            x = pad_to_size(x, target_size, pad_value)
        elif resize_method == ResizeMethod.STRETCH:
            tw, th = target_size
            x = resize(x, (th, tw), interpolation)
        else:  # letterbox fallback on the max dim (utils/preprocessing.py:370-372)
            md = max(target_size)
            x = letterbox_resize(x, (md, md), interpolation, pad_value)
    return x
