"""Classical interpolation baselines for comparison against the model.

Parity with the reference comparator (scripts/test_comparison.py:92-134):
- ``bilinear``: cv2 INTER_LINEAR 2x upscale,
- ``sharp_bilinear``: bilinear then a 3x3 sharpen kernel
  [[-1,-1,-1],[-1,9,-1],[-1,-1,-1]] (cv2.filter2D semantics: reflect-101
  border), clipped to range,
- ``bicubic``: cv2 INTER_CUBIC.

All jittable jnp on float [0,1] images (the reference runs cv2's uint8
fixed-point path; agreement is within 1/255 quantization).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mri_superresolution_tpu.ops.resize import Interp, resize

INTERP_METHODS = ("bilinear", "sharp_bilinear", "bicubic")

# host constant: a module-level jnp.asarray would initialize the JAX
# backend at IMPORT time — before any CLI --cpu flag applies — which hangs
# host-only analytics (scripts/visualise_res.py) whenever the TPU tunnel
# is unreachable
_SHARPEN = np.asarray([[-1.0, -1.0, -1.0],
                       [-1.0, 9.0, -1.0],
                       [-1.0, -1.0, -1.0]], np.float32)


def sharpen3x3(img: jnp.ndarray) -> jnp.ndarray:
    """cv2.filter2D(img, -1, sharpen_kernel) equivalent on (..., H, W):
    reflect-101 border, 3x3 kernel."""
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    x4 = x.reshape((-1, h, w))[..., None]  # NHWC, C=1
    x4 = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    kern = jnp.asarray(_SHARPEN).reshape(3, 3, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x4.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x4, kern, (1, 1), "VALID",
                                     dimension_numbers=dn)
    y = y[..., 0].reshape(lead + (h, w))
    return y[0] if squeeze else y


def upscale_with_interpolation(img01: jnp.ndarray, method: str,
                               scale_factor: int = 2) -> jnp.ndarray:
    """Upscale (..., H, W) float [0,1] images by ``scale_factor``."""
    h, w = img01.shape[-2], img01.shape[-1]
    target: Tuple[int, int] = (h * scale_factor, w * scale_factor)
    if method == "bilinear":
        return resize(img01, target, Interp.LINEAR)
    if method == "sharp_bilinear":
        up = resize(img01, target, Interp.LINEAR)
        return jnp.clip(sharpen3x3(up), 0.0, 1.0)
    if method == "bicubic":
        return resize(img01, target, Interp.CUBIC)
    raise ValueError(f"Unknown interpolation method: {method}")
