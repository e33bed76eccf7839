"""Shared functional building blocks used by every hand-rolled forward.

One definition each for the ops that the flax models (models/unet.py), the
spatially-sharded forward (parallel/spatial.py) and the int8 serving
forward (models/quant_forward.py) all need, so numerics fixes land in one
place and the bit-identical-to-``model.apply`` invariants the tests pin
cannot silently diverge between paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

GN_EPS = 1e-5


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC pixel shuffle with torch nn.PixelShuffle channel ordering
    (input channel ``c*r*r + i*r + j`` → output channel ``c`` at offset
    ``(i, j)``), so reference checkpoints convert losslessly."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)        # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool (torch nn.MaxPool2d(2) semantics)."""
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def group_norm_ref(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   n_groups: int = 8) -> jnp.ndarray:
    """``flax.linen.GroupNorm`` numerics (fp32 statistics, E[x^2]-E[x]^2
    variance, fp32 affine, cast back to x.dtype) as a plain function.
    parallel/spatial.py uses the same formula with its local sums combined
    by ``lax.psum``; tests/test_spatial.py pins both against flax."""
    b, h, w, c = x.shape
    cg = c // n_groups
    xf = x.astype(jnp.float32).reshape(b, h, w, n_groups, cg)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2, 4), keepdims=True) \
        - jnp.square(mean)
    y = (xf - mean) * lax.rsqrt(var + GN_EPS)
    y = y.reshape(b, h, w, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm_leaky_ref(x, p, n_groups: int = 8, negative_slope: float = 0.2):
    """group_norm_ref followed by LeakyReLU, taking a {scale, bias} subtree."""
    return jax.nn.leaky_relu(
        group_norm_ref(x, p["scale"], p["bias"], n_groups), negative_slope)


# ---------------------------------------------------------- output packing

# [0,1] output -> integer-coded packing, and the NIfTI scl_slope that
# decodes it back. SINGLE SOURCE for the engine's device/host packing,
# the AOT artifact's baked pack program, and the daemon/CLI slope maps —
# a drift between any two of these would silently decode volumes at the
# wrong intensity scale.
PACK_SCALES = {"uint8": 255.0, "int16": 32767.0}


def pack_scale(dtype) -> float:
    """Packing scale for a [0,1]-coded output dtype (1.0 = no packing)."""
    import numpy as np
    return PACK_SCALES.get(np.dtype(dtype).name, 1.0)


def unit_slope(dtype) -> float:
    """The scl_slope that decodes a packed volume back to [0,1]."""
    return 1.0 / pack_scale(dtype)


def pack_unit(y: jnp.ndarray, dtype) -> jnp.ndarray:
    """Device-side packing: round(clip(y, 0, 1) * scale) as ``dtype``;
    identity for float32."""
    import numpy as np
    dt = np.dtype(dtype)
    if dt.name not in PACK_SCALES:
        return y
    return jnp.round(jnp.clip(y, 0.0, 1.0)
                     * PACK_SCALES[dt.name]).astype(dt.name)


def pack_unit_np(y, dtype):
    """Host twin of :func:`pack_unit` (numpy)."""
    import numpy as np
    dt = np.dtype(dtype)
    if dt.name not in PACK_SCALES:
        return y
    return np.round(np.clip(y, 0.0, 1.0) * PACK_SCALES[dt.name]).astype(dt)
