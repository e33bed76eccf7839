"""On-device paired augmentation (jax.random, fully jittable).

The reference augments on host with PIL per-sample (utils/dataset.py:138-175):
hflip p=.5; rotation p=.5 in ±5° with per-image mean fill (nearest resample);
brightness ×U(.9,1.1) p=.3; contrast ×U(.9,1.1) p=.3; Gaussian noise σ=.01
p=.2 added to the LR image only. HR and LR always receive identical
geometric/photometric parameters.

Here the whole batch is augmented inside the jitted train step: probabilities
and factors are drawn per-sample with counter-based RNG, applied with
``jnp.where`` selects — no host round-trip, no recompile (shapes static).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import AugmentConfig


def _grid(h: int, w: int):
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return yy, xx


def rotate(img: jnp.ndarray, angle_deg: jnp.ndarray, fill: jnp.ndarray,
           method: str = "nearest") -> jnp.ndarray:
    """Rotate one (H, W, C) image counterclockwise about its center.

    ``method``: 'nearest' (parity with torchvision TF.rotate's default) or
    'bilinear'. Out-of-bounds pixels take ``fill``.
    """
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta = angle_deg * jnp.pi / 180.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    yy, xx = _grid(h, w)
    # inverse mapping for a counterclockwise rotation in display coords
    # (y axis down), matching PIL/torchvision rotate and np.rot90
    sx = cos * (xx - cx) - sin * (yy - cy) + cx
    sy = sin * (xx - cx) + cos * (yy - cy) + cy

    def sample_nearest(sx, sy):
        ix = jnp.round(sx).astype(jnp.int32)
        iy = jnp.round(sy).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        vals = img[iyc, ixc]
        return jnp.where(valid[..., None], vals, fill)

    def sample_bilinear(sx, sy):
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx = sx - x0
        fy = sy - y0
        out = jnp.zeros_like(img)
        for dy in (0, 1):
            for dx in (0, 1):
                ix, iy = x0 + dx, y0 + dy
                wgt = (jnp.where(dx == 0, 1 - fx, fx) *
                       jnp.where(dy == 0, 1 - fy, fy))
                valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                vals = img[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
                out = out + wgt[..., None] * jnp.where(valid[..., None], vals, fill)
        return out

    return sample_nearest(sx, sy) if method == "nearest" else sample_bilinear(sx, sy)


def _shift_select(img: jnp.ndarray, shifts: jnp.ndarray, fill: jnp.ndarray,
                  axis: int, k_max: int, method: str) -> jnp.ndarray:
    """Per-line fractional shift along ``axis`` without gathers.

    ``out[line, i] = img[line, i - shifts[line]]`` implemented as a static
    loop over the 2*k_max+1 possible integer shifts (cheap contiguous slices
    of a padded copy) with per-line equality masks — pure VPU select/FMA
    passes, which on TPU beat a 2-D gather by an order of magnitude.
    ``shifts`` is indexed by the *other* spatial axis.
    """
    h, w, _ = img.shape
    size = w if axis == 1 else h
    pad_cfg = [(0, 0), (0, 0), (0, 0)]
    pad_cfg[axis] = (k_max, k_max)
    padded = jnp.pad(img, pad_cfg, constant_values=0.0)
    # fill regions: pad a validity mask the same way
    valid = jnp.pad(jnp.ones_like(img), pad_cfg, constant_values=0.0)

    if method == "nearest":
        k_line = jnp.round(shifts).astype(jnp.int32)
        taps = ((k_line, None),)
    else:  # linear
        k0 = jnp.floor(shifts).astype(jnp.int32)
        frac = shifts - k0
        taps = ((k0, 1.0 - frac), (k0 + 1, frac))

    mask_shape = (-1, 1, 1) if axis == 1 else (1, -1, 1)

    out = jnp.zeros_like(img)
    vsum = jnp.zeros_like(img)
    for k in range(-k_max, k_max + 1):
        if axis == 1:
            copy = padded[:, k_max - k:k_max - k + size, :]
            vcopy = valid[:, k_max - k:k_max - k + size, :]
        else:
            copy = padded[k_max - k:k_max - k + size, :, :]
            vcopy = valid[k_max - k:k_max - k + size, :, :]
        for k_line, weight in taps:
            sel = (k_line == k).reshape(mask_shape).astype(img.dtype)
            wgt = sel if weight is None else sel * weight.reshape(mask_shape)
            out = out + wgt * copy
            vsum = vsum + wgt * vcopy
    # out-of-range contributions came from zero padding; blend in the fill
    return out + (1.0 - vsum) * fill


def rotate_shear(img: jnp.ndarray, angle_deg: jnp.ndarray, fill: jnp.ndarray,
                 method: str = "nearest",
                 max_angle_deg: float = 6.0) -> jnp.ndarray:
    """Paeth 3-shear rotation of one (H, W, C) image — gather-free.

    R(θ) = ShearX(-tan θ/2) · ShearY(sin θ) · ShearX(-tan θ/2); each shear is
    a per-line 1-D shift executed by ``_shift_select``. ~10x faster than the
    gather-based ``rotate`` on TPU for the augmentation's small angles.
    ``max_angle_deg`` bounds the static shift range (must cover |angle|).
    """
    import math

    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta = -angle_deg * jnp.pi / 180.0  # display coords: ccw like rotate()
    alpha = -jnp.tan(theta / 2.0)
    beta = jnp.sin(theta)

    max_t = math.radians(max_angle_deg)
    k_x = int(math.ceil(abs(math.tan(max_t / 2.0)) * max(h, w) / 2.0)) + 1
    k_y = int(math.ceil(abs(math.sin(max_t)) * max(h, w) / 2.0)) + 1

    rows = (jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0).reshape(h) - cy)
    cols = (jax.lax.broadcasted_iota(jnp.float32, (w, 1), 0).reshape(w) - cx)

    x = _shift_select(img, alpha * rows, fill, axis=1, k_max=k_x, method=method)
    x = _shift_select(x, beta * cols, fill, axis=0, k_max=k_y, method=method)
    x = _shift_select(x, alpha * rows, fill, axis=1, k_max=k_x, method=method)
    return x


def _maybe(apply_flag: jnp.ndarray, transformed: jnp.ndarray,
           original: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(apply_flag.reshape((-1,) + (1,) * (original.ndim - 1)),
                     transformed, original)


def augment_pair(hr: jnp.ndarray, lr: jnp.ndarray, key: jax.Array,
                 cfg: AugmentConfig,
                 rotate_method: str = "nearest",
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply identical per-sample augmentation to an HR/LR batch.

    Args:
        hr: (B, H, W, C) float [0,1] high-res batch.
        lr: (B, h, w, C) float [0,1] low-res batch (may differ spatially).
        key: PRNG key.
        cfg: AugmentConfig (defaults mirror utils/dataset.py:71-81).

    Returns (hr_aug, lr_aug).
    """
    b = hr.shape[0]
    keys = jax.random.split(key, 6)
    u_flip = jax.random.uniform(keys[0], (b,))
    u_rot = jax.random.uniform(keys[1], (b,))
    angle = jax.random.uniform(keys[2], (b,), minval=cfg.rotate_range[0],
                               maxval=cfg.rotate_range[1])
    u_bri = jax.random.uniform(keys[3], (b, 2))
    u_con = jax.random.uniform(keys[4], (b, 2))
    u_noise_key = keys[5]

    # --- horizontal flip (both images, same decision) ---
    flip = u_flip < cfg.flip_prob
    hr = _maybe(flip, jnp.flip(hr, axis=2), hr)
    lr = _maybe(flip, jnp.flip(lr, axis=2), lr)

    # --- rotation (same angle; per-image mean fill like TF.to_tensor mean,
    #     utils/dataset.py:148-154). Gather-free 3-shear rotation: the
    #     naive per-pixel gather doubles the whole train step on TPU. ---
    do_rot = u_rot < cfg.rotate_prob
    fill_hr = jnp.mean(hr, axis=(1, 2, 3))
    fill_lr = jnp.mean(lr, axis=(1, 2, 3))
    max_angle = max(abs(cfg.rotate_range[0]), abs(cfg.rotate_range[1])) + 1.0
    rot = lambda im, a, f: rotate_shear(im, a, f, rotate_method, max_angle)
    rot_hr = jax.vmap(rot)(hr, angle, fill_hr)
    rot_lr = jax.vmap(rot)(lr, angle, fill_lr)
    hr = _maybe(do_rot, rot_hr, hr)
    lr = _maybe(do_rot, rot_lr, lr)

    # --- brightness: multiply + clamp (same factor on both) ---
    do_bri = u_bri[:, 0] < cfg.brightness_prob
    bri = (cfg.brightness_range[0] + u_bri[:, 1] *
           (cfg.brightness_range[1] - cfg.brightness_range[0]))
    bri4 = bri.reshape(-1, 1, 1, 1)
    hr = _maybe(do_bri, jnp.clip(hr * bri4, 0, 1), hr)
    lr = _maybe(do_bri, jnp.clip(lr * bri4, 0, 1), lr)

    # --- contrast: (x - mean) * factor + mean, mean per image ---
    do_con = u_con[:, 0] < cfg.contrast_prob
    con = (cfg.contrast_range[0] + u_con[:, 1] *
           (cfg.contrast_range[1] - cfg.contrast_range[0]))
    con4 = con.reshape(-1, 1, 1, 1)
    mean_hr = jnp.mean(hr, axis=(1, 2, 3), keepdims=True)
    mean_lr = jnp.mean(lr, axis=(1, 2, 3), keepdims=True)
    hr = _maybe(do_con, jnp.clip((hr - mean_hr) * con4 + mean_hr, 0, 1), hr)
    lr = _maybe(do_con, jnp.clip((lr - mean_lr) * con4 + mean_lr, 0, 1), lr)

    # --- Gaussian noise on the LR image only (utils/dataset.py:168-173) ---
    k1, k2 = jax.random.split(u_noise_key)
    u_noi = jax.random.uniform(k1, (b,))
    do_noi = u_noi < cfg.noise_prob
    noise = jax.random.normal(k2, lr.shape) * cfg.noise_std
    lr = _maybe(do_noi, jnp.clip(lr + noise, 0, 1), lr)

    return hr, lr
