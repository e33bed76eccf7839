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
        out = jnp.zeros_like(img) * 0.0
        total = jnp.zeros(img.shape[:2] + (1,), img.dtype)
        for dy in (0, 1):
            for dx in (0, 1):
                ix, iy = x0 + dx, y0 + dy
                wgt = (jnp.where(dx == 0, 1 - fx, fx) *
                       jnp.where(dy == 0, 1 - fy, fy))
                valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                vals = img[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
                out = out + wgt[..., None] * jnp.where(valid[..., None], vals, fill)
        del total
        return out

    return sample_nearest(sx, sy) if method == "nearest" else sample_bilinear(sx, sy)


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
    #     utils/dataset.py:148-154) ---
    do_rot = u_rot < cfg.rotate_prob
    fill_hr = jnp.mean(hr, axis=(1, 2, 3))
    fill_lr = jnp.mean(lr, axis=(1, 2, 3))
    rot_hr = jax.vmap(lambda im, a, f: rotate(im, a, f, rotate_method))(
        hr, angle, fill_hr)
    rot_lr = jax.vmap(lambda im, a, f: rotate(im, a, f, rotate_method))(
        lr, angle, fill_lr)
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
