"""K-space low-field MRI simulator — the data-physics core, as a jitted
batched FFT + RNG kernel.

Reproduces the math of the reference's ``simulate_low_field_mri``
(utils/preprocessing.py:225-293): FFT2 → fftshift → keep a centered
rectangle covering ``kspace_crop_factor`` of each axis → add complex
Gaussian noise with std ``(noise_std/255) * sqrt(rows*cols) / 10`` →
ifftshift → IFFT2 → magnitude (Rician-distributed noise) → min-max rescale
back to the input's range.

TPU-first differences from the reference:
- batched over a leading slice axis and jit-compiled (XLA FFT),
- noise from ``jax.random`` (counter-based, reproducible, per-slice keys) —
  distributionally identical to np.random.normal, not bit-identical,
- the k-space mask is built statically (shapes are static under jit) so XLA
  folds it into a constant.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _center_mask(rows: int, cols: int, crop_factor: float) -> np.ndarray:
    """Static centered-rectangle keep mask (reference mask build at
    utils/preprocessing.py:261-269)."""
    center_row, center_col = rows // 2, cols // 2
    crop_r = int(rows * crop_factor)
    crop_c = int(cols * crop_factor)
    mask = np.zeros((rows, cols), dtype=np.float32)
    r0, r1 = center_row - crop_r // 2, center_row + crop_r // 2
    c0, c1 = center_col - crop_c // 2, center_col + crop_c // 2
    mask[r0:r1, c0:c1] = 1.0
    return mask


def simulate_low_field_mri(data: jnp.ndarray,
                           key: jax.Array,
                           kspace_crop_factor: float = 0.5,
                           noise_std: float = 5.0) -> jnp.ndarray:
    """Simulate low-field MRI on one slice or a batch of slices.

    Args:
        data: (H, W) or (B, H, W) float image(s), any range (usually [0,1]).
        key: jax PRNG key (one key covers the whole batch).
        kspace_crop_factor: fraction of k-space kept per axis.
        noise_std: noise std on the 0-255 scale (scaled internally exactly as
            the reference does at utils/preprocessing.py:274).

    Returns:
        Simulated image(s), min-max rescaled per-slice back to each input
        slice's [min, max] range.
    """
    squeeze = data.ndim == 2
    x = data[None] if squeeze else data
    x = x.astype(jnp.float32)
    b, rows, cols = x.shape

    orig_min = jnp.min(x, axis=(1, 2), keepdims=True)
    orig_max = jnp.max(x, axis=(1, 2), keepdims=True)

    kspace = jnp.fft.fftshift(jnp.fft.fft2(x), axes=(1, 2))
    mask = jnp.asarray(_center_mask(rows, cols, kspace_crop_factor))
    low_res_kspace = kspace * mask

    scaled_noise_std = (noise_std / 255.0) * np.sqrt(rows * cols) / 10.0
    kr, ki = jax.random.split(key)
    noise_real = jax.random.normal(kr, (b, rows, cols), jnp.float32) * scaled_noise_std
    noise_imag = jax.random.normal(ki, (b, rows, cols), jnp.float32) * scaled_noise_std
    noisy_kspace = low_res_kspace + noise_real + 1j * noise_imag

    noisy_image = jnp.fft.ifft2(jnp.fft.ifftshift(noisy_kspace, axes=(1, 2)))
    magnitude = jnp.abs(noisy_image)

    mag_min = jnp.min(magnitude, axis=(1, 2), keepdims=True)
    mag_max = jnp.max(magnitude, axis=(1, 2), keepdims=True)
    simulated = (magnitude - mag_min) / jnp.maximum(mag_max - mag_min, 1e-12)
    simulated = simulated * (orig_max - orig_min) + orig_min

    return simulated[0] if squeeze else simulated
