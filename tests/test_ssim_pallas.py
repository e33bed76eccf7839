"""Fused Pallas SSIM kernel: numerics + gradients (interpret mode on CPU;
the same kernel compiles natively on TPU — verified on hardware, see
BASELINE.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.ops.ssim import ssim
from mri_superresolution_tpu.experiments.ssim_pallas import (ssim_fused,
                                                     ssim_fused_per_sample)


def _pair(rng, shape=(3, 32, 32)):
    a = rng.random(shape, dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.05, shape).astype(np.float32), 0, 1)
    return jnp.asarray(a), jnp.asarray(b)


def test_fused_matches_xla(rng):
    a, b = _pair(rng)
    got = np.asarray(ssim_fused_per_sample(a, b, interpret=True))
    want = np.asarray(ssim(a[..., None], b[..., None], size_average=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_identical_is_one(rng):
    a, _ = _pair(rng, (2, 24, 24))
    got = np.asarray(ssim_fused_per_sample(a, a, interpret=True))
    np.testing.assert_allclose(got, 1.0, atol=1e-6)


def test_fused_accepts_nhwc(rng):
    a, b = _pair(rng, (2, 16, 16))
    got4 = np.asarray(ssim_fused_per_sample(a[..., None], b[..., None],
                                            interpret=True))
    got3 = np.asarray(ssim_fused_per_sample(a, b, interpret=True))
    np.testing.assert_allclose(got4, got3)


def test_fused_gradient_matches_xla(rng):
    a, b = _pair(rng, (1, 16, 16))
    g_fused = jax.grad(lambda x: ssim_fused(x, b, 11, 1.5, 1.0, True))(a)
    g_xla = jax.grad(lambda x: ssim(x, b[..., None]))(a[..., None])
    np.testing.assert_allclose(np.asarray(g_fused),
                               np.asarray(g_xla)[..., 0],
                               rtol=1e-5, atol=1e-7)


def test_fused_rejects_multichannel(rng):
    a = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    with pytest.raises(AssertionError):
        ssim_fused_per_sample(a, a, interpret=True)
