"""Fused GroupNorm+LeakyReLU kernel: parity vs flax GroupNorm and gradients.

The Pallas kernel runs in interpret mode here (CPU test mesh); hardware
timing lives in tools/bench_gn_probe.py.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_supported_gate_rejects_oversized_chunks():
    """H = 514 = 2 * 257 stalls power-of-two chunking at 257-row (4.1 MB)
    blocks — the gate must reject it so callers fall back to jnp instead of
    hitting a Mosaic VMEM compile error. (pallas_supported itself is False
    off-TPU, so assert the chunk arithmetic the TPU gate applies.)"""
    import jax.numpy as jnp
    from mri_superresolution_tpu.experiments.groupnorm_pallas import (
        _CHUNK_TARGET_BYTES, _pick_chunks, pallas_supported)

    row_bytes = 512 * 16 * 2                      # (514, 512, 16) bf16 rows
    nc = _pick_chunks(514, row_bytes)
    assert nc == 2                                # chunking stalls at 2*257
    assert (514 // nc) * row_bytes > 2 * _CHUNK_TARGET_BYTES  # gate trips
    assert not pallas_supported((2, 514, 512, 16), jnp.bfloat16, 8)
import flax.linen as nn
import pytest

from mri_superresolution_tpu.experiments.groupnorm_pallas import (
    _ref_forward, fused_group_norm_leaky, pallas_supported, _pick_chunks)


def _flax_gn_leaky(x, scale, bias, n_groups=8, eps=1e-5, slope=0.2):
    gn = nn.GroupNorm(num_groups=n_groups, epsilon=eps)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    return nn.leaky_relu(y, slope)


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 16, 16), 8),    # single chunk, W*C=256
    ((1, 32, 8, 32), 8),     # W*C=256
    ((3, 8, 16, 64), 8),     # W*C=1024
    ((2, 12, 32, 8), 4),     # odd-ish H (nc=1), G=4
])
def test_matches_flax_groupnorm_fp32(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))

    got = fused_group_norm_leaky(x, scale, bias, n_groups=groups,
                                 interpret=True)
    want = _flax_gn_leaky(x, scale, bias, n_groups=groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_matches_flax_groupnorm_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 16, 16)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=16).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=16).astype(np.float32))

    got = fused_group_norm_leaky(x.astype(jnp.bfloat16), scale, bias,
                                 interpret=True)
    assert got.dtype == jnp.bfloat16
    # reference computed in fp32 stats on the bf16-rounded input
    want = _flax_gn_leaky(x.astype(jnp.bfloat16).astype(jnp.float32),
                          scale, bias)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_multi_chunk_path_exact():
    """Force nc > 1 (H chunked through the persistent VMEM scratch) and check
    against the single-pass jnp reference."""
    rng = np.random.default_rng(2)
    # W*C*itemsize = 128*4 = 512 bytes/row; chunk target 1 MB won't split —
    # so shrink via the helper's contract instead: verify _pick_chunks and
    # exercise the nc>1 kernel body with a hand-picked chunk count by
    # monkeypatching the target.
    import mri_superresolution_tpu.experiments.groupnorm_pallas as gnp
    old = gnp._CHUNK_TARGET_BYTES
    gnp._CHUNK_TARGET_BYTES = 4 * 128 * 4  # rows of W*C=128 fp32 -> 4 rows
    try:
        x = jnp.asarray(rng.normal(size=(2, 16, 8, 16)).astype(np.float32))
        scale = jnp.ones(16, jnp.float32)
        bias = jnp.zeros(16, jnp.float32)
        assert _pick_chunks(16, 8 * 16 * 4) == 4
        got = fused_group_norm_leaky(x, scale, bias, interpret=True)
        want = _ref_forward(x, scale, bias, None, 8, 0.2, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
    finally:
        gnp._CHUNK_TARGET_BYTES = old


def test_residual_fusion():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(2, 16, 16, 16)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=16).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=16).astype(np.float32))

    got = fused_group_norm_leaky(x, scale, bias, residual=res,
                                 interpret=True)
    want = _flax_gn_leaky(x, scale, bias) + res
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_flax():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 16)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(2, 8, 16, 16)).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=16).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=16).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(2, 8, 16, 16)).astype(np.float32))

    def fused_loss(x, s, b, r):
        return jnp.sum(fused_group_norm_leaky(x, s, b, residual=r,
                                              interpret=True) * ct)

    def flax_loss(x, s, b, r):
        return jnp.sum((_flax_gn_leaky(x, s, b) + r) * ct)

    got = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(x, scale, bias, res)
    want = jax.grad(flax_loss, argnums=(0, 1, 2, 3))(x, scale, bias, res)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_gradients_no_residual():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 16)).astype(np.float32))
    scale = jnp.ones(16, jnp.float32)
    bias = jnp.zeros(16, jnp.float32)

    got = jax.grad(lambda a: jnp.sum(
        fused_group_norm_leaky(a, scale, bias, interpret=True) ** 2))(x)
    want = jax.grad(lambda a: jnp.sum(
        _flax_gn_leaky(a, scale, bias) ** 2))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_supported_gate():
    # CPU backend in tests -> never claims hardware support
    assert not pallas_supported((8, 512, 512, 16), jnp.bfloat16, 8)
    # the fallback path still computes correctly for unsupported lane counts
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 8, 10, 12)).astype(np.float32))
    scale = jnp.ones(12, jnp.float32)
    bias = jnp.zeros(12, jnp.float32)
    got = fused_group_norm_leaky(x, scale, bias, n_groups=4)
    want = _flax_gn_leaky(x, scale, bias, n_groups=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
