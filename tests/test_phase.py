"""Exactness tests for the phase-space (space-to-depth) final stage.

The phase path (ops/phase.py, models/unet.py:_final_stage_phase) must be
mathematically identical to the module path — same params, same outputs —
so the torch-parity guarantees carry over unchanged.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mri_superresolution_tpu.models import UNetSuperRes, init_params
from mri_superresolution_tpu.experiments import phase as phase_ops
from mri_superresolution_tpu.ops.resize import upsample_bilinear_align_corners


def _conv3x3(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 8, 12, 3), np.float32))
    t = phase_ops.space_to_depth(x)
    assert t.shape == (2, 4, 6, 12)
    np.testing.assert_array_equal(phase_ops.depth_to_space(t), x)


def test_phase_kernel_2x2_exact(rng):
    """align_phase(conv2x2(S2D(x), rescatter(W))) == S2D(conv3x3(x, W))."""
    x = jnp.asarray(rng.random((2, 10, 14, 3), np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5)).astype(np.float32))
    y_true = _conv3x3(x, w)

    t = phase_ops.space_to_depth(x)
    z = phase_ops.phase_conv_2x2(t, phase_ops.phase_kernel_2x2(w))
    assert z.shape == (2, 6, 8, 20)
    aligned = phase_ops.align_phase(z)
    np.testing.assert_allclose(
        phase_ops.depth_to_space(aligned), y_true, rtol=1e-5, atol=1e-5)
    # misaligned collapse path (used at the network output)
    np.testing.assert_allclose(
        phase_ops.depth_to_space_rev_crop(z), y_true, rtol=1e-5, atol=1e-5)


def test_phase_kernel_1x1_exact(rng):
    x = jnp.asarray(rng.random((1, 6, 6, 4), np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, 4, 2)).astype(np.float32))
    y_true = lax.conv_general_dilated(
        x, w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    t = phase_ops.space_to_depth(x)
    z = lax.conv_general_dilated(
        t, phase_ops.phase_kernel_1x1(w), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(phase_ops.depth_to_space(z), y_true,
                               rtol=1e-6, atol=1e-6)


def test_upsample_bilinear_phases_matches_dense(rng):
    x = jnp.asarray(rng.random((2, 7, 9, 3), np.float32))
    dense = upsample_bilinear_align_corners(x, 2)
    phases = phase_ops.upsample_bilinear_phases(x)
    np.testing.assert_allclose(phase_ops.depth_to_space(phases), dense,
                               rtol=1e-6, atol=1e-6)


def test_phase_group_norm_matches_groupnorm(rng):
    import flax.linen as nn

    x = jnp.asarray(rng.random((2, 8, 8, 16), np.float32))
    scale = jnp.asarray(rng.random(16, np.float32) + 0.5)
    bias = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)

    t = phase_ops.space_to_depth(x)
    out = phase_ops.phase_group_norm(t, scale, bias, n_groups=8)
    np.testing.assert_allclose(phase_ops.depth_to_space(out), ref,
                               rtol=2e-5, atol=2e-5)


def test_phase_group_norm_misaligned_stats(rng):
    """Misaligned GN must compute stats from the valid views only: normalize
    a misaligned grid, collapse, and compare against aligned-path GN."""
    x = jnp.asarray(rng.random((2, 12, 12, 8), np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32))
    scale = jnp.asarray(rng.random(16, np.float32) + 0.5)
    bias = jnp.asarray(rng.standard_normal(16).astype(np.float32))

    import flax.linen as nn
    y_true = _conv3x3(x, w)
    ref = nn.GroupNorm(num_groups=8, epsilon=1e-5).apply(
        {"params": {"scale": scale, "bias": bias}}, y_true)

    z = phase_ops.phase_conv_2x2(phase_ops.space_to_depth(x),
                                 phase_ops.phase_kernel_2x2(w))
    zn = phase_ops.phase_group_norm_misaligned(z, scale, bias, n_groups=8)
    np.testing.assert_allclose(phase_ops.depth_to_space_rev_crop(zn), ref,
                               rtol=2e-5, atol=2e-5)


def test_unet_phase_final_equivalence(rng):
    """Full forward: phase_final=True == phase_final=False with shared
    params (fp32). This is what keeps torch checkpoint parity intact."""
    x = jnp.asarray(rng.random((2, 24, 16, 1), np.float32))
    params = init_params(UNetSuperRes(base_filters=16, phase_final=True),
                         jax.random.key(0), (24, 16))
    out_phase = UNetSuperRes(base_filters=16, phase_final=True).apply(
        {"params": params}, x)
    out_ref = UNetSuperRes(base_filters=16, phase_final=False).apply(
        {"params": params}, x)
    assert out_phase.shape == (2, 48, 32, 1)
    np.testing.assert_allclose(out_phase, out_ref, rtol=1e-4, atol=1e-5)


def test_unet_phase_final_equivalence_bf16(rng):
    """bf16 compute: paths differ only in summation order — outputs are
    sigmoid-bounded, so compare with bf16-scale absolute tolerance."""
    x = jnp.asarray(rng.random((2, 16, 16, 1), np.float32))
    params = init_params(
        UNetSuperRes(base_filters=16, phase_final=True, dtype=jnp.bfloat16),
        jax.random.key(0), (16, 16))
    out_phase = UNetSuperRes(base_filters=16, phase_final=True,
                             dtype=jnp.bfloat16).apply({"params": params}, x)
    out_ref = UNetSuperRes(base_filters=16, phase_final=False,
                           dtype=jnp.bfloat16).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_phase), np.asarray(out_ref),
                               atol=3e-2)


def test_phase_final_grads_flow(rng):
    """Autodiff through the rescatter/align ops: grads exist, are finite,
    and every final-stage param receives signal."""
    x = jnp.asarray(rng.random((1, 16, 16, 1), np.float32))
    model = UNetSuperRes(base_filters=16, phase_final=True)
    params = init_params(model, jax.random.key(0), (16, 16))

    def loss(p):
        return jnp.mean(jnp.square(model.apply({"params": p}, x)))

    grads = jax.grad(loss)(params)
    for name in ("final_up_conv", "final_conv1", "final_conv2",
                 "final_up_norm", "final_norm", "final_up_pixelshuffle"):
        leaves = jax.tree_util.tree_leaves(grads[name])
        assert leaves, name
        for g in leaves:
            assert np.all(np.isfinite(np.asarray(g))), name
            assert np.any(np.asarray(g) != 0), name
