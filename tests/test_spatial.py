"""Spatially-sharded forward (parallel/spatial.py): exact equivalence to the
dense model over a (data, space) mesh — explicit ppermute halos + psum
GroupNorm stats against UNetSuperRes.apply on the same params."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import ModelConfig
from mri_superresolution_tpu.models import (UNetSuperRes, build_model,
                                            init_params)
from mri_superresolution_tpu.parallel import (build_spatial_forward,
                                              make_spatial_mesh)


@pytest.fixture(scope="module")
def dense_and_params():
    model = UNetSuperRes(base_filters=16, dtype=jnp.float32)
    params = init_params(model, jax.random.key(0), (32, 32))
    return model, params


@pytest.fixture(scope="module")
def tpu_dense_and_params():
    model = build_model(ModelConfig(model_type="unet_tpu", base_filters=16),
                        dtype=jnp.float32)
    params = init_params(model, jax.random.key(1), (32, 32))
    return model, params


def _rand_batch(n, h, w, seed=0):
    return np.random.default_rng(seed).random((n, h, w, 1), np.float32)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (4, 2)])
@pytest.mark.parametrize("model_type", ["unet", "unet_tpu"])
def test_matches_dense_forward(dense_and_params, tpu_dense_and_params,
                               model_type, mesh_shape):
    model, params = (dense_and_params if model_type == "unet"
                     else tpu_dense_and_params)
    n_data, n_space = mesh_shape
    mesh = make_spatial_mesh(n_data, n_space)
    h = 8 * n_space * 2          # two rows per device at the deepest stage
    x = _rand_batch(n_data * 2, h, 64)

    dense = jax.jit(lambda p, a: model.apply({"params": p}, a))(params, x)
    fwd = build_spatial_forward(mesh, (h, 64), dtype=jnp.float32,
                                model_type=model_type)
    sharded = fwd(params, x)

    assert sharded.shape == (x.shape[0], 2 * h, 128, 1)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-4, atol=3e-5)


def test_bf16_as_accurate_as_dense_bf16(dense_and_params):
    """bf16 reduction orders differ between the sharded and dense paths, so
    outputs aren't bitwise equal — the meaningful property is that the
    sharded bf16 path is no further from the fp32 truth than the dense bf16
    path is."""
    model_bf16 = UNetSuperRes(base_filters=16, dtype=jnp.bfloat16)
    model_fp32, params = dense_and_params
    mesh = make_spatial_mesh(2, 4)
    x = _rand_batch(4, 64, 64, seed=1)

    truth = np.asarray(jax.jit(
        lambda p, a: model_fp32.apply({"params": p}, a))(params, x))
    dense16 = np.asarray(jax.jit(
        lambda p, a: model_bf16.apply({"params": p}, a))(params, x))
    fwd = build_spatial_forward(mesh, (64, 64), dtype=jnp.bfloat16)
    sharded16 = np.asarray(fwd(params, x))

    err_sharded = np.abs(sharded16 - truth)
    err_dense = np.abs(dense16 - truth)
    assert err_sharded.mean() <= 2.0 * err_dense.mean() + 1e-4
    assert np.quantile(err_sharded, 0.999) <= \
        2.0 * np.quantile(err_dense, 0.999) + 1e-3


def test_shape_validation():
    mesh = make_spatial_mesh(2, 4)
    with pytest.raises(ValueError, match="divisible by 8\\*n_space"):
        build_spatial_forward(mesh, (40, 64))
    with pytest.raises(ValueError, match="divisible by 8"):
        build_spatial_forward(mesh, (64, 60))


@pytest.mark.parametrize("model_type", ["unet", "unet_tpu"])
def test_engine_spatial_path_matches_dense(dense_and_params,
                                           tpu_dense_and_params, model_type):
    """InferenceEngine(spatial_shards=4) serves the same outputs as the
    default batch-DP engine on conforming sizes (H | 8*shards), for both
    supported families."""
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    _, params = (dense_and_params if model_type == "unet"
                 else tpu_dense_and_params)
    cfg = ModelConfig(model_type=model_type, base_filters=16)
    dense_eng = InferenceEngine(cfg, params, bf16=False, num_devices=8)
    sp_eng = InferenceEngine(cfg, params, bf16=False, num_devices=8,
                             spatial_shards=4)
    batch = _rand_batch(4, 64, 64, seed=3)[..., 0]
    np.testing.assert_allclose(sp_eng.upscale_batch(batch),
                               dense_eng.upscale_batch(batch),
                               rtol=1e-4, atol=3e-5)


def test_engine_spatial_rejects_bad_config(dense_and_params):
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    _, params = dense_and_params
    with pytest.raises(ValueError, match="must divide"):
        InferenceEngine(ModelConfig(model_type="unet", base_filters=16),
                        params, num_devices=8, spatial_shards=3)
    with pytest.raises(ValueError, match="topologies"):
        InferenceEngine(ModelConfig(model_type="edsr", base_filters=16),
                        params, num_devices=8, spatial_shards=4)


def test_torch_checkpoint_params_work(dense_and_params):
    """The spatial forward consumes the SAME param tree as the dense model,
    so converted reference checkpoints run unmodified — pin the tree
    contract by round-tripping params through it."""
    model, params = dense_and_params
    mesh = make_spatial_mesh(1, 8)
    x = _rand_batch(1, 64, 64, seed=2)
    fwd = build_spatial_forward(mesh, (64, 64), dtype=jnp.float32)
    out = fwd(params, x)
    dense = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=1e-4, atol=3e-5)


def test_engine_spatial_padding_warns(caplog, dense_and_params):
    """Non-conforming sizes under spatial sharding are zero-padded, which
    perturbs whole-image GroupNorm stats — the engine must say so
    (VERDICT r2 item 8)."""
    import logging
    from mri_superresolution_tpu.config import ModelConfig
    from mri_superresolution_tpu.infer.engine import InferenceEngine

    _, params = dense_and_params
    cfg = ModelConfig(model_type="unet", base_filters=16)
    eng = InferenceEngine(cfg, params, bf16=False, num_devices=8,
                          spatial_shards=4)
    eng_logger = logging.getLogger("mri_superresolution_tpu.infer")
    eng_logger.addHandler(caplog.handler)
    try:
        out = eng.upscale_batch(_rand_batch(2, 40, 40, seed=5)[..., 0])
    finally:
        eng_logger.removeHandler(caplog.handler)
    assert out.shape == (2, 80, 80)            # cropped back to 2x input
    warns = [r.message for r in caplog.records
             if r.levelno >= logging.WARNING and "GroupNorm" in r.message]
    assert warns and "40x40" in warns[0] and "64x40" in warns[0]

    # conforming sizes must NOT warn
    caplog.clear()
    eng_logger.addHandler(caplog.handler)
    try:
        eng.upscale_batch(_rand_batch(2, 64, 64, seed=6)[..., 0])
    finally:
        eng_logger.removeHandler(caplog.handler)
    assert not [r for r in caplog.records
                if r.levelno >= logging.WARNING and "GroupNorm" in r.message]
