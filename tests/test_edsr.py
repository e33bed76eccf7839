"""EDSR model family tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import ModelConfig
from mri_superresolution_tpu.models import build_model


def _make(base_filters=32, num_blocks=2):
    model = build_model(ModelConfig(model_type="edsr",
                                    base_filters=base_filters,
                                    num_blocks=num_blocks),
                        dtype=jnp.float32)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 16, 16, 1)))["params"]
    return model, params


def test_output_shape_and_range(rng):
    model, params = _make()
    x = jnp.asarray(rng.random((2, 20, 28, 1), dtype=np.float32))
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 40, 56, 1)
    assert float(y.min()) >= 0 and float(y.max()) <= 1


def test_depth_configurable():
    _, p2 = _make(num_blocks=2)
    _, p4 = _make(num_blocks=4)
    assert "block3" in p4 and "block3" not in p2


def test_gradients_flow(rng):
    model, params = _make()
    x = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    t = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    grads = jax.grad(
        lambda p: jnp.mean((model.apply({"params": p}, x) - t) ** 2))(params)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(g)).all(), path


def test_trains_with_combined_loss(rng):
    """One optimizer step reduces the loss on a fixed batch."""
    import optax
    from mri_superresolution_tpu.config import LossConfig
    from mri_superresolution_tpu.losses import CombinedLoss
    from mri_superresolution_tpu.train.trainer import make_optimizer

    model, params = _make()
    loss_fn = CombinedLoss(LossConfig(ssim_weight=0.3))
    x = jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))
    t = jnp.asarray(rng.random((2, 32, 32, 1), dtype=np.float32))
    opt = make_optimizer(0.0)
    opt_state = opt.init(params)

    def loss_of(params):
        return loss_fn(model.apply({"params": params}, x), t)[0]

    def step(params, opt_state):
        (l, _), g = jax.value_and_grad(
            lambda p: loss_fn(model.apply({"params": p}, x), t),
            has_aux=True)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: -1e-3 * u, updates)
        return optax.apply_updates(params, updates), opt_state, l

    l_init = float(loss_of(params))
    for _ in range(10):
        params, opt_state, _ = step(params, opt_state)
    assert float(loss_of(params)) < l_init


def test_simple_model_family(tmp_path):
    import numpy as np
    model = build_model(ModelConfig(model_type="simple", base_filters=32),
                        dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))["params"]
    x = jnp.asarray(np.random.default_rng(0).random((2, 20, 24, 1),
                                                    dtype=np.float32))
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 40, 48, 1)
    assert float(y.min()) >= 0 and float(y.max()) <= 1
    g = jax.grad(lambda p: jnp.mean(model.apply({"params": p}, x)))(params)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g))


def test_remat_model_matches(rng):
    """--remat (per-ResBlock nn.remat) consumes the same param tree and
    must reproduce the plain forward exactly."""
    model, params = _make()
    x = jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))
    ref = model.apply({"params": params}, x)
    m = build_model(ModelConfig(model_type="edsr", base_filters=32,
                                num_blocks=2), dtype=jnp.float32, remat=True)
    np.testing.assert_allclose(np.asarray(m.apply({"params": params}, x)),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)
