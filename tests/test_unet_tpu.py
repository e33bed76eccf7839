"""UNetSuperResTPU (the TPU-optimized model family) tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import ModelConfig
from mri_superresolution_tpu.models import build_model, param_count
from mri_superresolution_tpu.models.unet_tpu import UNetSuperResTPU


def _make(base_filters=16, **kw):
    model = UNetSuperResTPU(base_filters=base_filters, dtype=jnp.float32, **kw)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 32, 32, 1)))["params"]
    return model, params


def test_output_shape_and_range(rng):
    model, params = _make()
    x = jnp.asarray(rng.random((2, 24, 40, 1), dtype=np.float32))
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 48, 80, 1)
    assert y.dtype == jnp.float32
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_registry_and_param_count_similar_to_reference_model():
    tpu = build_model(ModelConfig(model_type="unet_tpu"), dtype=jnp.float32)
    ref = build_model(ModelConfig(model_type="unet"), dtype=jnp.float32)
    p_tpu = tpu.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))["params"]
    p_ref = ref.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))["params"]
    ratio = param_count(p_tpu) / param_count(p_ref)
    assert 0.8 < ratio < 1.3  # same capacity class


def test_gradients_flow(rng):
    model, params = _make()
    x = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    t = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    grads = jax.grad(
        lambda p: jnp.mean(jnp.abs(model.apply({"params": p}, x) - t)))(params)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(g)).all(), path
        assert float(jnp.abs(g).sum()) > 0, f"zero grad at {path}"


def test_trains_end_to_end(tmp_path, capsys):
    pytest.importorskip("cv2")
    import json
    from tests.test_train import _make_dataset, _tiny_config
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path, n=8)
    cfg = _tiny_config(tmp_path, hr_dir, lr_dir, epochs=2)
    cfg.model = ModelConfig(model_type="unet_tpu", base_filters=16)
    final = train(cfg)
    import os
    assert os.path.exists(final)
    assert "unet_tpu" in final
    out = capsys.readouterr().out
    summaries = [json.loads(l) for l in out.splitlines()
                 if l.startswith("{") and "epoch_summary" in l]
    assert np.isfinite(summaries[-1]["train_loss"])


def test_remat_model_matches(rng):
    """--remat is a lifted transform (nn.remat of the backbone blocks and
    the final-stage branches/head): the SAME param tree must produce the
    same outputs — guards future branch/head edits from breaking remat
    training for this family (code-review r3 coverage finding)."""
    model, params = _make()
    x = jnp.asarray(rng.random((2, 32, 32, 1), dtype=np.float32))
    ref = model.apply({"params": params}, x)
    m = UNetSuperResTPU(base_filters=16, dtype=jnp.float32, remat=True)
    np.testing.assert_allclose(np.asarray(m.apply({"params": params}, x)),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)
