"""Loss library tests: weighting semantics, VGG parity vs a torch golden."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import LossConfig
from mri_superresolution_tpu.losses import CombinedLoss, l1_loss
from mri_superresolution_tpu.models import vgg as vgg_mod
from mri_superresolution_tpu.ops.ssim import ssim


def _pair(rng, shape=(2, 32, 32, 1)):
    a = rng.random(shape, dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.05, shape).astype(np.float32), 0, 1)
    return jnp.asarray(a), jnp.asarray(b)


def test_weight_derivation_and_composition(rng):
    a, b = _pair(rng)
    cfg = LossConfig(ssim_weight=0.3, perceptual_weight=0.0)
    total, comps = CombinedLoss(cfg)(a, b)
    want = 0.7 * float(l1_loss(a, b)) + 0.3 * (1 - float(jnp.clip(ssim(a, b), 0, 1)))
    assert abs(float(total) - want) < 1e-6
    assert set(comps) == {"l1_loss", "ssim_loss", "ssim_metric"}


def test_pure_ssim_and_pure_l1(rng):
    a, b = _pair(rng)
    t_ssim, c = CombinedLoss(LossConfig(ssim_weight=1.0))(a, b)
    assert "l1_loss" not in c
    assert abs(float(t_ssim) - (1 - float(jnp.clip(ssim(a, b), 0, 1)))) < 1e-6
    t_l1, c = CombinedLoss(LossConfig(ssim_weight=0.0))(a, b)
    assert "ssim_loss" not in c
    assert abs(float(t_l1) - float(l1_loss(a, b))) < 1e-6


def test_invalid_weights_rejected():
    with pytest.raises(ValueError):
        CombinedLoss(LossConfig(ssim_weight=0.8, perceptual_weight=0.5))
    with pytest.raises(ValueError):
        CombinedLoss(LossConfig(ssim_weight=-0.1))
    with pytest.raises(ValueError):
        CombinedLoss(LossConfig(perceptual_weight=0.5))  # no vgg params


def test_sample_weights_mask_padding(rng):
    """A padded batch with zero-weighted pad rows must equal the unpadded loss."""
    a, b = _pair(rng, (3, 16, 16, 1))
    pad_a = jnp.concatenate([a, jnp.zeros((1, 16, 16, 1))])
    pad_b = jnp.concatenate([b, jnp.ones((1, 16, 16, 1))])
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    loss = CombinedLoss(LossConfig(ssim_weight=0.5))
    t_full, _ = loss(a, b)
    t_mask, _ = loss(pad_a, pad_b, sample_weights=w)
    assert abs(float(t_full) - float(t_mask)) < 1e-6


def test_perceptual_loss_with_random_vgg(rng):
    a, b = _pair(rng, (1, 32, 32, 1))
    vp = vgg_mod.random_params(jax.random.key(0), feature_layer_idx=8)
    cfg = LossConfig(ssim_weight=0.3, perceptual_weight=0.2, vgg_layer_idx=8)
    total, comps = CombinedLoss(cfg, vgg_params=vp)(a, b)
    assert "perceptual_loss" in comps
    assert np.isfinite(float(total))
    # differentiable end to end
    g = jax.grad(lambda x: CombinedLoss(cfg, vgg_params=vp)(x, b)[0])(a)
    assert np.isfinite(np.asarray(g)).all()


def test_vgg_features_match_torch_golden(rng):
    """Build the same VGG19 prefix in torch with random weights, convert via
    params_from_torch_state_dict, compare feature maps."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    layer_idx = 8  # relu2_2 — small enough to run fast
    layers = []
    in_ch = 3
    for v in (64, 64, "M", 128, 128):
        if v == "M":
            layers.append(tnn.MaxPool2d(2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = v
    torch.manual_seed(0)
    feats = tnn.Sequential(*layers[:layer_idx + 1]).eval()

    # torchvision checkpoints use "features.{i}.*" keys; bare "{i}.*" is the
    # plain-Sequential form — the converter must accept both
    sd = {f"features.{i}.{k}" if i % 2 == 0 else f"{i}.{k}": v.detach().numpy()
          for i, m in enumerate(feats) for k, v in m.state_dict().items()}
    params = vgg_mod.params_from_torch_state_dict(sd, layer_idx)

    x = rng.random((1, 32, 32, 1), dtype=np.float32)
    got = np.asarray(vgg_mod.extract_features(params, jnp.asarray(x), layer_idx))

    mean = torch.tensor(vgg_mod.VGG_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(vgg_mod.VGG_STD).view(1, 3, 1, 1)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).repeat(1, 3, 1, 1)
    with torch.no_grad():
        want = feats((xt - mean) / std).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_vgg_npz_roundtrip(tmp_path):
    vp = vgg_mod.random_params(jax.random.key(1), feature_layer_idx=3)
    path = str(tmp_path / "vgg.npz")
    vgg_mod.save_params_npz(path, vp)
    loaded = vgg_mod.load_params_npz(path)
    for k in vp:
        np.testing.assert_array_equal(np.asarray(vp[k]["kernel"]),
                                      np.asarray(loaded[k]["kernel"]))
