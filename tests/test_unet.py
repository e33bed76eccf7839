"""U-Net structural and numerical parity tests.

The strongest check imports the reference PyTorch model from the read-only
mount (skipped when absent), converts its randomly-initialized weights with
tools/torch_compat.py, and asserts forward-pass agreement — proving both
the topology and the weight conversion are exact.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import ModelConfig
from mri_superresolution_tpu.models import (
    UNetSuperRes, build_model, init_params, param_count, pixel_shuffle,
)

REFERENCE = "/root/reference"


def _make(base_filters=32, **kw):
    model = UNetSuperRes(base_filters=base_filters, **kw)
    params = init_params(model, jax.random.key(0), (32, 32))
    return model, params


def test_output_shape_and_range(rng):
    model, params = _make(base_filters=16)
    x = jnp.asarray(rng.random((2, 24, 40, 1), dtype=np.float32))
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 48, 80, 1)
    assert y.dtype == jnp.float32
    yn = np.asarray(y)
    assert yn.min() >= 0.0 and yn.max() <= 1.0  # sigmoid-bounded


def test_odd_input_sizes(rng):
    """Non-%8 inputs must still run (floor pooling + pad-to-match in Up,
    like the reference's warning-but-working path at scripts/infer.py:119)."""
    model, params = _make(base_filters=16)
    x = jnp.asarray(rng.random((1, 27, 35, 1), dtype=np.float32))
    y = model.apply({"params": params}, x)
    assert y.shape == (1, 54, 70, 1)


def test_param_count_matches_torch_reference():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference not mounted")
    sys.path.insert(0, REFERENCE)
    try:
        from models.unet_model import UNetSuperRes as TorchUNet
    finally:
        sys.path.remove(REFERENCE)
    tmodel = TorchUNet(in_channels=1, out_channels=1, base_filters=32)
    twant = sum(p.numel() for p in tmodel.parameters())
    _, params = _make(base_filters=32)
    assert param_count(params) == twant


def test_forward_matches_torch_reference(rng):
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference not mounted")
    sys.path.insert(0, REFERENCE)
    try:
        from models.unet_model import UNetSuperRes as TorchUNet
    finally:
        sys.path.remove(REFERENCE)
    from mri_superresolution_tpu.utils.torch_compat import (
        torch_state_dict_to_flax)

    torch.manual_seed(0)
    tmodel = TorchUNet(in_channels=1, out_channels=1, base_filters=16,
                       initial_alpha=25.0)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = torch_state_dict_to_flax(sd)

    model = UNetSuperRes(base_filters=16, initial_alpha=25.0)
    x = rng.random((2, 32, 32, 1), dtype=np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_torch_conversion_roundtrip_exact(rng):
    """flax → torch state_dict → flax must reproduce every leaf exactly
    (the mapping is a bijection)."""
    from mri_superresolution_tpu.utils.torch_compat import (
        flax_to_torch_state_dict, torch_state_dict_to_flax)

    _, params = _make(base_filters=16, initial_alpha=25.0)
    back = torch_state_dict_to_flax(flax_to_torch_state_dict(params))
    want = dict(jax.tree_util.tree_leaves_with_path(params))
    got = jax.tree_util.tree_leaves_with_path(back)
    assert len(got) == len(want)
    for path, v in got:
        np.testing.assert_array_equal(
            np.asarray(v),
            np.asarray(want[path], np.float32).reshape(np.asarray(v).shape),
            err_msg=jax.tree_util.keystr(path))


def test_export_loads_into_torch_reference(rng, tmp_path):
    """A .pth written by save_torch_checkpoint must load into the
    UNMODIFIED reference model (strict state_dict) and produce the same
    forward as our model — TPU-trained weights served by the reference."""
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference not mounted")
    sys.path.insert(0, REFERENCE)
    try:
        from models.unet_model import UNetSuperRes as TorchUNet
    finally:
        sys.path.remove(REFERENCE)
    from mri_superresolution_tpu.utils.torch_compat import (
        save_torch_checkpoint)

    model, params = _make(base_filters=16, initial_alpha=25.0)
    pth = str(tmp_path / "export.pth")
    save_torch_checkpoint(pth, params, meta={"epoch": 3, "val_loss": 0.5})

    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 3
    tmodel = TorchUNet(in_channels=1, out_channels=1, base_filters=16,
                       initial_alpha=25.0)
    missing, unexpected = tmodel.load_state_dict(ckpt["model_state_dict"])
    assert not missing and not unexpected
    tmodel.eval()

    x = rng.random((2, 32, 32, 1), dtype=np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pixel_shuffle_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.random((2, 4, 5, 12), dtype=np.float32)  # 12 = 3 * 2^2
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = torch.pixel_shuffle(xt, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_registry_dispatch():
    model = build_model(ModelConfig(base_filters=16))
    assert isinstance(model, UNetSuperRes)
    with pytest.raises(ValueError):
        build_model(ModelConfig(model_type="nope"))


def test_alpha_fusion_initial_value():
    """initial_alpha is a percentage normalized /100
    (reference models/unet_model.py:160-163)."""
    model, params = _make(base_filters=16, initial_alpha=50.0)
    assert abs(float(params["alpha"]) - 0.5) < 1e-6


def test_bf16_compute_fp32_output(rng):
    model = UNetSuperRes(base_filters=16, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.key(0), (16, 16))
    x = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    y = model.apply({"params": params}, x)
    assert y.dtype == jnp.float32
    # bf16 path stays close to the fp32 path
    model32 = UNetSuperRes(base_filters=16)
    y32 = model32.apply({"params": params}, x)
    diff = jnp.abs(y - y32)
    assert float(diff.max()) < 0.15
    assert float(diff.mean()) < 0.01


def test_gradients_flow_through_all_params(rng):
    model, params = _make(base_filters=16)
    x = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    t = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))

    def loss_fn(p):
        y = model.apply({"params": p}, x)
        return jnp.mean(jnp.abs(y - t))

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    for path, g in leaves:
        assert np.isfinite(np.asarray(g)).all(), path
        assert float(jnp.abs(g).sum()) > 0, f"zero grad at {path}"


def test_metric_delta_vs_torch_reference(rng):
    """BASELINE.json's parity clause: SSIM/PSNR of our output vs the torch
    reference's output on the same input must be within 0.1 dB — here the
    outputs agree so tightly the PSNR between them exceeds 55 dB and the
    SSIM deltas vanish."""
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference not mounted")
    sys.path.insert(0, REFERENCE)
    try:
        from models.unet_model import UNetSuperRes as TorchUNet
    finally:
        sys.path.remove(REFERENCE)
    from mri_superresolution_tpu.utils.torch_compat import (
        torch_state_dict_to_flax)
    from mri_superresolution_tpu.ops.metrics import psnr
    from mri_superresolution_tpu.ops.ssim import ssim as our_ssim

    torch.manual_seed(1)
    tmodel = TorchUNet(in_channels=1, out_channels=1, base_filters=16)
    tmodel.eval()
    params = torch_state_dict_to_flax(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()})
    model = UNetSuperRes(base_filters=16)

    x = rng.random((1, 32, 32, 1), dtype=np.float32)
    ours = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    theirs = jnp.asarray(theirs.numpy().transpose(0, 2, 3, 1))

    # direct output agreement, in metric language
    assert float(psnr(ours, theirs)) > 55.0
    # and identical quality scores vs an arbitrary "ground truth"
    gt = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
    assert abs(float(our_ssim(ours, gt)) - float(our_ssim(theirs, gt))) < 1e-4


def test_remat_model_matches_and_supports_phase_final(rng):
    """remat is a lifted transform: same param tree, same outputs — and it
    must coexist with phase_final (the phase path passes a Python-bool
    kwarg into PixelShuffleUp that nn.remat must not trace; code-review r3
    finding)."""
    base = UNetSuperRes(base_filters=16, dtype=jnp.float32)
    params = base.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))["params"]
    x = jnp.asarray(rng.random((2, 32, 32, 1), dtype=np.float32))
    ref = base.apply({"params": params}, x)
    for kwargs in ({"remat": True}, {"remat": True, "phase_final": True}):
        m = UNetSuperRes(base_filters=16, dtype=jnp.float32, **kwargs)
        np.testing.assert_allclose(np.asarray(m.apply({"params": params}, x)),
                                   np.asarray(ref), rtol=1e-4, atol=3e-5)
