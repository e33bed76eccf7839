"""End-to-end smoke tests mirroring the five BASELINE.json configs
(SURVEY.md §4(d)), on the virtual 8-device CPU mesh.

Config 1 (single-slice infer) and config 3 (train L1+SSIM) are covered in
test_infer.py / test_train.py; here: config 2 (extraction), config 4 (full
loss + augmentation + bf16 training) and config 5 (full-volume data-parallel
batched inference + eval vs interpolation baselines), plus tiled inference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import (AugmentConfig, LossConfig,
                                            ModelConfig, TrainConfig)
from mri_superresolution_tpu.models import UNetSuperRes, init_params


def test_config2_extraction_20_slices(tmp_path, rng):
    """Paired-slice extraction on one volume, 20 slices (BASELINE cfg 2)."""
    pytest.importorskip("cv2")
    import os
    from mri_superresolution_tpu import nifti
    from mri_superresolution_tpu.data import extract_from_nifti

    vol = (rng.random((48, 44, 60)) * 900).astype(np.float32)
    path = str(tmp_path / "sub-X_T1w.nii")
    nifti.save(path, vol)
    hr, lr = str(tmp_path / "hr"), str(tmp_path / "lr")
    os.makedirs(hr)
    os.makedirs(lr)
    written = extract_from_nifti(path, hr, lr, n_slices=20,
                                 target_size=(64, 64), verbose=False,
                                 rng_key=jax.random.key(0))
    assert len(written) == 20
    assert len(os.listdir(hr)) == len(os.listdir(lr)) == 20


def test_config4_full_loss_aug_bf16_training(tmp_path, capsys):
    """U-Net training with L1+SSIM+VGG-perceptual, augmentation, bf16
    (BASELINE cfg 4)."""
    pytest.importorskip("cv2")
    from tests.test_train import _make_dataset
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _make_dataset(tmp_path, n=8, hw=32)
    cfg = TrainConfig(
        full_res_dir=hr_dir, low_res_dir=lr_dir,
        model=ModelConfig(base_filters=16),
        loss=LossConfig(ssim_weight=0.3, perceptual_weight=0.1,
                        vgg_layer_idx=8),
        augment=AugmentConfig(enabled=True),
        batch_size=8, epochs=2, learning_rate=1e-3, patience=10, seed=0,
        bf16=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"))
    final = train(cfg)
    import os
    import json
    assert os.path.exists(final)
    out = capsys.readouterr().out
    summaries = [json.loads(l) for l in out.splitlines()
                 if l.startswith("{") and "epoch_summary" in l]
    assert len(summaries) == 2
    assert all(np.isfinite(s["train_loss"]) for s in summaries)
    # throughput counters present (SURVEY.md §5 tracing)
    assert "slices_per_sec_per_chip" in summaries[0]


def test_config5_fullvolume_dp_inference_and_eval(rng):
    """Full-volume batched inference sharded over the 8-device mesh + eval
    vs interpolation baselines (BASELINE cfg 5)."""
    from mri_superresolution_tpu.evalsuite import upscale_with_interpolation
    from mri_superresolution_tpu.infer import InferenceEngine
    from mri_superresolution_tpu.ops.metrics import metric_suite

    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (16, 16))
    eng = InferenceEngine(ModelConfig(base_filters=16), params, bf16=False,
                          num_devices=8)
    volume = rng.random((20, 32, 32)).astype(np.float32)  # 20 slices
    up = eng.upscale_batch(volume)
    assert up.shape == (20, 64, 64)

    hr_fake = rng.random((20, 64, 64)).astype(np.float32)
    m_model = metric_suite(jnp.asarray(up[0]), jnp.asarray(hr_fake[0]))
    bicubic = np.asarray(upscale_with_interpolation(
        jnp.asarray(volume[0]), "bicubic"))
    m_bicubic = metric_suite(jnp.asarray(bicubic), jnp.asarray(hr_fake[0]))
    for m in (m_model, m_bicubic):
        assert set(m) == {"ssim", "psnr", "mse", "rmse", "mae"}
        assert all(np.isfinite(v) for v in m.values())


def test_tiled_stitching_geometry_exact(rng):
    """With a shift-equivariant upscaler (2x nearest), halo-tiled stitching
    must reproduce the whole-image result EXACTLY — this pins the tile/halo
    bookkeeping. (The real U-Net contains GroupNorm, whose whole-image
    statistics make tiled and whole outputs legitimately differ.)"""
    from mri_superresolution_tpu.infer import InferenceEngine

    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (16, 16))
    eng = InferenceEngine(ModelConfig(base_filters=16), params, bf16=False)
    eng.upscale_batch = lambda batch: np.repeat(
        np.repeat(batch, 2, axis=1), 2, axis=2)

    for h, w, tile, halo in ((96, 80, 64, 16), (100, 70, 48, 8),
                             (64, 200, 64, 16)):
        img = rng.random((h, w)).astype(np.float32)
        tiled = eng.upscale_tiled(img, tile=tile, halo=halo)
        whole = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
        assert tiled.shape == (2 * h, 2 * w)
        np.testing.assert_array_equal(tiled, whole)


def test_tiled_inference_runs_with_real_model(rng):
    from mri_superresolution_tpu.infer import InferenceEngine

    model = UNetSuperRes(base_filters=16)
    params = init_params(model, jax.random.key(0), (16, 16))
    eng = InferenceEngine(ModelConfig(base_filters=16), params, bf16=False)
    img = rng.random((96, 80)).astype(np.float32)
    tiled = eng.upscale_tiled(img, tile=64, halo=16)
    assert tiled.shape == (192, 160)
    assert tiled.min() >= 0 and tiled.max() <= 1
    # small inputs fall back to the single-pass path
    small = rng.random((32, 32)).astype(np.float32)
    np.testing.assert_allclose(eng.upscale_tiled(small, tile=64),
                               eng.upscale_image(small))
