"""End-to-end extraction parity against the REFERENCE implementation.

The reference's extraction stack (utils/preprocessing.py +
utils/extraction_utils.py) only needs numpy/cv2/torch, all present here —
so we can run the actual reference code on a synthetic volume and compare
its HR/LR PNG outputs against ours pixel-by-pixel. Noise is set to zero so
the k-space simulation is deterministic (RNG streams differ by design;
noise statistics are covered separately in test_ops.py).

Skipped when /root/reference is not mounted.
"""

import os
import sys

import numpy as np
import pytest

import jax

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")


@pytest.fixture
def reference_modules():
    cv2 = pytest.importorskip("cv2")
    sys.path.insert(0, REFERENCE)
    try:
        from utils import preprocessing as ref_prep
        from utils import extraction_utils as ref_ex
    finally:
        sys.path.remove(REFERENCE)
    return ref_prep, ref_ex


def test_hr_pipeline_matches_reference(rng, reference_modules):
    """HR path: percentile window → minmax → LANCZOS letterbox."""
    ref_prep, _ = reference_modules
    from mri_superresolution_tpu.data.extraction import hr_pipeline
    import jax.numpy as jnp

    slice_data = (rng.random((90, 70)) * 800).astype(np.float32)
    want = ref_prep.preprocess_slice(
        slice_data, target_size=(64, 64),
        interpolation=ref_prep.InterpolationMethod.LANCZOS,
        resize_method=ref_prep.ResizeMethod.LETTERBOX,
        apply_simulation=False)
    got = np.asarray(hr_pipeline(jnp.asarray(slice_data[None]), (64, 64)))[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_lr_pipeline_matches_reference_zero_noise(rng, reference_modules):
    """LR path: robust_normalize → k-space sim (no noise) → clip → AREA
    letterbox to half size (utils/extraction_utils.py:136-157)."""
    ref_prep, _ = reference_modules
    from mri_superresolution_tpu.data.extraction import lr_pipeline
    import jax.numpy as jnp

    slice_data = (rng.random((90, 70)) * 800).astype(np.float32)

    norm = ref_prep.robust_normalize(slice_data, 0.5, 99.5, (0, 1))
    # zero-noise simulation: np.random.normal(0, 0) == 0, deterministic
    sim = ref_prep.simulate_low_field_mri(norm, kspace_crop_factor=0.5,
                                          noise_std=0.0)
    sim = np.clip(sim, 0, 1)
    want = ref_prep.letterbox_resize(
        sim, (32, 32), interpolation=ref_prep.InterpolationMethod.AREA)

    got = np.asarray(lr_pipeline(jnp.asarray(slice_data[None]),
                                 jax.random.key(0), (64, 64),
                                 kspace_crop_factor=0.5, noise_std=0.0))[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_full_extract_slices_3d_matches_reference(tmp_path, rng,
                                                  reference_modules):
    """Run the reference's extract_slices_3d and ours on the same volume
    (noise 0) and compare the written uint8 PNGs."""
    cv2 = pytest.importorskip("cv2")
    ref_prep, ref_ex = reference_modules
    from mri_superresolution_tpu.data.extraction import extract_slices_3d

    vol = (rng.random((80, 60, 30)) * 500).astype(np.float64)

    ref_hr = tmp_path / "ref_hr"
    ref_lr = tmp_path / "ref_lr"
    our_hr = tmp_path / "our_hr"
    our_lr = tmp_path / "our_lr"
    for d in (ref_hr, ref_lr, our_hr, our_lr):
        d.mkdir()

    def ref_preprocess(slice_data, target_size, apply_simulation=False):
        return ref_prep.preprocess_slice(
            slice_data, target_size=target_size,
            interpolation=ref_prep.InterpolationMethod.LANCZOS,
            resize_method=ref_prep.ResizeMethod.LETTERBOX,
            apply_simulation=apply_simulation, noise_std=0.0,
            kspace_crop_factor=0.5)

    ref_ex.extract_slices_3d(
        vol, "sub-P1_T1w", str(ref_hr), str(ref_lr), n_slices=5,
        target_size=(64, 64), preprocess_function=ref_preprocess,
        apply_simulation=True, noise_std=0.0, kspace_crop_factor=0.5)

    extract_slices_3d(vol, "sub-P1_T1w", str(our_hr), str(our_lr),
                      n_slices=5, target_size=(64, 64), noise_std=0.0,
                      kspace_crop_factor=0.5, verbose=False,
                      rng_key=jax.random.key(0))

    ref_files = sorted(os.listdir(ref_hr))
    our_files = sorted(os.listdir(our_hr))
    assert ref_files == our_files and len(ref_files) == 5

    for f in ref_files:
        for rd, od in ((ref_hr, our_hr), (ref_lr, our_lr)):
            want = cv2.imread(str(rd / f), cv2.IMREAD_GRAYSCALE).astype(int)
            got = cv2.imread(str(od / f), cv2.IMREAD_GRAYSCALE).astype(int)
            assert want.shape == got.shape
            diff = np.abs(want - got)
            # float pipelines quantized to uint8: allow 1-step rounding
            # differences on a small fraction of pixels
            assert diff.max() <= 1, f
            assert (diff > 0).mean() < 0.05, f
