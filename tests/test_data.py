"""NIfTI codec, extraction pipeline, dataset, and augmentation tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_superresolution_tpu import nifti
from mri_superresolution_tpu.config import AugmentConfig
from mri_superresolution_tpu.data import (
    PairedSliceDataset, BatchLoader, train_val_split,
    extract_from_nifti, extract_slices_3d, find_nifti_files,
    generate_bids_identifier, generate_filename, select_slice_indices,
)
from mri_superresolution_tpu.ops.augment import augment_pair, rotate


# -------------------------------------------------------------------- NIfTI

def _synthetic_volume(rng, shape=(32, 28, 24)):
    """Smooth blobby brain-ish volume."""
    z = rng.normal(0, 1, (6, 6, 6))
    vol = np.zeros(shape, np.float32)
    zoom = [s / 6 for s in shape]
    xs = [np.minimum((np.arange(s) / zf).astype(int), 5) for s, zf in zip(shape, zoom)]
    vol = z[np.ix_(xs[0], xs[1], xs[2])].astype(np.float32)
    vol += rng.normal(0, 0.05, shape).astype(np.float32)
    return (vol - vol.min()) * 500.0


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8, np.float64])
def test_nifti_roundtrip(tmp_path, rng, ext, dtype):
    vol = _synthetic_volume(rng)
    if np.issubdtype(dtype, np.integer):
        vol = np.clip(vol, 0, np.iinfo(dtype).max).astype(dtype)
    else:
        vol = vol.astype(dtype)
    path = str(tmp_path / f"sub-01_T1w{ext}")
    nifti.save(path, vol, zooms=(1.0, 1.5, 2.0))
    data, hdr = nifti.load(path)
    assert data.dtype == np.float64
    assert data.shape == vol.shape
    np.testing.assert_allclose(data, vol.astype(np.float64))
    assert hdr.zooms == (1.0, 1.5, 2.0)


@pytest.mark.parametrize("compress", [False, True])
def test_nifti_bytes_roundtrip(tmp_path, rng, compress):
    """save_bytes/load_bytes (the daemon's in-memory codec) match the
    file path byte-for-byte and decode identically."""
    vol = _synthetic_volume(rng).astype(np.float32)
    blob = nifti.save_bytes(vol, zooms=(1.0, 1.5, 2.0), compress=compress)
    data, hdr = nifti.load_bytes(blob)
    np.testing.assert_allclose(data, vol.astype(np.float64))
    assert hdr.zooms == (1.0, 1.5, 2.0)
    if not compress:
        path = str(tmp_path / "v.nii")
        nifti.save(path, vol, zooms=(1.0, 1.5, 2.0))
        assert open(path, "rb").read() == blob


def test_nifti_4d_and_scaling(tmp_path, rng):
    vol = rng.random((8, 8, 8, 3)).astype(np.float32)
    path = str(tmp_path / "bold.nii")
    nifti.save(path, vol)
    data, hdr = nifti.load(path)
    assert data.shape == (8, 8, 8, 3)
    np.testing.assert_allclose(data, vol, rtol=1e-6)


def test_nifti_reads_nibabel_style_int16_scaled(tmp_path):
    """Hand-craft a header with scl_slope/inter to check get_fdata parity."""
    import struct
    vol = (np.arange(4 * 4 * 2) % 100).astype(np.int16).reshape(4, 4, 2)
    path = str(tmp_path / "scaled.nii")
    nifti.save(path, vol)
    raw = bytearray(open(path, "rb").read())
    struct.pack_into("<3f", raw, 108, 352.0, 2.5, -1.0)  # slope 2.5, inter -1
    open(path, "wb").write(bytes(raw))
    data, _ = nifti.load(path)
    np.testing.assert_allclose(data, vol.astype(np.float64) * 2.5 - 1.0)


def test_nifti_raw_load_and_slope_save(tmp_path):
    """raw=True returns the stored integers untouched (serving fast path);
    save(scl_slope=...) writes a header load() decodes with get_fdata
    semantics — the int16-packed SR output round-trips to [0,1]."""
    vol = (np.arange(4 * 4 * 2) % 100).astype(np.int16).reshape(4, 4, 2)
    path = str(tmp_path / "raw.nii")
    nifti.save(path, vol, scl_slope=1.0 / 32767.0)
    data_raw, hdr = nifti.load(path, raw=True)
    assert data_raw.dtype == np.int16
    np.testing.assert_array_equal(data_raw, vol)
    data, _ = nifti.load(path)
    np.testing.assert_allclose(data, vol.astype(np.float64) / 32767.0,
                               rtol=1e-6)
    # negative slope flips intensity order -> raw load must refuse
    import struct
    buf = bytearray(open(path, "rb").read())
    struct.pack_into("<3f", buf, 108, 352.0, -1.0, 0.0)
    open(path, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="non-negative scl_slope"):
        nifti.load(path, raw=True)


# --------------------------------------------------------------- extraction

def test_bids_identifier():
    assert generate_bids_identifier("/x/sub-01_ses-1_acq-MPRAGE_T1w.nii.gz") == \
        "sub-01_ses-1_acq-MPRAGE_T1w"
    assert generate_bids_identifier("plain_scan.nii") == "plain_scan"
    # modality only appended for standard suffixes
    assert generate_bids_identifier("sub-02_foo.nii").startswith("sub-02")


def test_generate_filename():
    assert generate_filename("sub-01_T1w", 64) == "sub-01_T1w_s064.png"
    assert generate_filename("s", 5, timepoint=2) == "s_T2_s005.png"


def test_select_slice_indices():
    idx = select_slice_indices(100, 0.2, 0.8, 10)
    want = np.linspace(20, 80, 10, dtype=int)
    np.testing.assert_array_equal(idx, want)


def test_extraction_end_to_end(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    vol = _synthetic_volume(rng, (40, 36, 30))
    nii = str(tmp_path / "sub-03_T1w.nii.gz")
    nifti.save(nii, vol)
    hr_dir = str(tmp_path / "hr")
    lr_dir = str(tmp_path / "lr")
    os.makedirs(hr_dir)
    os.makedirs(lr_dir)
    written = extract_from_nifti(nii, hr_dir, lr_dir, n_slices=4,
                                 target_size=(64, 64), verbose=False,
                                 rng_key=jax.random.key(0))
    assert len(written) == 4
    for f in written:
        hr = cv2.imread(os.path.join(hr_dir, f), cv2.IMREAD_GRAYSCALE)
        lr = cv2.imread(os.path.join(lr_dir, f), cv2.IMREAD_GRAYSCALE)
        assert hr.shape == (64, 64)
        assert lr.shape == (32, 32)
        assert hr.max() > 50  # normalized content, not blank
    # deterministic with the same key
    hr2_dir = str(tmp_path / "hr2")
    lr2_dir = str(tmp_path / "lr2")
    os.makedirs(hr2_dir)
    os.makedirs(lr2_dir)
    extract_from_nifti(nii, hr2_dir, lr2_dir, n_slices=4, target_size=(64, 64),
                       verbose=False, rng_key=jax.random.key(0))
    a = cv2.imread(os.path.join(lr_dir, written[0]), cv2.IMREAD_GRAYSCALE)
    b = cv2.imread(os.path.join(lr2_dir, written[0]), cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(a, b)


def test_find_nifti_files_anat_filter(tmp_path):
    (tmp_path / "set1" / "sub-01" / "anat").mkdir(parents=True)
    (tmp_path / "set1" / "sub-01" / "func").mkdir(parents=True)
    (tmp_path / "set1" / "sub-01" / "anat" / "a_T1w.nii").write_bytes(b"")
    (tmp_path / "set1" / "sub-01" / "func" / "b_bold.nii").write_bytes(b"")
    found = find_nifti_files(str(tmp_path))
    assert len(found) == 1 and found[0].endswith("a_T1w.nii")


# ------------------------------------------------------------------ dataset

def _write_pairs(tmp_path, n=6, hw=(32, 32)):
    import cv2
    hr_dir = tmp_path / "hr"
    lr_dir = tmp_path / "lr"
    hr_dir.mkdir()
    lr_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(n):
        name = f"sub-HC{i:03d}_s{i:03d}.png"
        cv2.imwrite(str(hr_dir / name),
                    rng.integers(0, 255, hw, dtype=np.uint8))
        cv2.imwrite(str(lr_dir / name),
                    rng.integers(0, 255, (hw[0] // 2, hw[1] // 2), dtype=np.uint8))
    return str(hr_dir), str(lr_dir)


def test_dataset_pairing_and_subjects(tmp_path):
    pytest.importorskip("cv2")
    hr_dir, lr_dir = _write_pairs(tmp_path)
    # orphan HR without LR mate must be excluded (fixes reference quirk)
    import cv2
    cv2.imwrite(os.path.join(hr_dir, "sub-ORPHAN_s000.png"),
                np.zeros((32, 32), np.uint8))
    ds = PairedSliceDataset(hr_dir, lr_dir)
    assert len(ds) == 6
    assert ds.get_unique_subjects() == [f"HC{i:03d}" for i in range(6)]
    assert ds.get_subject_indices("HC002") == [2]
    lr, hr = ds[0]
    assert hr.shape == (32, 32) and lr.shape == (16, 16)


def test_batch_loader_padding_and_determinism(tmp_path):
    pytest.importorskip("cv2")
    hr_dir, lr_dir = _write_pairs(tmp_path, n=5)
    ds = PairedSliceDataset(hr_dir, lr_dir)
    lr_a, hr_a = ds.load_all()
    tr, va = train_val_split(len(ds), 0.2, seed=0)
    assert len(tr) == 4 and len(va) == 1
    loader = BatchLoader(lr_a, hr_a, tr, batch_size=3, seed=0)
    batches = list(loader.epoch())
    assert len(batches) == 2
    assert batches[0]["lr"].shape == (3, 16, 16, 1)
    assert batches[0]["weight"].sum() == 3
    assert batches[1]["weight"].sum() == 1  # padded final batch
    assert batches[0]["hr"].max() <= 1.0
    # same seed → same order
    loader2 = BatchLoader(lr_a, hr_a, tr, batch_size=3, seed=0)
    np.testing.assert_array_equal(next(iter(loader2.epoch()))["lr"],
                                  batches[0]["lr"])


# ------------------------------------------------------------- augmentation

def test_rotate_zero_angle_identity(rng):
    img = jnp.asarray(rng.random((16, 16, 1), dtype=np.float32))
    out = rotate(img, jnp.asarray(0.0), jnp.asarray(0.0), "nearest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    out_b = rotate(img, jnp.asarray(0.0), jnp.asarray(0.0), "bilinear")
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(img), atol=1e-6)


def test_rotate_90_matches_numpy(rng):
    img = jnp.asarray(rng.random((15, 15, 1), dtype=np.float32))
    out = rotate(img, jnp.asarray(90.0), jnp.asarray(0.0), "nearest")
    want = np.rot90(np.asarray(img), 1, axes=(0, 1))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_augment_pair_identical_geometry(rng):
    """HR and LR must get the same flip decision: augment a pair where LR is
    the downsampled HR, and check flipped LR still matches downsampled
    flipped HR."""
    hr = np.zeros((4, 16, 16, 1), np.float32)
    hr[:, :, :8] = 1.0  # left half bright
    lr = hr[:, ::2, ::2]
    cfg = AugmentConfig(flip_prob=1.0, rotate_prob=0.0, brightness_prob=0.0,
                        contrast_prob=0.0, noise_prob=0.0)
    hr_a, lr_a = augment_pair(jnp.asarray(hr), jnp.asarray(lr),
                              jax.random.key(0), cfg)
    np.testing.assert_allclose(np.asarray(hr_a)[:, ::2, ::2], np.asarray(lr_a))
    assert np.asarray(hr_a)[0, 0, -1, 0] == 1.0  # flipped: right half bright


def test_augment_noise_only_on_lr(rng):
    hr = jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))
    lr = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32))
    cfg = AugmentConfig(flip_prob=0.0, rotate_prob=0.0, brightness_prob=0.0,
                        contrast_prob=0.0, noise_prob=1.0, noise_std=0.05)
    hr_a, lr_a = augment_pair(hr, lr, jax.random.key(1), cfg)
    np.testing.assert_array_equal(np.asarray(hr_a), np.asarray(hr))
    assert np.abs(np.asarray(lr_a) - np.asarray(lr)).mean() > 1e-3


def test_augment_brightness_contrast_math(rng):
    hr = jnp.asarray(np.full((1, 8, 8, 1), 0.5, np.float32))
    lr = jnp.asarray(np.full((1, 4, 4, 1), 0.5, np.float32))
    cfg = AugmentConfig(flip_prob=0.0, rotate_prob=0.0, brightness_prob=1.0,
                        brightness_range=(1.1, 1.1), contrast_prob=0.0,
                        noise_prob=0.0)
    hr_a, _ = augment_pair(hr, lr, jax.random.key(2), cfg)
    np.testing.assert_allclose(np.asarray(hr_a), 0.55, rtol=1e-5)
    # contrast on a constant image is identity
    cfg2 = AugmentConfig(flip_prob=0.0, rotate_prob=0.0, brightness_prob=0.0,
                         contrast_prob=1.0, contrast_range=(1.5, 1.5),
                         noise_prob=0.0)
    hr_c, _ = augment_pair(hr, lr, jax.random.key(3), cfg2)
    np.testing.assert_allclose(np.asarray(hr_c), 0.5, atol=1e-6)


def test_augment_is_jittable(rng):
    hr = jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))
    lr = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32))
    cfg = AugmentConfig()
    fn = jax.jit(lambda h, l, k: augment_pair(h, l, k, cfg))
    hr_a, lr_a = fn(hr, lr, jax.random.key(4))
    assert hr_a.shape == hr.shape and lr_a.shape == lr.shape


def test_nifti_big_endian(tmp_path, rng):
    """Byteswapped (big-endian) NIfTI-1 files must read correctly."""
    import struct
    from mri_superresolution_tpu import nifti as nf

    vol = (rng.random((6, 5, 4)) * 100).astype(">f4")  # big-endian floats
    hdr = bytearray(nf.HDR_SIZE)
    struct.pack_into(">i", hdr, 0, nf.HDR_SIZE)
    struct.pack_into(">8h", hdr, 40, 3, 6, 5, 4, 1, 1, 1, 1)
    struct.pack_into(">2h", hdr, 70, 16, 32)  # float32
    struct.pack_into(">8f", hdr, 76, 0, 1, 1, 1, 1, 1, 1, 1)
    struct.pack_into(">3f", hdr, 108, 352.0, 1.0, 0.0)
    hdr[344:348] = b"n+1\x00"
    path = tmp_path / "be.nii"
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00" * 4)
        f.write(np.asfortranarray(vol).tobytes(order="F"))
    data, h = nf.load(str(path))
    np.testing.assert_allclose(data, vol.astype(np.float64))


def test_nifti_rejects_garbage(tmp_path):
    from mri_superresolution_tpu import nifti as nf
    p = tmp_path / "bad.nii"
    p.write_bytes(b"x" * 400)
    with pytest.raises(ValueError):
        nf.load(str(p))
    p2 = tmp_path / "short.nii"
    p2.write_bytes(b"x" * 10)
    with pytest.raises(ValueError):
        nf.load(str(p2))


def test_batchloader_epoch_idx_determinism(tmp_path):
    pytest.importorskip("cv2")
    hr_dir, lr_dir = _write_pairs(tmp_path, n=6)
    ds = PairedSliceDataset(hr_dir, lr_dir)
    lr_a, hr_a = ds.load_all()
    l1 = BatchLoader(lr_a, hr_a, np.arange(6), 2, seed=5)
    l2 = BatchLoader(lr_a, hr_a, np.arange(6), 2, seed=5)
    # same epoch index → same order, even after l2 already iterated epoch 0
    list(l2.epoch(0))
    a = [b["lr"] for b in l1.epoch(3)]
    b = [b["lr"] for b in l2.epoch(3)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # different epochs differ
    c = [b["lr"] for b in l1.epoch(4)]
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_subject_split_no_leakage():
    from mri_superresolution_tpu.data import subject_split
    subjects = (["A"] * 10 + ["B"] * 10 + ["C"] * 10 + ["D"] * 10)
    tr, va = subject_split(subjects, 0.25, seed=1)
    assert len(tr) + len(va) == 40
    tr_subj = {subjects[i] for i in tr}
    va_subj = {subjects[i] for i in va}
    assert not (tr_subj & va_subj)       # disjoint subjects
    assert len(va) >= 10                 # >= 25% of samples
    # deterministic
    tr2, va2 = subject_split(subjects, 0.25, seed=1)
    np.testing.assert_array_equal(tr, tr2)


def test_upper_percent_one_does_not_crash(tmp_path, rng):
    pytest.importorskip("cv2")
    idx = select_slice_indices(30, 0.0, 1.0, 5)
    assert idx.max() == 29  # clamped in range (reference crashes here)
    vol = _synthetic_volume(rng, (24, 20, 16))
    hr = tmp_path / "hr"; lr = tmp_path / "lr"
    hr.mkdir(); lr.mkdir()
    written = extract_slices_3d(np.asarray(vol, np.float64), "sub-Z", str(hr),
                                str(lr), n_slices=3, lower_percent=0.5,
                                upper_percent=1.0, target_size=(32, 32),
                                verbose=False)
    assert len(written) == 3


def test_default_extraction_key_is_process_stable(tmp_path, rng):
    """Without an explicit rng_key the LR noise must still be deterministic
    across runs (crc32 seeding, not Python's salted hash)."""
    pytest.importorskip("cv2")
    import cv2
    vol = np.asarray(_synthetic_volume(rng, (24, 20, 16)), np.float64)
    outs = []
    for tag in ("a", "b"):
        hr = tmp_path / f"hr{tag}"; lr = tmp_path / f"lr{tag}"
        hr.mkdir(); lr.mkdir()
        files = extract_slices_3d(vol, "sub-K", str(hr), str(lr), n_slices=2,
                                  target_size=(32, 32), verbose=False)
        outs.append(cv2.imread(str(lr / files[0]), cv2.IMREAD_GRAYSCALE))
    np.testing.assert_array_equal(outs[0], outs[1])


# ------------------------------------------------------ streaming loader

def test_streaming_loader_matches_batchloader(tmp_path):
    """Same (seed, epoch_idx) -> identical batch order AND content as the
    in-memory BatchLoader, including the padded partial batch — the
    trainer can switch loaders without changing a trained model."""
    from mri_superresolution_tpu.data import StreamingBatchLoader

    hr_dir, lr_dir = _write_pairs(tmp_path, n=7)
    ds = PairedSliceDataset(hr_dir, lr_dir)
    lr_a, hr_a = ds.load_all()
    idx = np.arange(7)
    mem = BatchLoader(lr_a, hr_a, idx, batch_size=3, seed=11)
    stream = StreamingBatchLoader(ds, idx, batch_size=3, seed=11)
    assert len(mem) == len(stream) == 3
    for e in range(2):
        got = list(stream.epoch(e))
        want = list(mem.epoch(e))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g["lr"], w["lr"])
            np.testing.assert_array_equal(g["hr"], w["hr"])
            np.testing.assert_array_equal(g["weight"], w["weight"])


def test_streaming_loader_is_lazy_and_bounded(tmp_path):
    """Bounded-RAM accounting: nothing decodes at construction; each
    consumed batch costs exactly one decode call, with at most
    ``prefetch`` batches decoded ahead of the consumer."""
    from mri_superresolution_tpu.data import StreamingBatchLoader

    hr_dir, lr_dir = _write_pairs(tmp_path, n=12)
    ds = PairedSliceDataset(hr_dir, lr_dir)
    loader = StreamingBatchLoader(ds, np.arange(12), batch_size=2,
                                  shuffle=False, seed=0, prefetch=1)
    assert loader.decode_batch_calls == 0          # lazy
    it = loader.epoch(0)
    first = next(it)
    assert first["lr"].shape == (2, 16, 16, 1)
    # consumer holds batch 0; worker may stage at most prefetch+1 more
    import time
    time.sleep(0.3)                                # let the prefetch settle
    assert loader.decode_batch_calls <= 1 + loader.prefetch + 1
    # abandoning the iterator mid-epoch must not decode the rest
    it.close()
    calls_after_close = loader.decode_batch_calls
    time.sleep(0.2)
    assert loader.decode_batch_calls == calls_after_close < 6


def test_streaming_loader_early_abandon_and_reuse(tmp_path):
    """An abandoned epoch leaves the loader reusable (the trainer breaks
    out of val loops on early stopping)."""
    from mri_superresolution_tpu.data import StreamingBatchLoader

    hr_dir, lr_dir = _write_pairs(tmp_path, n=6)
    ds = PairedSliceDataset(hr_dir, lr_dir)
    loader = StreamingBatchLoader(ds, np.arange(6), batch_size=2,
                                  shuffle=True, seed=3)
    it = loader.epoch(0)
    next(it)
    it.close()
    full = list(loader.epoch(1))
    assert len(full) == 3
    assert all(b["weight"].sum() == 2 for b in full)


def test_estimated_decoded_mb(tmp_path):
    hr_dir, lr_dir = _write_pairs(tmp_path, n=6, hw=(32, 32))
    ds = PairedSliceDataset(hr_dir, lr_dir)
    lr_hw, hr_hw = ds.item_hw()
    assert lr_hw == (16, 16) and hr_hw == (32, 32)
    want = 6 * (32 * 32 + 16 * 16) / 2**20
    assert abs(ds.estimated_decoded_mb() - want) < 1e-9


def test_trainer_streaming_mode_trains(tmp_path, capsys):
    """train(streaming='on') runs end to end and produces the same loss
    trajectory as the in-memory path (same seed, same data order)."""
    import json
    from mri_superresolution_tpu.config import (LossConfig, ModelConfig,
                                                TrainConfig)
    from mri_superresolution_tpu.train.trainer import train

    hr_dir, lr_dir = _write_pairs(tmp_path, n=8, hw=(16, 16))

    def run(mode, tag):
        cfg = TrainConfig(
            full_res_dir=hr_dir, low_res_dir=lr_dir,
            model=ModelConfig(model_type="unet", base_filters=16),
            loss=LossConfig(ssim_weight=0.3),
            batch_size=4, epochs=1, seed=7, bf16=False,
            validation_split=0.25, streaming=mode,
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
            log_dir=str(tmp_path / f"logs_{tag}"))
        train(cfg)
        lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        return [m for m in lines if m.get("type") == "epoch_summary"]

    on = run("on", "on")
    off = run("off", "off")
    assert on and off
    assert on[0]["train_loss"] == pytest.approx(off[0]["train_loss"],
                                                rel=1e-5)
    assert on[0]["val_loss"] == pytest.approx(off[0]["val_loss"], rel=1e-5)
