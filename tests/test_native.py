"""Native C++ PNG loader: build, decode parity vs cv2, batch path."""

import numpy as np
import pytest

from mri_superresolution_tpu import native

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _write_pngs(tmp_path, n=6, hw=(37, 53)):
    """Varied content exercises all PNG filter types cv2 may emit."""
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        if i % 3 == 0:
            img = rng.integers(0, 255, hw, dtype=np.uint8)  # noise
        elif i % 3 == 1:
            img = np.tile(np.linspace(0, 255, hw[1], dtype=np.uint8),
                          (hw[0], 1))  # horizontal gradient
        else:
            img = np.zeros(hw, np.uint8)
            img[::4] = 200  # stripes
        p = str(tmp_path / f"img{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_decode_matches_cv2(tmp_path):
    for p in _write_pngs(tmp_path):
        want = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        got = native.decode_png(p)
        assert got is not None
        np.testing.assert_array_equal(got, want)


def test_png_size(tmp_path):
    p = _write_pngs(tmp_path, n=1)[0]
    assert native.png_size(p) == (37, 53)


def test_decode_batch_threaded(tmp_path):
    paths = _write_pngs(tmp_path, n=8)
    out = native.decode_batch(paths, (37, 53), n_threads=4)
    assert out is not None and out.shape == (8, 37, 53)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(out[i],
                                      cv2.imread(p, cv2.IMREAD_GRAYSCALE))


def test_decode_rejects_bad_input(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png at all")
    assert native.decode_png(str(bad)) is None
    assert native.decode_png(str(tmp_path / "missing.png")) is None
    # non-gray PNG falls back to None (unsupported format, not a crash)
    rgb = np.random.default_rng(1).integers(0, 255, (10, 10, 3), np.uint8)
    p = str(tmp_path / "rgb.png")
    cv2.imwrite(p, rgb)
    assert native.decode_png(p) is None


def test_dataset_uses_native_batch(tmp_path):
    from mri_superresolution_tpu.data import PairedSliceDataset

    hr_dir = tmp_path / "hr"
    lr_dir = tmp_path / "lr"
    hr_dir.mkdir()
    lr_dir.mkdir()
    rng = np.random.default_rng(2)
    for i in range(4):
        name = f"sub-N{i}_s000.png"
        cv2.imwrite(str(hr_dir / name),
                    rng.integers(0, 255, (32, 32), np.uint8))
        cv2.imwrite(str(lr_dir / name),
                    rng.integers(0, 255, (16, 16), np.uint8))
    ds = PairedSliceDataset(str(hr_dir), str(lr_dir))
    lrs, hrs = ds.load_all()
    assert lrs.shape == (4, 16, 16) and hrs.shape == (4, 32, 32)
    lr0, hr0 = ds[0]
    np.testing.assert_array_equal(lrs[0], lr0)
    np.testing.assert_array_equal(hrs[0], hr0)


def test_encode_roundtrips_via_cv2_and_native(tmp_path, rng):
    """Native encoder (filter-None + zlib): cv2 AND our own decoder read
    back the exact pixels — lossless, standard PNG."""
    for shape in ((37, 53), (64, 64), (1, 1)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        p = str(tmp_path / f"enc_{shape[0]}x{shape[1]}.png")
        assert native.encode_png(p, img)
        np.testing.assert_array_equal(cv2.imread(p, cv2.IMREAD_GRAYSCALE),
                                      img)
        np.testing.assert_array_equal(native.decode_png(p), img)


def test_encode_batch_threaded(tmp_path, rng):
    imgs = rng.integers(0, 256, (8, 24, 31)).astype(np.uint8)
    paths = [str(tmp_path / f"b{i}.png") for i in range(8)]
    assert native.encode_batch(paths, imgs, n_threads=4)
    got = native.decode_batch(paths, (24, 31), n_threads=2)
    np.testing.assert_array_equal(got, imgs)


def test_extraction_imwrite_uses_native(tmp_path, rng, monkeypatch):
    """data/extraction._imwrite routes uint8 grayscale through the native
    encoder (cv2 fallback only on failure)."""
    from mri_superresolution_tpu.data import extraction

    calls = {"native": 0}
    real = native.encode_png

    def spy(path, img, level=1):
        calls["native"] += 1
        return real(path, img, level)

    monkeypatch.setattr(native, "encode_png", spy)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    extraction._imwrite(p, img)
    assert calls["native"] == 1
    np.testing.assert_array_equal(cv2.imread(p, cv2.IMREAD_GRAYSCALE), img)
