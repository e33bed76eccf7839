"""Golden parity tests: matrix-multiply resampler vs cv2.resize float path."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from mri_superresolution_tpu.ops.resize import (  # noqa: E402
    Interp, resize, letterbox_resize, center_crop, pad_to_size,
    upsample_bilinear_align_corners,
)

CV2_FLAG = {
    Interp.NEAREST: cv2.INTER_NEAREST,
    Interp.LINEAR: cv2.INTER_LINEAR,
    Interp.CUBIC: cv2.INTER_CUBIC,
    Interp.AREA: cv2.INTER_AREA,
    Interp.LANCZOS: cv2.INTER_LANCZOS4,
}


@pytest.mark.parametrize("method", list(Interp))
@pytest.mark.parametrize("shape,target", [
    ((64, 48), (32, 24)),    # clean 2x down
    ((64, 48), (128, 96)),   # clean 2x up
    ((61, 47), (33, 29)),    # ragged down
    ((33, 29), (61, 47)),    # ragged up
    ((64, 64), (64, 64)),    # identity
])
def test_resize_matches_cv2(rng, method, shape, target):
    img = rng.random(shape, dtype=np.float32)
    th, tw = target
    got = np.asarray(resize(jnp.asarray(img), (th, tw), method))
    want = cv2.resize(img, (tw, th), interpolation=CV2_FLAG[method])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("method", [Interp.LINEAR, Interp.CUBIC, Interp.LANCZOS])
def test_resize_batched_matches_unbatched(rng, method):
    imgs = rng.random((3, 40, 52), dtype=np.float32)
    got = np.asarray(resize(jnp.asarray(imgs), (27, 31), method))
    for i in range(3):
        single = np.asarray(resize(jnp.asarray(imgs[i]), (27, 31), method))
        np.testing.assert_allclose(got[i], single, rtol=1e-5, atol=1e-6)


def test_letterbox_matches_reference_semantics(rng):
    """Letterbox: scale = min(tw/w, th/h), centered, zero pad
    (reference utils/preprocessing.py:23-57)."""
    img = rng.random((100, 60), dtype=np.float32)
    target_size = (80, 120)  # (width, height)
    got = np.asarray(letterbox_resize(jnp.asarray(img), target_size, Interp.LANCZOS))
    # Reference algorithm re-done with cv2 directly:
    h, w = img.shape
    tw, th = target_size
    scale = min(tw / w, th / h)
    nw, nh = int(w * scale), int(h * scale)
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LANCZOS4)
    canvas = np.zeros((th, tw), np.float32)
    x0, y0 = (tw - nw) // 2, (th - nh) // 2
    canvas[y0:y0 + nh, x0:x0 + nw] = resized
    np.testing.assert_allclose(got, canvas, rtol=1e-4, atol=2e-5)


def test_center_crop_and_pad(rng):
    img = rng.random((50, 70), dtype=np.float32)
    # crop smaller
    c = np.asarray(center_crop(jnp.asarray(img), (40, 30)))  # (w, h)
    assert c.shape == (30, 40)
    np.testing.assert_allclose(c, img[10:40, 15:55])
    # pad larger
    p = np.asarray(pad_to_size(jnp.asarray(img), (80, 60)))
    assert p.shape == (60, 80)
    np.testing.assert_allclose(p[5:55, 5:75], img)
    assert p[0, 0] == 0.0


def test_bilinear_align_corners_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.random((2, 7, 9, 3), dtype=np.float32)
    got = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 2))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.functional.interpolate(
        xt, scale_factor=2, mode="bilinear", align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
