"""Functional ops used by the reference dataset's augment_pair
(reference utils/dataset.py:144-166). PIL-backed, matching torchvision's
behavior for grayscale images closely enough for training-data purposes."""

import numpy as np
import torch
from PIL import Image, ImageEnhance


def to_tensor(pic):
    if isinstance(pic, torch.Tensor):
        return pic
    if isinstance(pic, Image.Image):
        arr = np.asarray(pic)
    else:
        arr = np.asarray(pic)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
    if t.dtype == torch.uint8:
        return t.to(torch.float32) / 255.0
    return t.to(torch.float32)


def hflip(img):
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def rotate(img, angle, interpolation=None, fill=0, **kwargs):
    """torchvision defaults to InterpolationMode.NEAREST; honor the caller's
    interpolation (InterpolationMode enum, PIL constant, or None=NEAREST) so
    reference-parity training runs see genuine torchvision semantics."""
    if isinstance(fill, (list, tuple)):
        fill = tuple(int(f) for f in fill)
    else:
        fill = int(fill)
    resample = Image.NEAREST
    if interpolation is not None:
        name = str(getattr(interpolation, "value", interpolation)).upper()
        resample = {"BILINEAR": Image.BILINEAR, "BICUBIC": Image.BICUBIC,
                    "NEAREST": Image.NEAREST}.get(
                        name.rsplit(".", 1)[-1],
                        interpolation if isinstance(interpolation, int)
                        else Image.NEAREST)
    return img.rotate(angle, resample=resample, fillcolor=fill)


def adjust_brightness(img, brightness_factor):
    return ImageEnhance.Brightness(img).enhance(brightness_factor)


def adjust_contrast(img, contrast_factor):
    return ImageEnhance.Contrast(img).enhance(contrast_factor)
