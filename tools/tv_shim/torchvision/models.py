"""Importable stand-in for torchvision.models (reference utils/losses.py:4).

The container is zero-egress: no pretrained VGG19 weights exist, so the
perceptual loss must stay disabled (perceptual_weight=0) — constructing
vgg19 raises with a clear message rather than silently substituting."""


class VGG19_Weights:  # noqa: N801 - torchvision naming
    IMAGENET1K_V1 = "IMAGENET1K_V1"


def vgg19(*args, **kwargs):
    raise RuntimeError(
        "torchvision shim: pretrained VGG19 is unavailable in this "
        "zero-egress container; run the reference with perceptual_weight=0.")
