"""Minimal torchvision shim — JUST enough surface for the reference
trainer (/root/reference/scripts/train.py) to run in this zero-egress
container, which has torch CPU but no torchvision wheel.

Used only by tools/quality_parity.py (prepended to PYTHONPATH) to train the
*actual* PyTorch reference on identical data for the measured SSIM/PSNR
parity table in RESULTS.md. Covers: transforms.ToTensor/Compose (the
dataset's default pipeline), transforms.functional's augmentation ops
(reference utils/dataset.py:144-166; faithful PIL-based implementations,
exercised only with --augmentation), and an importable `models` module
(reference utils/losses.py:4; vgg19 raises — perceptual_weight must be 0,
matching the container's lack of pretrained weights).
"""

from . import models, transforms  # noqa: F401

__version__ = "0.0.0+shim"
