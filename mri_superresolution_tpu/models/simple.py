"""SimpleSR — a small SRCNN-style 2x model ('simple').

The reference's sweep CLI lists a ``simple`` model type that, like 'edsr',
was never implemented (scripts/test_ssim_weights.py:106). This provides a
real one: a 3-conv SRCNN-ish trunk (9-5-5 receptive fields per Dong et al.)
operating at input resolution, with a PixelShuffle 2x tail and sigmoid
output — the cheapest family in the zoo, useful as a learned lower bound
and for smoke-fast experiments.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from mri_superresolution_tpu.models.unet import kaiming_fan_out, pixel_shuffle


class SimpleSR(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    base_filters: int = 64
    # accepted for API uniformity; a 3-conv trunk has no interior blocks
    # worth rematerializing, so this is a no-op here
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        f = self.base_filters
        y = nn.relu(nn.Conv(f, (9, 9), padding=4, dtype=self.dtype,
                            kernel_init=kaiming_fan_out(), name="extract")(x))
        y = nn.relu(nn.Conv(f // 2, (5, 5), padding=2, dtype=self.dtype,
                            kernel_init=kaiming_fan_out(), name="map")(y))
        y = nn.Conv(self.out_channels * 4, (5, 5), padding=2,
                    dtype=self.dtype, kernel_init=kaiming_fan_out(),
                    name="reconstruct")(y)
        y = pixel_shuffle(y, 2)
        return jax.nn.sigmoid(y.astype(jnp.float32))
