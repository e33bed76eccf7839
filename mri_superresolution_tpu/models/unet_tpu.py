"""UNetSuperResTPU — a TPU-optimized 2x SR U-Net variant ('unet_tpu').

Motivation (measured on v5e, see tools/bench_ablation.py): the reference
topology spends >half its inference time in the final 2x stage because its
narrow convolutions at full output resolution (Cout=16 at 512²) use only
16/128 MXU output lanes, and bilinear-branch tensors at 512² hammer HBM.
This variant keeps ALL final-stage compute at input resolution with 4x the
channels (full MXU lanes, 4x fewer spatial positions) and performs exactly
one depth-to-space at the very end:

- encoder/decoder: identical topology to the reference model,
- final stage: dual branch at input resolution —
  branch A: conv3x3 f→2f + GN + LeakyReLU (the "smooth" branch),
  branch B: conv3x3 f→2f + GN + LeakyReLU with ICNR-friendly init,
  fused by sigmoid(alpha), then conv3x3 2f→2f + GN + LeakyReLU and a 1x1
  conv to out_channels*4, followed by PixelShuffle(2) and sigmoid.

Same parameter order of magnitude, same training recipe; NOT
weight-compatible with the reference checkpoint (use model_type 'unet' for
that). Registered in the model zoo as ``unet_tpu``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from mri_superresolution_tpu.models.unet import (DoubleConv, Down, Up,
                                                 kaiming_fan_out,
                                                 icnr_kaiming_fan_in,
                                                 pixel_shuffle)


class UNetSuperResTPU(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    base_filters: int = 32
    initial_alpha: float = 0.0
    icnr_init: bool = True
    # Segmented rematerialization (see models/unet.py UNetSuperRes.remat):
    # same lifted transform, same unchanged param tree.
    remat: bool = False
    dtype: Any = jnp.bfloat16

    def setup(self):
        f = self.base_filters
        dt = self.dtype
        DC, Dn, Upb = ((nn.remat(DoubleConv), nn.remat(Down), nn.remat(Up))
                       if self.remat else (DoubleConv, Down, Up))
        self.inc = DC(f, dtype=dt)
        self.down1 = Dn(f * 2, dtype=dt)
        self.down2 = Dn(f * 4, dtype=dt)
        self.down3 = Dn(f * 8, dtype=dt)
        self.up1 = Upb(f * 4, dtype=dt)
        self.up2 = Upb(f * 2, dtype=dt)
        self.up3 = Upb(f, dtype=dt)

        self.branch_a_conv = nn.Conv(f * 2, (3, 3), padding=1, use_bias=False,
                                     dtype=dt, kernel_init=kaiming_fan_out())
        self.branch_a_norm = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=dt)
        init_b = (icnr_kaiming_fan_in(2) if self.icnr_init
                  else kaiming_fan_out())
        self.branch_b_conv = nn.Conv(f * 2, (3, 3), padding=1, use_bias=True,
                                     dtype=dt, kernel_init=init_b)
        self.branch_b_norm = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=dt)

        self.head_conv = nn.Conv(f * 2, (3, 3), padding=1, use_bias=False,
                                 dtype=dt, kernel_init=kaiming_fan_out())
        self.head_norm = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=dt)
        self.head_out = nn.Conv(self.out_channels * 4, (1, 1), use_bias=True,
                                dtype=dt, kernel_init=kaiming_fan_out())
        self.alpha = self.param(
            "alpha",
            lambda _: jnp.asarray(self.initial_alpha / 100.0, jnp.float32))

    def __call__(self, x):
        x = x.astype(self.dtype)
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        y = self.up1(x4, x3)
        y = self.up2(y, x2)
        y = self.up3(y, x1)

        cls = type(self)
        _ba = nn.remat(cls._branch_a) if self.remat else cls._branch_a
        _bb = nn.remat(cls._branch_b) if self.remat else cls._branch_b
        _head = nn.remat(cls._head) if self.remat else cls._head
        a = _ba(self, y)
        b = _bb(self, y)
        w = jax.nn.sigmoid(self.alpha).astype(self.dtype)
        y = w * a + (1.0 - w) * b
        return _head(self, y)

    def _branch_a(self, y):
        return nn.leaky_relu(self.branch_a_norm(self.branch_a_conv(y)), 0.2)

    def _branch_b(self, y):
        return nn.leaky_relu(self.branch_b_norm(self.branch_b_conv(y)), 0.2)

    def _head(self, y):
        y = nn.leaky_relu(self.head_norm(self.head_conv(y)), 0.2)
        y = self.head_out(y)          # (B, H, W, out*4), input resolution
        y = pixel_shuffle(y, 2)       # single terminal depth-to-space
        return jax.nn.sigmoid(y.astype(jnp.float32))
