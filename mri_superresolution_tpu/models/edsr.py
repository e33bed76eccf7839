"""EDSR-style 2x super-resolution model ('edsr').

The reference's sweep CLI advertises an ``edsr`` model type that was never
implemented (scripts/test_ssim_weights.py:106 lists choices
['simple','edsr','unet'] while train.py only accepts 'unet'). This provides
a real one: the EDSR-baseline topology (Lim et al. 2017, arXiv:1707.02921)
adapted to 1-channel [0,1] MRI slices — conv head, N residual blocks
(conv-ReLU-conv with residual scaling), global skip, PixelShuffle 2x tail,
sigmoid-bounded output so the CombinedLoss/metric stack applies unchanged.

TPU notes: constant channel width (base_filters) through the trunk keeps
every conv MXU-friendly; all compute happens at input resolution with one
terminal depth-to-space — the same property that makes unet_tpu fast.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from mri_superresolution_tpu.models.unet import kaiming_fan_out, pixel_shuffle


class ResBlock(nn.Module):
    features: int
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=kaiming_fan_out())(x)
        y = nn.relu(y)
        # Residual ZERO-init (the Fixup/EDSR-res_scale stabilizer, folded
        # into the init so the runtime graph keeps res_scale == 1.0 and
        # the functional serving paths stay valid): with kaiming init and
        # res_scale 1.0 an 8-block trunk's activations grow ~sqrt(depth),
        # the sigmoid output head saturates at init, gradients vanish, and
        # training collapses into the L1-optimal constant (the target
        # MEDIAN — all-black for background-dominated MRI slices; measured
        # val_ssim 0.795 / 17.9 dB at EVERY learning rate). Zero-init
        # makes every block the identity at init (trunk == head), the
        # head output stays moderate, and the same protocol trains to
        # the family's real ceiling (tools/edsr_convergence.py).
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros)(y)
        return x + self.res_scale * y


class EDSR(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    base_filters: int = 64
    num_blocks: int = 8
    # CAUTION: res_scale is not stored in the param tree, and the
    # functional serving paths (models/quant_forward._forward_edsr,
    # parallel/spatial._local_forward_edsr) assume this default — nothing
    # in the framework's configs/CLIs can change it, but a programmatic
    # caller overriding it must not route the checkpoint through
    # --quant int8 / --qat / --spatial_shards.
    res_scale: float = 1.0
    # per-ResBlock rematerialization (see models/unet.py UNetSuperRes.remat)
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        head = nn.Conv(self.base_filters, (3, 3), padding=1, dtype=self.dtype,
                       kernel_init=kaiming_fan_out(), name="head")(x)
        y = head
        RB = nn.remat(ResBlock) if self.remat else ResBlock
        for i in range(self.num_blocks):
            y = RB(self.base_filters, self.res_scale, self.dtype,
                   name=f"block{i}")(y)
        y = nn.Conv(self.base_filters, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=kaiming_fan_out(), name="body_out")(y)
        y = y + head  # global residual

        y = nn.Conv(self.out_channels * 4, (3, 3), padding=1,
                    dtype=self.dtype, kernel_init=kaiming_fan_out(),
                    name="tail")(y)
        y = pixel_shuffle(y, 2)
        return jax.nn.sigmoid(y.astype(jnp.float32))
