"""U-Net for 2x MRI super-resolution — Flax/linen, NHWC, bf16-ready.

Reproduces the topology of the reference ``UNetSuperRes``
(models/unet_model.py:116-211): 3 maxpool Down stages, 3 bilinear Up stages
with skip concatenation, a dual-branch final 2x upsample (bilinear+conv vs.
PixelShuffle) fused by a learned ``sigmoid(alpha)``, and a sigmoid-bounded
1-channel output.

TPU-first design decisions:
- NHWC layout throughout (TPU conv-friendly); weights are HWIO.
- Compute dtype is configurable (bfloat16 by default in training); params
  are always fp32 masters. The final sigmoid output is returned in fp32.
- Bilinear align_corners=True upsampling is expressed as two small matmuls
  (see ops/resize.py) rather than gathers.
- PixelShuffle is a reshape/transpose with torch-compatible channel order
  (input channel ``c*r*r + i*r + j`` → output channel ``c`` at offset
  ``(i, j)``) so reference checkpoints convert losslessly.

Initialization parity: the reference's ``_initialize_weights``
(models/unet_model.py:177-187) runs *after* the ICNR init inside
``PixelShuffleUp.__init__`` and overwrites it with Kaiming — so the shipped
reference model is Kaiming-everything. We default to that behavior and
expose ``icnr_init=True`` to opt into the (intended) ICNR initialization.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from mri_superresolution_tpu.experiments import phase as phase_ops
from mri_superresolution_tpu.ops.resize import upsample_bilinear_align_corners

# Kaiming He normal, mode='fan_out', nonlinearity='leaky_relu' with torch's
# default negative_slope param (0.01): gain^2 = 2 / (1 + 0.01^2)
_KAIMING_SCALE = 2.0 / (1.0 + 0.01 ** 2)


def kaiming_fan_out():
    return nn.initializers.variance_scaling(
        _KAIMING_SCALE, mode="fan_out", distribution="normal")


def icnr_kaiming_fan_in(scale: int = 2):
    """ICNR init (reference models/unet_model.py:6-15): draw a Kaiming-normal
    (fan_in, torch default) kernel with out_c/scale² sub-band channels, then
    repeat each sub-band scale² times along the output axis so PixelShuffle
    starts as a checkerboard-free nearest-neighbor upsample."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, in_c, out_c = shape
        sub_c = out_c // (scale ** 2)
        base = nn.initializers.variance_scaling(
            _KAIMING_SCALE, mode="fan_in", distribution="normal")(
                key, (kh, kw, in_c, sub_c), dtype)
        return jnp.repeat(base, scale ** 2, axis=-1)

    return init


# canonical definition shared with the functional forwards
from mri_superresolution_tpu.ops.functional import pixel_shuffle  # noqa: E402,F401


class ConvParams(nn.Module):
    """Owns an nn.Conv-compatible param subtree ({kernel[, bias]}) without
    dictating how the conv is computed — lets the phase-space final stage
    rescatter the same weights, keeping checkpoints interchangeable with the
    nn.Conv layout (same names, same shapes, same init)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    use_bias: bool = False
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, in_ch: int):
        init = self.kernel_init or kaiming_fan_out()
        k = self.param("kernel", init,
                       (*self.kernel_size, in_ch, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return k, b


class NormParams(nn.Module):
    """nn.GroupNorm-compatible param subtree ({scale, bias}) for manual
    (phase-space) normalization."""

    @nn.compact
    def __call__(self, ch: int):
        return (self.param("scale", nn.initializers.ones, (ch,)),
                self.param("bias", nn.initializers.zeros, (ch,)))


class DoubleConv(nn.Module):
    """(Conv3x3 → GroupNorm(8) → LeakyReLU(0.2)) x2, residual when channels
    match (reference models/unet_model.py:17-45)."""

    out_channels: int
    mid_channels: Optional[int] = None
    dilation: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        mid = self.mid_channels or self.out_channels
        self.conv1 = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                             dtype=self.dtype, kernel_init=kaiming_fan_out())
        self.norm1 = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype)
        d = self.dilation
        self.conv2 = nn.Conv(self.out_channels, (3, 3), padding=d,
                             kernel_dilation=(d, d), use_bias=False,
                             dtype=self.dtype, kernel_init=kaiming_fan_out())
        self.norm2 = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype)

    def __call__(self, x):
        in_channels = x.shape[-1]
        y = nn.leaky_relu(self.norm1(self.conv1(x)), 0.2)
        y = nn.leaky_relu(self.norm2(self.conv2(y)), 0.2)
        if in_channels == self.out_channels:
            y = y + x
        return y


class Down(nn.Module):
    """MaxPool(2) then DoubleConv (reference models/unet_model.py:47-57)."""

    out_channels: int
    dtype: Any = jnp.float32

    def setup(self):
        self.conv = DoubleConv(self.out_channels, dtype=self.dtype)

    def __call__(self, x):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return self.conv(x)


class Up(nn.Module):
    """Bilinear 2x (align_corners) + 1x1 conv halving channels, pad-to-match,
    skip concat, DoubleConv (reference models/unet_model.py:59-94)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        in_ch_up = x1.shape[-1]
        # The 1x1 channel-mixing conv commutes exactly with the per-channel
        # bilinear upsample (both linear, acting on disjoint axes), so run it
        # BEFORE the 2x upsample: 1/4 the conv FLOPs, half the upsample
        # matmul FLOPs, and the 2x-res intermediate carries half the
        # channels. The reference orders it upsample-first
        # (models/unet_model.py:69-77); outputs are equal to fp tolerance
        # and the param tree is unchanged. GroupNorm stays after the
        # upsample — its statistics are over the upsampled pixels.
        x1 = nn.Conv(in_ch_up // 2, (1, 1), use_bias=False, dtype=self.dtype,
                     kernel_init=kaiming_fan_out(), name="up_conv")(x1)
        x1 = upsample_bilinear_align_corners(x1, 2)
        x1 = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                          name="up_norm")(x1)
        x1 = nn.leaky_relu(x1, 0.2)

        # Pad x1 to x2's spatial size (shapes static under jit; zero pad,
        # split left/right like torch F.pad at models/unet_model.py:86-90).
        dy = x2.shape[1] - x1.shape[1]
        dx = x2.shape[2] - x1.shape[2]
        if dy != 0 or dx != 0:
            x1 = jnp.pad(x1, ((0, 0), (dy // 2, dy - dy // 2),
                              (dx // 2, dx - dx // 2), (0, 0)))

        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_channels, dtype=self.dtype, name="conv")(x)


class PixelShuffleUp(nn.Module):
    """Conv3x3 → PixelShuffle(scale) → GroupNorm(8) → LeakyReLU(0.2)
    (reference models/unet_model.py:96-114)."""

    out_channels: int
    scale: int = 2
    icnr_init: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, phase_out: bool = False):
        init = (icnr_kaiming_fan_in(self.scale) if self.icnr_init
                else kaiming_fan_out())
        x = nn.Conv(self.out_channels * self.scale ** 2, (3, 3), padding=1,
                    use_bias=True, dtype=self.dtype, kernel_init=init,
                    name="conv")(x)
        if phase_out:
            # The conv's channel order (torch PixelShuffle convention) IS
            # c-major phase space of the shuffled tensor: skip the shuffle,
            # normalize in phase space (exact same GroupNorm statistics).
            scale, bias = NormParams(name="norm")(self.out_channels)
            x = phase_ops.phase_group_norm(x, scale, bias, n_groups=8,
                                           dtype=self.dtype)
            return nn.leaky_relu(x, 0.2)
        x = pixel_shuffle(x, self.scale)
        x = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                         name="norm")(x)
        return nn.leaky_relu(x, 0.2)


class UNetSuperRes(nn.Module):
    """2x super-resolution U-Net (reference models/unet_model.py:116-211).

    Input: (B, H, W, in_channels) in [0, 1]. Output: (B, 2H, 2W,
    out_channels) in (0, 1), fp32.
    """

    in_channels: int = 1
    out_channels: int = 1
    base_filters: int = 32
    initial_alpha: float = 0.0   # percentage (0-100), normalized to [0,1]
    icnr_init: bool = False
    # Compute the final 2x stage in phase space (exact space-to-depth
    # algebra, experiments/phase.py). MEASURED NEGATIVE RESULT on v5e (kept as an
    # opt-in experiment, default off): the hypothesis was that the stage's
    # Cout<=16 convs at 512^2 starve the MXU's 128 output lanes, but XLA's
    # own conv lowering already sustains ~29 TFLOP/s there (past the naive
    # 16/128-lane bound), so the rescattered 2x2 convs (16/9 the MACs at
    # better lane use) win only ~0.7 ms each — while the required layout ops
    # cost far more (tools/bench_phase_probe2.py, B=128: phase upsample
    # +6.5 ms vs dense; align_phase 8-13 ms; strided-channel GN stat views
    # 30 ms). Net: 1290 -> 905 slices/s/chip. The math is exact either way
    # (tests/test_phase.py) and the param tree is identical, so checkpoints
    # are interchangeable across the flag.
    phase_final: bool = False
    # Segmented rematerialization (flax.linen.remat around each encoder/
    # decoder block): the backward recomputes block interiors instead of
    # holding them, so the training tape keeps only block-boundary
    # activations. Param tree is UNCHANGED (lifted transform), so
    # checkpoints are interchangeable across the flag. A single
    # whole-forward jax.checkpoint was measured a no-op for peak memory
    # (tools/bench_remat_mem.py) — segmentation is what saves.
    remat: bool = False
    dtype: Any = jnp.float32

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

        # Both final-stage variants share one param layout (ConvParams /
        # NormParams subtrees are name- and shape-identical to nn.Conv /
        # nn.GroupNorm), so phase_final can be flipped on any checkpoint.
        if self.phase_final:
            self.final_up_conv = ConvParams(f // 2, (3, 3))
            self.final_up_norm = NormParams()
            self.final_conv1 = ConvParams(f // 2, (3, 3))
            self.final_norm = NormParams()
            self.final_conv2 = ConvParams(self.out_channels, (1, 1),
                                          use_bias=True)
        else:
            self.final_up_conv = nn.Conv(
                f // 2, (3, 3), padding=1, use_bias=False, dtype=dt,
                kernel_init=kaiming_fan_out())
            self.final_up_norm = nn.GroupNorm(num_groups=8, epsilon=1e-5,
                                              dtype=dt)
            self.final_conv1 = nn.Conv(
                f // 2, (3, 3), padding=1, use_bias=False, dtype=dt,
                kernel_init=kaiming_fan_out())
            self.final_norm = nn.GroupNorm(num_groups=8, epsilon=1e-5,
                                           dtype=dt)
            self.final_conv2 = nn.Conv(self.out_channels, (1, 1),
                                       use_bias=True, dtype=dt,
                                       kernel_init=kaiming_fan_out())
        # no remat wrap under phase_final: the phase path calls this with
        # the Python-bool phase_out=True, which nn.remat would turn into a
        # tracer and crash the `if phase_out:` branch
        PSU = (nn.remat(PixelShuffleUp)
               if self.remat and not self.phase_final else PixelShuffleUp)
        self.final_up_pixelshuffle = PSU(
            f // 2, icnr_init=self.icnr_init, dtype=dt)
        # Learned fusion weight (reference models/unet_model.py:160-163):
        # initial_alpha is a percentage, normalized to [0, 1].
        self.alpha = self.param(
            "alpha",
            lambda _: jnp.asarray(self.initial_alpha / 100.0, jnp.float32))

    def __call__(self, x):
        x = x.astype(self.dtype)

        # Encoder
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)

        # Decoder with skips
        y = self.up1(x4, x3)
        y = self.up2(y, x2)
        y = self.up3(y, x1)

        if self.phase_final:
            return self._final_stage_phase(y)

        # Dual-branch final 2x upsample; each branch + head is its own
        # remat segment (they hold the model's largest 2Hx2W activations)
        cls = type(self)
        _bil = nn.remat(cls._bilinear_branch) if self.remat \
            else cls._bilinear_branch
        _head = nn.remat(cls._final_head) if self.remat else cls._final_head
        yb = _bil(self, y)
        yp = self.final_up_pixelshuffle(y)

        w = jax.nn.sigmoid(self.alpha).astype(self.dtype)
        y = w * yb + (1.0 - w) * yp
        return _head(self, y)

    def _bilinear_branch(self, y):
        yb = upsample_bilinear_align_corners(y, 2)
        return nn.leaky_relu(self.final_up_norm(self.final_up_conv(yb)), 0.2)

    def _final_head(self, y):
        y = nn.leaky_relu(self.final_norm(self.final_conv1(y)), 0.2)
        y = self.final_conv2(y)
        return jax.nn.sigmoid(y.astype(jnp.float32))

    def _final_stage_phase(self, y):
        """The dual-branch final 2x stage, computed entirely at y's
        resolution in c-major phase space (experiments/phase.py). Mathematically
        identical to the module path above; ~2x less MXU time because the
        Cout=16 convs at 2Hx2W become Cout=64 convs at HxW."""
        dt = self.dtype
        f = self.base_filters

        # Bilinear branch: phase-space upsample, rescattered 2x2 conv,
        # GroupNorm on the re-aligned grid.
        t_up = phase_ops.upsample_bilinear_phases(y)          # (B,H,W,4f)
        k_up, _ = self.final_up_conv(f)
        z_up = phase_ops.phase_conv_2x2(
            t_up, phase_ops.phase_kernel_2x2(k_up).astype(dt))
        yb = phase_ops.align_phase(z_up)                      # (B,H,W,2f)
        s_up, b_up = self.final_up_norm(f // 2)
        yb = nn.leaky_relu(
            phase_ops.phase_group_norm(yb, s_up, b_up, n_groups=8, dtype=dt),
            0.2)

        # PixelShuffle branch: the conv's output already IS phase space.
        yp = self.final_up_pixelshuffle(y, phase_out=True)    # (B,H,W,2f)

        w = jax.nn.sigmoid(self.alpha).astype(dt)
        t = w * yb + (1.0 - w) * yp

        # final_conv1 stays misaligned through the per-pixel tail; the
        # offsets are absorbed by depth_to_space_rev_crop at the end.
        k1, _ = self.final_conv1(f // 2)
        z1 = phase_ops.phase_conv_2x2(
            t, phase_ops.phase_kernel_2x2(k1).astype(dt))     # (B,H+1,W+1,2f)
        s1, b1 = self.final_norm(f // 2)
        z1 = nn.leaky_relu(
            phase_ops.phase_group_norm_misaligned(z1, s1, b1, n_groups=8,
                                                  dtype=dt), 0.2)

        k2, b2 = self.final_conv2(f // 2)
        z2 = lax.conv_general_dilated(
            z1, phase_ops.phase_kernel_1x1(k2).astype(dt), (1, 1),
            ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        z2 = z2 + jnp.repeat(b2, 4).astype(dt)
        return phase_ops.depth_to_space_rev_crop(
            jax.nn.sigmoid(z2.astype(jnp.float32)))


def init_params(model: UNetSuperRes, rng: jax.Array,
                input_hw=(64, 64)) -> dict:
    """Initialize a parameter pytree for the model."""
    dummy = jnp.zeros((1, input_hw[0], input_hw[1], model.in_channels),
                      jnp.float32)
    return model.init(rng, dummy)["params"]


def param_count(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))
