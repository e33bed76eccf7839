"""Spatially-sharded (sequence-parallel analogue) U-Net forward.

The reference is single-device and simply warns when a slice is large
(scripts/infer.py:119-121). This framework already scales large slices two
ways: batched full-volume DP and halo-tiled inference (infer/engine.py).
This module adds the third, fully TPU-native axis: the slice's ROW axis is
sharded over a ``space`` mesh axis and the exact forward runs under
``shard_map`` with explicit collectives —

- 3x3 convolutions exchange 1-row halos with mesh neighbors via
  ``lax.ppermute`` (unpaired edge devices receive zeros, which is exactly
  the zero padding the dense conv uses),
- GroupNorm statistics are whole-image by definition
  (models/unet.py DoubleConv), so local fp32 sums are combined with
  ``lax.psum`` over the ``space`` axis,
- the align_corners bilinear 2x row-upsample is position-dependent, so each
  device applies its own slice of the global upsample matrix (selected by
  ``lax.axis_index``) against a 1-row-haloed block — same matmul form as
  ops/resize.py, just restricted to the device's output rows,
- max-pool, pixel-shuffle, blending and the column-axis work are local.

The result is numerically equivalent to ``UNetSuperRes.apply`` on the
gathered input (tests/test_spatial.py asserts this on a (data, space) CPU
mesh) while activations, conv FLOPs and GroupNorm sums all scale 1/n_space
per device. For many small slices, batch DP remains the better axis (no
halo traffic); spatial sharding is the scaling story for slices too large
for one chip's HBM — the honest analogue of sequence parallelism for this
workload (SURVEY.md §2.2).

Constraints: global H must be divisible by 8 * n_space (three pool levels
stay shard-local), W by 8. Weights come from the SAME param tree as the
dense model, so any checkpoint (including converted torch ones) works.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 exposes shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from mri_superresolution_tpu.models import vgg as vgg_mod
from mri_superresolution_tpu.ops.functional import max_pool2, pixel_shuffle
from mri_superresolution_tpu.ops.resize import _align_corners_matrix
from mri_superresolution_tpu.ops.ssim import _gaussian_window_np, ssim_map

DATA_AXIS = "data"
SPACE_AXIS = "space"
_EPS = 1e-5


def make_spatial_mesh(n_data: int, n_space: int, devices=None) -> Mesh:
    """2-D (data, space) mesh over the first n_data*n_space devices."""
    if devices is None:
        from mri_superresolution_tpu.utils import backend
        devices = backend.devices()   # fail fast on a dead TPU tunnel
    devices = np.asarray(devices[: n_data * n_space])
    return Mesh(devices.reshape(n_data, n_space), (DATA_AXIS, SPACE_AXIS))


# ------------------------------------------------------------- collectives

def _halo_exchange(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Extend the local (B, h, W, C) row block with ``up`` rows from the
    previous device and ``down`` rows from the next one along SPACE_AXIS.
    Edge devices receive zeros (the dense conv's zero padding)."""
    n = lax.axis_size(SPACE_AXIS)
    parts = []
    if up:
        parts.append(lax.ppermute(x[:, -up:], SPACE_AXIS,
                                  [(i, i + 1) for i in range(n - 1)]))
    parts.append(x)
    if down:
        parts.append(lax.ppermute(x[:, :down], SPACE_AXIS,
                                  [(i + 1, i) for i in range(n - 1)]))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def _conv3x3(x, kernel, dilation: int = 1):
    """3x3 conv over a row-sharded block: halo rows replace row padding."""
    d = dilation
    x = _halo_exchange(x, d, d)
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((0, 0), (d, d)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv3x3_bias(x, kernel, bias, dilation: int = 1):
    return _conv3x3(x, kernel, dilation) + bias.astype(x.dtype)


def _conv1x1(x, kernel, bias=None):
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def _group_norm(x, scale, bias, n_groups: int = 8):
    """GroupNorm(8) with whole-image statistics: local fp32 sums psum'd
    over the space axis (exactly the dense op's value set, reordered)."""
    b, h, w, c = x.shape
    cg = c // n_groups
    xf = x.astype(jnp.float32).reshape(b, -1, n_groups, cg)
    s = lax.psum(jnp.sum(xf, axis=(1, 3)), SPACE_AXIS)
    sq = lax.psum(jnp.sum(jnp.square(xf), axis=(1, 3)), SPACE_AXIS)
    n_elems = h * w * cg * lax.axis_size(SPACE_AXIS)
    mean = s / n_elems
    var = sq / n_elems - jnp.square(mean)
    mul = lax.rsqrt(var + _EPS)
    mean_c = jnp.repeat(mean, cg, -1).reshape(b, 1, 1, c)
    mul_c = jnp.repeat(mul, cg, -1).reshape(b, 1, 1, c)
    y = (x.astype(jnp.float32) - mean_c) * mul_c
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _upsample_rows_matrices(h_global: int, n_space: int) -> np.ndarray:
    """Per-device slices of the align_corners 2x row-upsample matrix.

    Device d emits output rows [2*d*hl, 2*(d+1)*hl) from input rows
    [d*hl - 1, (d+1)*hl + 1) (a 1-row halo each side; align_corners taps
    never reach further). Returns (n_space, 2*hl, hl + 2)."""
    hl = h_global // n_space
    a = _align_corners_matrix(h_global, 2 * h_global)     # (2H, H)
    a = np.pad(np.asarray(a), ((0, 0), (1, 1)))           # zero halo columns
    return np.stack([a[2 * d * hl: 2 * (d + 1) * hl,
                       d * hl: (d + 1) * hl + 2] for d in range(n_space)])


def _upsample2x(x, row_mats: jnp.ndarray, w_mat: jnp.ndarray):
    """2x align_corners bilinear on a row-sharded block: device-specific
    row matmul (1-row halos) + full column matmul."""
    a_rows = jnp.take(row_mats, lax.axis_index(SPACE_AXIS), axis=0)
    x = _halo_exchange(x, 1, 1)
    y = jnp.einsum("oh,bhwc->bowc", a_rows.astype(x.dtype), x)
    return jnp.einsum("pw,bowc->bopc", w_mat.astype(x.dtype), y)


# --------------------------------------------- QAT fake-quant (row-sharded)

class _QCtx:
    """Per-trace fake-quant context for spatially-sharded QAT training.

    Spatial twin of models/quant_forward._Ctx mode='fakequant': ``scales``
    maps the SAME site names the dense fakequant forward uses to per-Cin
    activation scales; ``fg_mask`` is the per-sample foreground routing
    mask (identical on every space shard of a sample — the fraction is
    psum'd over the space axis before this ctx is built); ``amax``
    collects each site's LOCAL per-channel |x| max, pmax'd over both mesh
    axes by build_spatial_loss after the forward."""

    def __init__(self, scales, fg_mask):
        self.scales = scales
        self.fg_mask = fg_mask
        self.amax = {}


class _QServeCtx:
    """Frozen-scale int8 SERVING context for the row-sharded forwards.

    Spatial twin of models/quant_forward._Ctx mode='int8': ``scales`` maps
    the dense forward's site names to per-Cin activation scales; ``qweights``
    holds each site's precomputed ``(q_kernel, k_scale)`` with the
    activation scales folded in (quant_forward.int8_qweights — the SAME
    fold the dense int8 forward serves, so the two paths run identical
    integer arithmetic)."""

    def __init__(self, scales, qweights):
        self.scales = scales
        self.qweights = qweights


class _QCalibCtx:
    """Streaming-calibration context: the bf16 forward value, recording each
    site's LOCAL per-channel |x| max (dense quant_forward mode='calib' with
    percentile=100 — the engine's streaming path never uses percentiles,
    they are padding-fragile). build_spatial_calib_forward pmax's the
    records over both mesh axes, so the statistic equals the dense
    whole-batch max exactly (max is reorder-invariant)."""

    def __init__(self):
        self.amax = {}


def _fq(qctx, site: str, x, kernel):
    """Fake-quantize a conv's (input, kernel) at a quantizable site
    (no-op without a QAT ctx). Quantization is elementwise with
    replicated scales, so quantizing BEFORE the halo exchange equals the
    dense path's quantize of the full-row input — neighbor halo rows
    arrive already quantized by the identical map. Matches
    models/quant_forward._conv mode='fakequant' (STE gradients,
    foreground-routed activations, fg-masked recorded statistic)."""
    if qctx is None or site not in qctx.scales:
        return x, kernel
    from mri_superresolution_tpu.ops.quant import (fake_quant_act,
                                                   fake_quant_kernel, ste)
    ax = lax.stop_gradient(jnp.abs(x.astype(jnp.float32)))
    if qctx.fg_mask is not None:
        ax = jnp.where(qctx.fg_mask, ax, 0.0)
    qctx.amax[site] = jnp.max(ax.reshape(-1, x.shape[-1]), axis=0)
    s_a = qctx.scales[site]
    xq = ste(x, fake_quant_act(x, s_a))
    if qctx.fg_mask is not None:
        xq = jnp.where(qctx.fg_mask, xq, x)
    return xq, ste(kernel, fake_quant_kernel(kernel, s_a))


def _site_conv(qctx, site: str, x, kernel, *, dilation: int = 1, bias=None):
    """One QUANTIZABLE conv site on a row-sharded block, in any mode:

    - ``qctx is None``: the plain halo'd conv (row halos replace the dense
      row padding, columns pad locally);
    - ``_QCtx`` (QAT training): fake-quantized input/kernel, then the same
      float conv (``_fq`` above);
    - ``_QServeCtx`` (int8 serving): the input quantizes to s8 BEFORE the
      halo exchange — elementwise per-channel with replicated scales, so
      neighbor halo rows arrive exactly as the dense path's quantize of
      those rows, edge zeros are the quantize of the dense zero padding
      (quantize_tensor(0) == 0), and the s8 x s8 -> s32 accumulation is
      bit-identical to the dense int8 conv per output pixel. Halo traffic
      also shrinks 2-4x (s8 rows instead of bf16/fp32);
    - ``_QCalibCtx``: plain conv + per-channel |x| max recording.

    Kernel geometry is read off the kernel itself (rows halo by
    (kh//2)*dilation, columns pad by (kw//2)*dilation), so 1x1 sites
    degenerate to no exchange and edsr/simple's kxk trunks work unchanged.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph, pw = (kh // 2) * dilation, (kw // 2) * dilation
    if isinstance(qctx, _QServeCtx) and site in qctx.qweights:
        from mri_superresolution_tpu.ops.quant import quantize_tensor
        qk, k_scale = qctx.qweights[site]
        qx = _halo_exchange(quantize_tensor(x, qctx.scales[site]), ph, ph)
        acc = lax.conv_general_dilated(
            qx, qk, (1, 1), ((0, 0), (pw, pw)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * k_scale
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(x.dtype)
    if isinstance(qctx, _QCalibCtx):
        a = jnp.abs(x.astype(jnp.float32)).reshape(-1, x.shape[-1])
        qctx.amax[site] = jnp.max(a, axis=0)
        xq, k = x, kernel
    else:
        # an excluded int8 site must NOT fall into the fakequant path
        xq, k = _fq(qctx if isinstance(qctx, _QCtx) else None,
                    site, x, kernel)
    xh = _halo_exchange(xq, ph, ph)
    y = lax.conv_general_dilated(
        xh, k.astype(x.dtype), (1, 1), ((0, 0), (pw, pw)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


# ------------------------------------------------------------ model blocks

def _double_conv(p, x, dilation: int = 1, qctx=None, prefix: str = ""):
    in_ch = x.shape[-1]
    y = _site_conv(qctx, f"{prefix}.conv1", x, p["conv1"]["kernel"])
    y = jax.nn.leaky_relu(
        _group_norm(y, p["norm1"]["scale"], p["norm1"]["bias"]), 0.2)
    y = _site_conv(qctx, f"{prefix}.conv2", y, p["conv2"]["kernel"],
                   dilation=dilation)
    y = jax.nn.leaky_relu(
        _group_norm(y, p["norm2"]["scale"], p["norm2"]["bias"]), 0.2)
    if in_ch == y.shape[-1]:
        y = y + x
    return y


def _up_block(p, x1, x2, row_mats, w_mat, qctx=None, prefix: str = ""):
    """Up: 1x1 up_conv BEFORE the 2x upsample (models/unet.py Up), GN,
    lrelu, concat with the skip, DoubleConv."""
    y = _site_conv(qctx, f"{prefix}.up_conv", x1, p["up_conv"]["kernel"])
    y = _upsample2x(y, row_mats, w_mat)
    y = jax.nn.leaky_relu(
        _group_norm(y, p["up_norm"]["scale"], p["up_norm"]["bias"]), 0.2)
    assert y.shape[1:3] == x2.shape[1:3], (
        "spatial forward requires H % (8*n_space) == 0 and W % 8 == 0 so "
        "Up blocks never pad-to-match")
    return _double_conv(p["conv"], jnp.concatenate([x2, y], axis=-1),
                        qctx=qctx, prefix=f"{prefix}.conv")


def _maybe_ckpt(fn, remat: bool):
    """Per-block jax.checkpoint when remat is on: the backward re-runs the
    block (including its ppermute halos / psum stats — SPMD-identical
    across shards), so the tape holds only block boundaries."""
    return jax.checkpoint(fn) if remat else fn


def _backbone(params, x, row_mats_by_h, w_mats_by_w, dtype, remat=False,
              qctx=None):
    """Shared encoder/decoder (identical in both model families):
    returns the (B, h_local, W, f) decoder output before the final stage.
    ``qctx`` (QAT) is mutually exclusive with ``remat``: the fake-quant
    ctx collects tracers at trace time, which may not escape a
    jax.checkpoint scope (the dense path has the same restriction —
    model-side remat does not apply under QAT, train/trainer.py)."""
    assert qctx is None or not remat
    x = x.astype(dtype)
    if remat:
        # positional-only wrappers: site prefixes are strings (not JAX
        # types) and qctx is None here, so drop both before checkpointing
        _dcr, _ubr = jax.checkpoint(_double_conv), jax.checkpoint(_up_block)
        dc = lambda p, x, qctx=None, prefix="": _dcr(p, x)
        ub = (lambda p, x1, x2, rm, wm, qctx=None, prefix="":
              _ubr(p, x1, x2, rm, wm))
    else:
        dc, ub = _double_conv, _up_block

    x1 = dc(params["inc"], x, qctx=qctx, prefix="inc")
    x2 = dc(params["down1"]["conv"], max_pool2(x1), qctx=qctx,
            prefix="down1")
    x3 = dc(params["down2"]["conv"], max_pool2(x2), qctx=qctx,
            prefix="down2")
    x4 = dc(params["down3"]["conv"], max_pool2(x3), qctx=qctx,
            prefix="down3")

    h8, h4, _, _ = (x4.shape[1], x3.shape[1], x2.shape[1], x1.shape[1])
    w8, w4, _, _ = (x4.shape[2], x3.shape[2], x2.shape[2], x1.shape[2])
    y = ub(params["up1"], x4, x3, row_mats_by_h[h8], w_mats_by_w[w8],
           qctx=qctx, prefix="up1")
    y = ub(params["up2"], y, x2, row_mats_by_h[h4], w_mats_by_w[w4],
           qctx=qctx, prefix="up2")
    y = ub(params["up3"], y, x1, row_mats_by_h[x2.shape[1]],
           w_mats_by_w[x2.shape[2]], qctx=qctx, prefix="up3")
    return y


def _local_forward(params, x, row_mats_by_h, w_mats_by_w, dtype,
                   remat=False, qctx=None):
    """The full UNetSuperRes forward on one (B, h_local, W, 1) row block.
    Mirrors models/unet.py UNetSuperRes.__call__ exactly. ``qctx``
    fake-quantizes the same sites as the dense fakequant forward
    (models/quant_forward._forward_unet; the final_conv2 output head
    never quantizes)."""
    y = _backbone(params, x, row_mats_by_h, w_mats_by_w, dtype, remat,
                  qctx=qctx)
    h1, w1 = y.shape[1], y.shape[2]

    def bilinear_branch(p, y):
        yb = _upsample2x(y, row_mats_by_h[h1], w_mats_by_w[w1])
        yb = _site_conv(qctx, "final_up_conv", yb,
                        p["final_up_conv"]["kernel"])
        return jax.nn.leaky_relu(
            _group_norm(yb, p["final_up_norm"]["scale"],
                        p["final_up_norm"]["bias"]), 0.2)

    def shuffle_branch(p, y):
        ps = p["final_up_pixelshuffle"]
        yp = _site_conv(qctx, "final_up_pixelshuffle.conv", y,
                        ps["conv"]["kernel"], bias=ps["conv"]["bias"])
        yp = pixel_shuffle(yp)
        return jax.nn.leaky_relu(
            _group_norm(yp, ps["norm"]["scale"], ps["norm"]["bias"]), 0.2)

    def head(p, y):
        z = _site_conv(qctx, "final_conv1", y, p["final_conv1"]["kernel"])
        z = jax.nn.leaky_relu(
            _group_norm(z, p["final_norm"]["scale"],
                        p["final_norm"]["bias"]), 0.2)
        return _conv1x1(z, p["final_conv2"]["kernel"],
                        p["final_conv2"]["bias"])

    yb = _maybe_ckpt(bilinear_branch, remat)(params, y)
    yp = _maybe_ckpt(shuffle_branch, remat)(params, y)
    w_mix = jax.nn.sigmoid(params["alpha"]).astype(dtype)
    y = w_mix * yb + (1.0 - w_mix) * yp
    y = _maybe_ckpt(head, remat)(params, y)
    return jax.nn.sigmoid(y.astype(jnp.float32))


def _local_forward_tpu(params, x, row_mats_by_h, w_mats_by_w, dtype,
                       remat=False, qctx=None):
    """UNetSuperResTPU forward on one row block (models/unet_tpu.py):
    the final stage is dual 3x3 branches + head at INPUT resolution and a
    single terminal depth-to-space — all shard-local except the GN psums
    and the 3x3 halo exchanges, so it shards more easily than the parity
    model's bilinear branch. ``qctx`` fake-quantizes the dense fakequant
    sites (quant_forward._forward_unet_tpu; head_out stays bf16)."""
    y = _backbone(params, x, row_mats_by_h, w_mats_by_w, dtype, remat,
                  qctx=qctx)

    def branch_a(p, y):
        return jax.nn.leaky_relu(
            _group_norm(_site_conv(qctx, "branch_a_conv", y,
                                   p["branch_a_conv"]["kernel"]),
                        p["branch_a_norm"]["scale"],
                        p["branch_a_norm"]["bias"]), 0.2)

    def branch_b(p, y):
        return jax.nn.leaky_relu(
            _group_norm(_site_conv(qctx, "branch_b_conv", y,
                                   p["branch_b_conv"]["kernel"],
                                   bias=p["branch_b_conv"]["bias"]),
                        p["branch_b_norm"]["scale"],
                        p["branch_b_norm"]["bias"]), 0.2)

    def head(p, y):
        z = jax.nn.leaky_relu(
            _group_norm(_site_conv(qctx, "head_conv", y,
                                   p["head_conv"]["kernel"]),
                        p["head_norm"]["scale"],
                        p["head_norm"]["bias"]), 0.2)
        z = _conv1x1(z, p["head_out"]["kernel"], p["head_out"]["bias"])
        return pixel_shuffle(z, 2)

    a = _maybe_ckpt(branch_a, remat)(params, y)
    b = _maybe_ckpt(branch_b, remat)(params, y)
    w_mix = jax.nn.sigmoid(params["alpha"]).astype(y.dtype)
    y = w_mix * a + (1.0 - w_mix) * b
    y = _maybe_ckpt(head, remat)(params, y)
    return jax.nn.sigmoid(y.astype(jnp.float32))


def _conv_halo(x, kernel, bias=None):
    """General kxk conv on a row-sharded block: (kh//2)-row halos replace
    the dense row padding (zeros at the global edges), columns pad
    locally. Needs h_local >= kh//2, guaranteed by the H % (8*n_space)
    build-time check (h_local >= 8 and the zoo's largest kernel is 9)."""
    ph, pw = kernel.shape[0] // 2, kernel.shape[1] // 2
    x = _halo_exchange(x, ph, ph)
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((0, 0), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _local_forward_edsr(params, x, row_mats_by_h, w_mats_by_w, dtype,
                        remat=False, qctx=None):
    """EDSR forward on one row block (models/edsr.py): a constant-
    resolution trunk — the ONLY collectives are the 3x3 halo exchanges
    (no GroupNorm psums, no upsample matmuls; the terminal depth-to-space
    doubles rows within the shard). row/w mats are accepted for signature
    uniformity and unused. res_scale is the model's fixed default (1.0).
    ``qctx`` fake-quantizes the dense fakequant sites
    (quant_forward._forward_edsr; the tail stays bf16)."""
    del row_mats_by_h, w_mats_by_w
    x = x.astype(dtype)

    def block(p, y, prefix=""):
        z = jax.nn.relu(_site_conv(qctx, f"{prefix}.conv0", y,
                                   p["Conv_0"]["kernel"],
                                   bias=p["Conv_0"]["bias"]))
        z = _site_conv(qctx, f"{prefix}.conv1", z, p["Conv_1"]["kernel"],
                       bias=p["Conv_1"]["bias"])
        return y + 1.0 * z                   # x + res_scale*y, res_scale=1

    head = _site_conv(qctx, "head", x, params["head"]["kernel"],
                      bias=params["head"]["bias"])
    y = head
    if remat:
        _blkr = jax.checkpoint(block)                  # qctx None (str-free)
        blk = lambda p, y, prefix="": _blkr(p, y)
    else:
        blk = block
    for i in range(sum(1 for k in params if k.startswith("block"))):
        y = blk(params[f"block{i}"], y, prefix=f"block{i}")
    y = _site_conv(qctx, "body_out", y, params["body_out"]["kernel"],
                   bias=params["body_out"]["bias"])
    y = y + head
    y = _conv_halo(y, params["tail"]["kernel"], params["tail"]["bias"])
    y = pixel_shuffle(y, 2)
    return jax.nn.sigmoid(y.astype(jnp.float32))


def _local_forward_simple(params, x, row_mats_by_h, w_mats_by_w, dtype,
                          remat=False, qctx=None):
    """SimpleSR forward on one row block (models/simple.py): the 9-5-5
    trunk's halos are 4/2/2 rows; everything else is shard-local.
    ``qctx`` fake-quantizes extract/map (quant_forward._forward_simple;
    reconstruct is the output head)."""
    del row_mats_by_h, w_mats_by_w
    x = x.astype(dtype)
    y = jax.nn.relu(_site_conv(qctx, "extract", x,
                               params["extract"]["kernel"],
                               bias=params["extract"]["bias"]))
    y = jax.nn.relu(_site_conv(qctx, "map", y, params["map"]["kernel"],
                               bias=params["map"]["bias"]))
    y = _conv_halo(y, params["reconstruct"]["kernel"],
                   params["reconstruct"]["bias"])
    y = pixel_shuffle(y, 2)
    return jax.nn.sigmoid(y.astype(jnp.float32))


_LOCAL_FORWARDS = {"unet": _local_forward, "unet_tpu": _local_forward_tpu,
                   "edsr": _local_forward_edsr,
                   "simple": _local_forward_simple}


def supported_types():
    """Model types with a row-sharded topology (the engine/trainer gates
    read this instead of the private registry)."""
    return sorted(_LOCAL_FORWARDS)


def _make_local_forward(mesh: Mesh, input_hw, dtype, model_type: str,
                        remat: bool = False):
    """Validate shapes and return the per-shard forward closure with its
    static per-resolution upsample operators baked in."""
    if model_type not in _LOCAL_FORWARDS:
        raise ValueError(f"spatial sharding supports model types "
                         f"{sorted(_LOCAL_FORWARDS)}, not {model_type!r}")
    h, w = input_hw
    n_space = mesh.shape[SPACE_AXIS]
    if h % (8 * n_space) != 0:
        raise ValueError(f"H={h} must be divisible by 8*n_space={8 * n_space}")
    if w % 8 != 0:
        raise ValueError(f"W={w} must be divisible by 8")

    # Static per-resolution upsample operators (keyed by LOCAL row count /
    # global column count): decoder stages at H/8, H/4, H/2 and the final
    # stage at H; all built once at trace time. The trunk families
    # (edsr/simple) have no bilinear upsamples — skip the device arrays
    # their forwards would never read.
    row_mats_by_h = {}
    w_mats_by_w = {}
    if model_type in ("unet", "unet_tpu"):
        for s in (8, 4, 2, 1):
            hl = h // s // n_space
            row_mats_by_h[hl] = jnp.asarray(
                _upsample_rows_matrices(h // s, n_space), jnp.float32)
            w_mats_by_w[w // s] = jnp.asarray(
                np.asarray(_align_corners_matrix(w // s, 2 * (w // s))),
                jnp.float32)

    return partial(_LOCAL_FORWARDS[model_type], row_mats_by_h=row_mats_by_h,
                   w_mats_by_w=w_mats_by_w, dtype=dtype, remat=remat)


# ------------------------------------------------------------- public API

def build_spatial_forward_raw(mesh: Mesh, input_hw,
                              dtype: Any = jnp.bfloat16,
                              model_type: str = "unet"):
    """Unjitted row-sharded forward: the ``shard_map``-wrapped per-shard
    closure for a FIXED (H, W), traceable inside a larger jitted program
    (the engine's on-device TTA ensemble wraps it in a ``lax.fori_loop``
    body; GSPMD reshards the loop-carried member to the in_specs)."""
    fwd = _make_local_forward(mesh, input_hw, dtype, model_type)
    return shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, SPACE_AXIS, None, None)),
        out_specs=P(DATA_AXIS, SPACE_AXIS, None, None))


def spatial_input_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) sharding on a (data, space) mesh: batch over the data
    axis, rows over the space axis."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))


def build_spatial_forward(mesh: Mesh, input_hw, dtype: Any = jnp.bfloat16,
                          model_type: str = "unet"):
    """Compile a row-sharded forward over a (data, space) mesh.

    Returns ``fn(params, x)`` with x: (B, H, W, 1) fp32 global, B divisible
    by the data axis, H by 8*n_space, W by 8. The output is the (B, 2H, 2W,
    1) fp32 super-resolved batch, identical (to float tolerance) to
    ``model.apply`` with the same params. ``model_type`` selects the
    family: 'unet' (parity topology) or 'unet_tpu' (models/unet_tpu.py).
    """
    sharded = build_spatial_forward_raw(mesh, input_hw, dtype, model_type)
    x_sh = spatial_input_sharding(mesh)
    p_sh = NamedSharding(mesh, P())
    return jax.jit(sharded, in_shardings=(p_sh, x_sh), out_shardings=x_sh)


def build_spatial_int8_forward_raw(mesh: Mesh, input_hw, params, scales,
                                   model_type: str = "unet",
                                   dtype: Any = jnp.bfloat16,
                                   qweights=None):
    """Unjitted row-sharded FROZEN-SCALE int8 forward (VERDICT r4 item 3 —
    the last serving-matrix hole: ``--quant int8 --spatial_shards N``).

    Every site the dense int8 forward quantizes
    (models/quant_forward.int8_qweights — the identical fold of per-Cin
    activation scales into per-Cout int8 weights) runs here as an
    s8 x s8 -> s32 conv whose row halos are exchanged AFTER the quantize
    (_site_conv): quantization is elementwise with replicated scales, so
    edge math is bit-identical to the dense int8 conv, and halo ppermutes
    move s8 bytes (2-4x less ICI traffic than the bf16 forward's halos).
    The output heads and GroupNorms stay bf16, exactly like the dense path.
    Traceable inside a larger jitted program (the engine's on-device TTA
    ensemble wraps it, mirroring the dense frozen-int8 ensemble)."""
    from mri_superresolution_tpu.models import quant_forward
    fwd = _make_local_forward(mesh, input_hw, dtype, model_type)
    if qweights is None:     # callers serving many shapes precompute once
        qweights = quant_forward.int8_qweights(params, scales, model_type)
    sctx = _QServeCtx(
        {k: jnp.asarray(v, jnp.float32) for k, v in scales.items()},
        qweights)
    x4 = P(DATA_AXIS, SPACE_AXIS, None, None)
    return shard_map(lambda p, x: fwd(p, x, qctx=sctx), mesh=mesh,
                     in_specs=(P(), x4), out_specs=x4)


def build_spatial_calib_forward_raw(mesh: Mesh, input_hw, sites,
                                    model_type: str = "unet",
                                    dtype: Any = jnp.bfloat16):
    """Unjitted row-sharded CALIBRATION forward: ``fn(params, x) ->
    (y, amax)`` where y is the exact bf16 forward and ``amax`` maps each
    quantizable site to its per-input-channel |x| max over the GLOBAL
    batch (local max pmax'd over both mesh axes — max is reorder-
    invariant, so the statistic equals the dense calib forward's exactly
    up to the bf16 forward's psum-reordered GroupNorm rounding).

    ``sites`` is the dense forward's quantizable site list
    (quant_forward.amax_template keys): shard_map out_specs need the dict
    tree statically, and the assert pins the two enumerations together.
    Lets a spatially-sharded server calibrate WHILE serving its first
    batches at full precision, like the dense engine."""
    fwd = _make_local_forward(mesh, input_hw, dtype, model_type)
    sites = sorted(sites)

    def local(p, x):
        ctx = _QCalibCtx()
        y = fwd(p, x, qctx=ctx)
        missing = sorted(set(sites) ^ set(ctx.amax))
        assert not missing, (
            f"spatial calib sites out of sync with the dense forward's: "
            f"{missing}")
        amax = {k: lax.pmax(v, (DATA_AXIS, SPACE_AXIS))
                for k, v in ctx.amax.items()}
        return y, amax

    x4 = P(DATA_AXIS, SPACE_AXIS, None, None)
    return shard_map(local, mesh=mesh, in_specs=(P(), x4),
                     out_specs=(x4, {k: P() for k in sites}))


# ----------------------------------------------- sharded training loss (SP)

def _separable_blur_sharded(x, window_size: int, sigma: float):
    """Row-sharded version of ops/ssim._separable_blur: the dense op's zero
    ROW padding is replaced by a (window//2)-row halo exchange (edge devices
    receive zeros — exactly the dense padding), columns pad locally. fp32
    HIGHEST precision for metric parity (ops/ssim.py:56-58)."""
    c = x.shape[-1]
    g = _gaussian_window_np(window_size, sigma)
    kh = jnp.tile(jnp.asarray(g.reshape(window_size, 1, 1, 1)), (1, 1, 1, c))
    kw = jnp.tile(jnp.asarray(g.reshape(1, window_size, 1, 1)), (1, 1, 1, c))
    pad = window_size // 2
    xh = _halo_exchange(x, pad, pad)
    dn = lax.conv_dimension_numbers(xh.shape, kh.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(xh, kh, (1, 1), [(0, 0), (0, 0)],
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    return lax.conv_general_dilated(y, kw, (1, 1), [(0, 0), (pad, pad)],
                                    dimension_numbers=dn,
                                    feature_group_count=c,
                                    precision=lax.Precision.HIGHEST)


def _mean_hwc_sharded(x):
    """Per-sample mean over (global rows, W, C) of a row-sharded block:
    local fp32 sum + psum over the space axis."""
    s = lax.psum(jnp.sum(x, axis=(1, 2, 3)), SPACE_AXIS)
    n = x.shape[1] * lax.axis_size(SPACE_AXIS) * x.shape[2] * x.shape[3]
    return s / n


def _ssim_per_sample_sharded(img1, img2, window_size: int, sigma: float,
                             val_range: float):
    """Per-sample SSIM of row-sharded NHWC blocks: ops/ssim.ssim_map (the
    single copy of the SSIM formula) with the halo'd blur injected, then a
    psum'd mean. Identical on every space shard."""
    smap = ssim_map(img1, img2, window_size, sigma, val_range,
                    blur_fn=lambda t: _separable_blur_sharded(
                        t, window_size, sigma))
    return _mean_hwc_sharded(smap)


def _weighted_mean_global(per_sample, w):
    """Weighted mean over the GLOBAL batch (psum over the data axis) —
    losses/combined.py _weighted_mean, distributed."""
    num = lax.psum(jnp.sum(per_sample * w.astype(jnp.float32)), DATA_AXIS)
    den = lax.psum(jnp.sum(w.astype(jnp.float32)), DATA_AXIS)
    return num / jnp.maximum(den, 1e-12)


def _halo_conv3x3_bias(x, kern, bias):
    """VGG's padded 3x3 conv on a row-sharded block: 1-row halos replace
    the dense row padding (zeros at global edges, via ppermute)."""
    xh = _halo_exchange(x, 1, 1)
    dn = lax.conv_dimension_numbers(xh.shape, kern.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        xh, kern, (1, 1), [(0, 0), (1, 1)], dimension_numbers=dn) + bias


def _local_pool2(x):
    """Shard-local 2x2 maxpool; alignment is validated at build time
    (build_spatial_loss), so the stride-2 windows never straddle a shard
    boundary."""
    if x.shape[1] % 2 != 0:
        raise ValueError(
            f"sharded VGG pool hit odd local rows ({x.shape[1]}) — "
            "build_spatial_loss validation should have rejected this config")
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _vgg_features_sharded(vgg_params, x, feature_layer_idx: int):
    """models/vgg.extract_features (the single copy of the VGG19 layer
    loop) on a row-sharded block: the 3x3 convs take 1-row halos, the 2x2
    maxpools and ReLUs are shard-local."""
    return vgg_mod.extract_features(vgg_params, x, feature_layer_idx,
                                    conv_fn=_halo_conv3x3_bias,
                                    pool_fn=_local_pool2)


_COMP_KEYS = ("l1_loss", "ssim_loss", "ssim_metric", "perceptual_loss")


def build_spatial_loss(mesh: Mesh, input_hw, loss_cfg,
                       model_type: str = "unet", dtype: Any = jnp.bfloat16,
                       vgg_params=None, remat: bool = False,
                       qat_sites=None, qat_min_foreground: float = 0.05):
    """Row-sharded forward + CombinedLoss over a (data, space) mesh.

    Returns ``loss_fn(params, hr, lr, weights) -> (total, comps, out)`` —
    a ``shard_map`` whose scalar outputs are fully replicated (psum over
    both mesh axes), so ``jax.grad`` THROUGH it yields the exact replicated
    parameter gradient: the transposes of ``ppermute`` (halo exchange),
    ``psum`` (GroupNorm stats, loss means) and the replicated-params
    broadcast are inserted by JAX automatically. Semantics match
    losses/combined.py CombinedLoss (reference utils/losses.py:153-240),
    including the stop-gradient on target VGG features; ``comps`` always
    carries all of {l1_loss, ssim_loss, ssim_metric, perceptual_loss}
    (zeros for disabled terms, so the shard_map output tree is static).

    ``input_hw`` is the LR input size: H % (8*n_space) == 0, W % 8 == 0.
    The perceptual term runs the VGG stack row-sharded too
    (_vgg_features_sharded) — per-device VGG activation memory scales
    1/n_space, same as the model's. ``remat`` additionally recomputes the
    forward in the backward (jax.checkpoint), stacking the two memory
    levers: 1/n_space sharding x no activation tape.

    ``qat_sites`` (a list of the dense fakequant forward's site names,
    e.g. ``list(quant_forward.amax_template(...))``) switches the forward
    to quantization-aware training: the returned function becomes
    ``loss_fn(params, qat_amax, hr, lr, weights)`` whose comps carry the
    trainer's QAT contract — ``qat_batch_amax`` (per-site per-channel
    foreground-masked |x| max, pmax'd over BOTH mesh axes so it equals
    the dense batch statistic exactly) and ``qat_any_fg``. Foreground
    routing is per GLOBAL sample (the local fractions psum over the space
    axis before thresholding, so every row shard of a sample takes the
    same branch — the dense per-sample decision). Model-side remat does
    not compose with QAT (trace-time ctx), matching the dense trainer;
    the loss-graph checkpoint below still applies.
    """
    from mri_superresolution_tpu.losses.combined import compose_loss

    loss_cfg.validate()
    if loss_cfg.perceptual_weight > 0 and vgg_params is None:
        raise ValueError("perceptual_weight > 0 requires vgg_params")
    qat_on = qat_sites is not None
    # remat segments PER BLOCK inside the local forward (_maybe_ckpt): a
    # single whole-forward jax.checkpoint was measured a no-op for peak
    # memory (tools/bench_remat_mem.py) — the recompute-and-differentiate
    # pass holds the same working set as forward+backward fused.
    fwd = _make_local_forward(mesh, input_hw, dtype, model_type,
                              remat and not qat_on)
    cfg = loss_cfg
    h, _ = input_hw
    n_space = mesh.shape[SPACE_AXIS]
    hr_local_rows = 2 * h // n_space

    # The SSIM blur reaches window//2 rows into each neighbor; a halo
    # deeper than one shard would need multi-hop exchange (and an even
    # window would change the output row count vs the dense op).
    if cfg.window_size % 2 != 1:
        raise ValueError(f"window_size must be odd for spatial sharding "
                         f"(got {cfg.window_size})")
    if cfg.window_size // 2 > hr_local_rows:
        raise ValueError(
            f"SSIM window {cfg.window_size} needs a {cfg.window_size // 2}-"
            f"row halo but each shard only holds {hr_local_rows} HR rows; "
            f"reduce spatial_shards or window_size")
    if cfg.perceptual_weight > 0:
        pools = vgg_mod.n_pools(cfg.vgg_layer_idx)
        if hr_local_rows % (2 ** pools) != 0:
            raise ValueError(
                f"sharded VGG perceptual loss crosses {pools} 2x2 pools, "
                f"so local HR rows ({hr_local_rows} = 2*{h}/{n_space}) must "
                f"be divisible by {2 ** pools}; use a conforming H / "
                f"spatial_shards or a smaller vgg_layer_idx")

    def loss_part(out32, hr32, w):
        return compose_loss(
            cfg, out32, hr32, w,
            per_sample_mean=_mean_hwc_sharded,
            weighted_mean=_weighted_mean_global,
            ssim_per_sample=lambda a, b: _ssim_per_sample_sharded(
                a, b, cfg.window_size, cfg.sigma, cfg.val_range),
            vgg_features=lambda x: _vgg_features_sharded(
                vgg_params, x, cfg.vgg_layer_idx),
            always_ssim_metric=True)

    if remat:
        # checkpoint the loss graph too: the backward re-runs the SSIM
        # blurs / VGG stack (and their psums) instead of holding their tape
        loss_part = jax.checkpoint(loss_part)

    x4 = P(DATA_AXIS, SPACE_AXIS, None, None)

    if not qat_on:
        def local(params, hr, lo, w):
            out = fwd(params, lo)                  # fp32 in [0,1]
            zero = jnp.asarray(0.0, jnp.float32)
            total, comps_in = loss_part(out.astype(jnp.float32),
                                        hr.astype(jnp.float32), w)
            # static comps tree: the shard_map out_specs require every key
            comps = {k: comps_in.get(k, zero) for k in _COMP_KEYS}
            return total, comps, out

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), x4, x4, P(DATA_AXIS)),
            out_specs=(P(), {k: P() for k in _COMP_KEYS}, x4))

    from mri_superresolution_tpu.ops.quant import FOREGROUND_INTENSITY

    def local_qat(params, qat_amax, hr, lo, w):
        # per-site scales from the trainer's running range (replicated) —
        # same map as the dense fakequant forward
        scales = {k: jnp.where(jnp.asarray(v, jnp.float32) > 0,
                               jnp.asarray(v, jnp.float32) / 127.0, 1.0)
                  for k, v in qat_amax.items()}
        # foreground fraction of the GLOBAL sample: local count psum'd
        # over the space axis, so all row shards route a sample together
        lo32 = lo.astype(jnp.float32)
        cnt = lax.psum(jnp.sum(
            (jnp.abs(lo32) > FOREGROUND_INTENSITY).astype(jnp.float32),
            axis=tuple(range(1, lo.ndim))), SPACE_AXIS)
        n_px = (lo.shape[1] * lax.axis_size(SPACE_AXIS)
                * int(np.prod(lo.shape[2:])))
        mask = (cnt / n_px >= qat_min_foreground).reshape(
            (lo.shape[0],) + (1,) * (lo.ndim - 1))
        qctx = _QCtx(scales, mask)
        out = fwd(params, lo, qctx=qctx)
        zero = jnp.asarray(0.0, jnp.float32)
        total, comps_in = loss_part(out.astype(jnp.float32),
                                    hr.astype(jnp.float32), w)
        comps = {k: comps_in.get(k, zero) for k in _COMP_KEYS}
        missing = sorted(set(qat_sites) ^ set(qctx.amax))
        assert not missing, (
            f"spatial fakequant sites out of sync with the dense "
            f"forward's: {missing}")
        # batch statistic over the GLOBAL batch: pmax over both mesh axes
        # == the dense jnp.max over all samples x pixels
        comps["qat_batch_amax"] = {
            k: lax.pmax(v, (DATA_AXIS, SPACE_AXIS))
            for k, v in qctx.amax.items()}
        comps["qat_any_fg"] = lax.pmax(
            jnp.any(mask).astype(jnp.int32), (DATA_AXIS, SPACE_AXIS)) > 0
        return total, comps, out

    comp_specs = {k: P() for k in _COMP_KEYS}
    comp_specs["qat_batch_amax"] = {k: P() for k in qat_sites}
    comp_specs["qat_any_fg"] = P()
    return shard_map(
        local_qat, mesh=mesh,
        in_specs=(P(), {k: P() for k in qat_sites}, x4, x4, P(DATA_AXIS)),
        out_specs=(P(), comp_specs, x4))
