"""Functional model-zoo forwards with int8 post-training quantization.

Serving-side companion to models/{unet,unet_tpu,edsr,simple}.py: consumes
the SAME parameter tree as ``model.apply`` (any checkpoint works, including
converted torch ones) but expresses the forward as plain functions so every
conv site can run in one of three modes sharing one code path:

- ``ref``   — bf16, numerically identical to ``model.apply`` (asserted by
              tests/test_quant.py), the correctness anchor;
- ``calib`` — ref compute + record each conv input's per-channel
              percentile-clipped |x|, producing static activation scales;
- ``int8``  — s8 x s8 -> s32 convs (ops/quant.py) with per-output-channel
              weight scales; the per-input-channel activation scales are
              folded into the weights (zero serving cost).

The output-head conv (``final_conv2`` / ``head_out`` / edsr's ``tail`` /
simple's ``reconstruct``) stays bf16: it feeds the sigmoid output
directly, costs a small fraction of the FLOPs, and keeping it
full-precision removes the largest quality term for free. GroupNorm,
LeakyReLU, bilinear upsampling and pixel-shuffle stay bf16 (bandwidth-bound,
no MXU benefit) — but their writes fuse with the following site's static
quantize, so activations still cross HBM as int8 where it matters.

The reference has no quantized inference (fp16 CUDA autocast only,
scripts/infer.py:26-31); this is a TPU-native extension measured at
1.78-2.02x per conv (tools/bench_int8_probe.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mri_superresolution_tpu.ops.functional import (group_norm_leaky_ref,
                                                    max_pool2, pixel_shuffle)
from mri_superresolution_tpu.ops.quant import (fake_quant_act,
                                               fake_quant_kernel, int8_conv,
                                               quantize_tensor, ste,
                                               weight_qparams)
from mri_superresolution_tpu.ops.resize import upsample_bilinear_align_corners


class _Ctx:
    """Per-trace context: mode + scale tables + calib-amax accumulator."""

    def __init__(self, mode: str = "ref",
                 scales: Optional[Dict[str, float]] = None,
                 qweights: Optional[Dict[str, Tuple]] = None,
                 percentile: float = 100.0,
                 fg_mask: Optional[jnp.ndarray] = None):
        assert mode in ("ref", "calib", "int8", "fakequant")
        self.mode = mode
        self.scales = scales or {}
        self.qweights = qweights or {}
        self.amax: Dict[str, jnp.ndarray] = {}
        self.percentile = percentile
        # fakequant only: (B,1,1,1) bool — samples with enough foreground
        # to quantize (mirrors the serving engine's near-empty bf16
        # routing); background samples keep full-precision activations
        self.fg_mask = fg_mask


def _conv(ctx: _Ctx, site: str, kernel, x, *, padding: int = 1,
          bias=None) -> jnp.ndarray:
    if ctx.mode == "int8" and site in ctx.qweights:
        qk, sk = ctx.qweights[site]
        return int8_conv(quantize_tensor(x, ctx.scales[site]), qk, sk,
                         bias=bias, padding=padding, out_dtype=x.dtype)
    if ctx.mode == "fakequant" and site in ctx.scales:
        # QAT: simulate the int8 serving arithmetic in float (same folded
        # per-Cin activation scales + per-Cout weight scales as the int8
        # mode above) with straight-through gradients, and record the
        # batch's per-channel |x| so the trainer can update its running
        # activation-range estimate (train/trainer.py QAT state).
        #
        # Foreground routing: activations quantize only for samples with
        # enough anatomy (ctx.fg_mask), mirroring the serving engine's
        # near-empty bf16 routing — and, critically for TRAINING, avoiding
        # a measured NaN blow-up: an all-background sample is exactly
        # constant per GroupNorm group once quantized at every layer, each
        # GN backward multiplies its cotangent by rsqrt(0 + eps) ~ 316,
        # and ~18 GNs compound that past fp32 range. Background samples
        # are also excluded from the recorded statistic, exactly like the
        # engine excludes them from calibration (infer/engine.py).
        ax = lax.stop_gradient(jnp.abs(x.astype(jnp.float32)))
        if ctx.fg_mask is not None:
            ax = jnp.where(ctx.fg_mask, ax, 0.0)
        ctx.amax[site] = jnp.max(ax.reshape(-1, x.shape[-1]), axis=0)
        s_a = ctx.scales[site]
        xq = ste(x, fake_quant_act(x, s_a))
        if ctx.fg_mask is not None:
            xq = jnp.where(ctx.fg_mask, xq, x)
        x = xq
        kernel = ste(kernel, fake_quant_kernel(kernel, s_a))
    if ctx.mode == "calib":
        # Per-INPUT-CHANNEL statistics: GroupNorm gives every channel its
        # own learned scale, so a shared per-tensor range parks narrow
        # channels in a handful of int8 codes (measured -3 dB on a trained
        # model; per-channel recovers it to -0.3 dB). The scales are folded
        # into the weights at build time (ops/quant.py weight_qparams), so
        # serving cost is identical to per-tensor. With per-channel ranges,
        # abs-max beats percentile clipping (measured); percentile < 100
        # remains available for outlier-heavy inputs.
        a = jnp.abs(x.astype(jnp.float32)).reshape(-1, x.shape[-1])
        ctx.amax[site] = (jnp.percentile(a, ctx.percentile, axis=0)
                          if ctx.percentile < 100.0 else jnp.max(a, axis=0))
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


_gn_leaky = group_norm_leaky_ref     # flax GroupNorm numerics + LeakyReLU


def _double_conv(ctx, prefix, p, x):
    in_ch = x.shape[-1]
    y = _gn_leaky(_conv(ctx, f"{prefix}.conv1", p["conv1"]["kernel"], x),
                  p["norm1"])
    y = _gn_leaky(_conv(ctx, f"{prefix}.conv2", p["conv2"]["kernel"], y),
                  p["norm2"])
    if in_ch == y.shape[-1]:
        y = y + x
    return y




def _up_block(ctx, prefix, p, x1, x2):
    """models/unet.py Up: 1x1 up_conv BEFORE the 2x upsample, GN+leaky,
    pad-to-match, skip concat, DoubleConv."""
    y = _conv(ctx, f"{prefix}.up_conv", p["up_conv"]["kernel"], x1, padding=0)
    y = upsample_bilinear_align_corners(y, 2)
    y = _gn_leaky(y, p["up_norm"])
    dy = x2.shape[1] - y.shape[1]
    dx = x2.shape[2] - y.shape[2]
    if dy != 0 or dx != 0:
        y = jnp.pad(y, ((0, 0), (dy // 2, dy - dy // 2),
                        (dx // 2, dx - dx // 2), (0, 0)))
    return _double_conv(ctx, f"{prefix}.conv", p["conv"],
                        jnp.concatenate([x2, y], axis=-1))


def _backbone(ctx, params, x):
    x1 = _double_conv(ctx, "inc", params["inc"], x)
    x2 = _double_conv(ctx, "down1", params["down1"]["conv"], max_pool2(x1))
    x3 = _double_conv(ctx, "down2", params["down2"]["conv"], max_pool2(x2))
    x4 = _double_conv(ctx, "down3", params["down3"]["conv"], max_pool2(x3))
    y = _up_block(ctx, "up1", params["up1"], x4, x3)
    y = _up_block(ctx, "up2", params["up2"], y, x2)
    y = _up_block(ctx, "up3", params["up3"], y, x1)
    return y


def _forward_unet(ctx, params, x, dtype):
    """Mirrors UNetSuperRes.__call__ (models/unet.py, dense path)."""
    y = _backbone(ctx, params, x.astype(dtype))

    yb = upsample_bilinear_align_corners(y, 2)
    yb = _conv(ctx, "final_up_conv", params["final_up_conv"]["kernel"], yb)
    yb = _gn_leaky(yb, params["final_up_norm"])

    ps = params["final_up_pixelshuffle"]
    yp = _conv(ctx, "final_up_pixelshuffle.conv", ps["conv"]["kernel"], y,
               bias=ps["conv"]["bias"])
    yp = pixel_shuffle(yp, 2)
    yp = _gn_leaky(yp, ps["norm"])

    w = jax.nn.sigmoid(params["alpha"]).astype(dtype)
    y = w * yb + (1.0 - w) * yp

    y = _conv(ctx, "final_conv1", params["final_conv1"]["kernel"], y)
    y = _gn_leaky(y, params["final_norm"])
    # output head stays bf16 (never quantized): <1% of FLOPs, feeds sigmoid
    y = _conv(ctx, "__out__", params["final_conv2"]["kernel"], y, padding=0,
              bias=params["final_conv2"]["bias"])
    return jax.nn.sigmoid(y.astype(jnp.float32))


def _forward_unet_tpu(ctx, params, x, dtype):
    """Mirrors UNetSuperResTPU.__call__ (models/unet_tpu.py)."""
    y = _backbone(ctx, params, x.astype(dtype))

    a = _gn_leaky(_conv(ctx, "branch_a_conv",
                        params["branch_a_conv"]["kernel"], y),
                  params["branch_a_norm"])
    b = _gn_leaky(_conv(ctx, "branch_b_conv",
                        params["branch_b_conv"]["kernel"], y,
                        bias=params["branch_b_conv"]["bias"]),
                  params["branch_b_norm"])
    w = jax.nn.sigmoid(params["alpha"]).astype(dtype)
    y = w * a + (1.0 - w) * b

    y = _gn_leaky(_conv(ctx, "head_conv", params["head_conv"]["kernel"], y),
                  params["head_norm"])
    y = _conv(ctx, "__out__", params["head_out"]["kernel"], y, padding=0,
              bias=params["head_out"]["bias"])
    y = pixel_shuffle(y, 2)
    return jax.nn.sigmoid(y.astype(jnp.float32))


def _forward_edsr(ctx, params, x, dtype):
    """Mirrors EDSR.__call__ (models/edsr.py): conv head, N residual
    blocks (conv-ReLU-conv + residual), global skip, PixelShuffle tail.
    ``num_blocks`` is recovered from the parameter tree; ``res_scale`` is
    the model's fixed default (1.0 — never exposed through ModelConfig,
    models/__init__.py:_build_edsr). Every conv quantizes except the tail
    (it feeds pixel-shuffle + sigmoid directly — the output-head rule)."""
    x = x.astype(dtype)
    head = _conv(ctx, "head", params["head"]["kernel"], x,
                 bias=params["head"]["bias"])
    y = head
    n_blocks = sum(1 for k in params if k.startswith("block"))
    for i in range(n_blocks):
        p = params[f"block{i}"]
        z = jax.nn.relu(_conv(ctx, f"block{i}.conv0",
                              p["Conv_0"]["kernel"], y,
                              bias=p["Conv_0"]["bias"]))
        z = _conv(ctx, f"block{i}.conv1", p["Conv_1"]["kernel"], z,
                  bias=p["Conv_1"]["bias"])
        y = y + 1.0 * z                      # x + res_scale*y, res_scale=1
    y = _conv(ctx, "body_out", params["body_out"]["kernel"], y,
              bias=params["body_out"]["bias"])
    y = y + head
    y = _conv(ctx, "__out__", params["tail"]["kernel"], y,
              bias=params["tail"]["bias"])
    y = pixel_shuffle(y, 2)
    return jax.nn.sigmoid(y.astype(jnp.float32))


def _forward_simple(ctx, params, x, dtype):
    """Mirrors SimpleSR.__call__ (models/simple.py): the SRCNN-ish 9-5-5
    trunk + PixelShuffle tail. ``extract``/``map`` quantize; the
    ``reconstruct`` conv is the output head (stays full precision)."""
    x = x.astype(dtype)
    y = jax.nn.relu(_conv(ctx, "extract", params["extract"]["kernel"], x,
                          padding=4, bias=params["extract"]["bias"]))
    y = jax.nn.relu(_conv(ctx, "map", params["map"]["kernel"], y,
                          padding=2, bias=params["map"]["bias"]))
    y = _conv(ctx, "__out__", params["reconstruct"]["kernel"], y,
              padding=2, bias=params["reconstruct"]["bias"])
    y = pixel_shuffle(y, 2)
    return jax.nn.sigmoid(y.astype(jnp.float32))


_FORWARDS = {"unet": _forward_unet, "unet_tpu": _forward_unet_tpu,
             "edsr": _forward_edsr, "simple": _forward_simple}


def supported(model_type: str) -> bool:
    return model_type in _FORWARDS


def supported_types():
    """Model types with a quantizable functional forward (the
    engine/trainer gates read this instead of the private registry)."""
    return sorted(_FORWARDS)


def reference_forward(params, x, model_type: str = "unet",
                      dtype: Any = jnp.bfloat16):
    """bf16 functional forward, numerically identical to model.apply."""
    return _FORWARDS[model_type](_Ctx("ref"), params, x, dtype)


def build_calib_forward(model_type: str = "unet", dtype: Any = jnp.bfloat16,
                        percentile: float = 100.0, jit_fn: bool = True):
    """``fn(params, x) -> (y, amax)``: the exact bf16 forward plus each
    quantizable site's per-channel |x| statistic — lets a server calibrate
    *while* serving its first batches at full precision. ``jit_fn=False``
    returns the raw traceable function so callers can jit with their own
    sharding contract (infer/engine.py does)."""
    fwd = _FORWARDS[model_type]

    def run(p, x):
        ctx = _Ctx("calib", percentile=percentile)
        y = fwd(ctx, p, x, dtype)
        return y, ctx.amax

    return jax.jit(run) if jit_fn else run


def build_fakequant_forward(model_type: str = "unet",
                            dtype: Any = jnp.bfloat16,
                            min_foreground: float = 0.05):
    """Quantization-aware-training forward: ``fn(params, amax, x) ->
    (y, batch_amax, any_fg)``.

    Every conv site the int8 serving path quantizes (all except the bf16
    output head) runs through a float quantize-dequantize that reproduces
    the serving arithmetic — per-input-channel activation scales
    ``amax/127`` folded into per-output-channel weight quantization
    (ops/quant.py fake_quant_*; per-site equal to the s8xs8->s32 conv up
    to fp32 summation order, tests/test_qat.py) — with straight-through
    gradients, so the weights learn to absorb the quantization noise the
    PTQ path merely suffers (measured -0.64/-0.75 dB, RESULTS.md 2b).

    Per-SAMPLE foreground routing mirrors the serving engine's per-batch
    near-empty bf16 routing (infer/engine.py, same FOREGROUND_INTENSITY
    pixel threshold and ``min_foreground`` fraction): background-dominated
    samples keep full-precision activations and are excluded from the
    recorded statistic. Besides matching what serving would do with them,
    this is a hard NUMERICAL requirement for training: a quantized
    all-background sample is exactly constant per GroupNorm group at every
    layer, each GN backward multiplies by rsqrt(0+eps) ~ 316, and ~18 GNs
    compound past fp32 range (measured NaN divergence, tests/test_qat.py
    regression).

    ``amax`` is the trainer's running per-site per-channel |activation|
    estimate (a dict matching :func:`calib_amax`'s structure);
    ``batch_amax`` is this batch's statistic for updating it — the max
    over FOREGROUND samples only, exact ZEROS when the batch has none,
    with ``any_fg`` flagging whether any sample contributed. The caller
    gates its EMA update on ``any_fg`` (an all-background batch is an
    exact no-op, like the engine never calibrating on background
    batches); returning zeros rather than the running value keeps the
    statistic a neutral element under the trainer's cross-microbatch
    ``max`` recombination for gradient accumulation (folding the running
    estimate into a microbatch max would make the range unable to decay
    on any step containing a background microbatch). The reference has
    no quantized training (fp16 autocast only, scripts/train.py:158-163)."""
    from mri_superresolution_tpu.ops.quant import FOREGROUND_INTENSITY

    fwd = _FORWARDS[model_type]

    def run(p, amax, x):
        scales = {k: jnp.where(jnp.asarray(v, jnp.float32) > 0,
                               jnp.asarray(v, jnp.float32) / 127.0, 1.0)
                  for k, v in amax.items()}
        fg = jnp.mean(
            (jnp.abs(x.astype(jnp.float32)) > FOREGROUND_INTENSITY)
            .astype(jnp.float32), axis=tuple(range(1, x.ndim)))
        mask = (fg >= min_foreground).reshape(
            (x.shape[0],) + (1,) * (x.ndim - 1))
        ctx = _Ctx("fakequant", scales=scales, fg_mask=mask)
        y = fwd(ctx, p, x, dtype)
        return y, dict(ctx.amax), jnp.any(mask)

    return run


def calib_amax(params, x, model_type: str = "unet",
               dtype: Any = jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """One-batch per-site per-channel |activation| maxima — the init value
    for the QAT running statistic (everything :func:`build_int8_forward`
    quantizes, i.e. all conv sites except the never-quantized output
    head)."""
    fn = build_calib_forward(model_type, dtype, jit_fn=False)
    _, amax = jax.jit(fn)(params, x)
    return {k: v for k, v in amax.items() if k != "__out__"}


def amax_template(params, x_shape, model_type: str = "unet",
                  dtype: Any = jnp.bfloat16) -> Dict[str, Any]:
    """Shape/dtype skeleton of :func:`calib_amax`'s output with ZERO device
    work (``jax.eval_shape``). The trainer uses it to restore checkpointed
    QAT ranges before deciding whether a real calibration batch (and its
    multi-minute tunnel compile) is needed at all."""
    fn = build_calib_forward(model_type, dtype, jit_fn=False)
    _, amax = jax.eval_shape(
        fn, params, jax.ShapeDtypeStruct(tuple(x_shape), jnp.float32))
    return {k: v for k, v in amax.items() if k != "__out__"}


def scales_from_amax(amax: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Per-site, per-input-channel scales; zero-range channels get 1."""
    return {k: np.where(np.asarray(v) > 0, np.asarray(v) / 127.0,
                        1.0).astype(np.float32)
            for k, v in amax.items() if k != "__out__"}


def save_scales(path: str, scales: Dict[str, np.ndarray],
                model_type: str) -> None:
    """Persist frozen calibration scales as a JSON sidecar (atomic write).

    Makes int8 serving deterministic across processes: a later run loads
    these instead of re-calibrating on whatever data arrives first, so the
    same input volume produces byte-identical output bytes every run."""
    import json
    import os as _os
    blob = {"format": "int8-ptq-scales-v1", "model_type": model_type,
            "scales": {k: np.asarray(v, np.float32).tolist()
                       for k, v in scales.items()}}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(blob, f)
    _os.replace(tmp, path)


def load_scales(path: str) -> Tuple[Dict[str, np.ndarray], str]:
    """Load scales saved by :func:`save_scales` → (scales, model_type)."""
    import json
    with open(path) as f:
        blob = json.load(f)
    if blob.get("format") != "int8-ptq-scales-v1":
        raise ValueError(f"{path} is not an int8 PTQ scales file")
    scales = {k: np.asarray(v, np.float32)
              for k, v in blob["scales"].items()}
    return scales, blob.get("model_type", "unet")


def calibrate(params, batches: Sequence[np.ndarray], model_type: str = "unet",
              dtype: Any = jnp.bfloat16,
              percentile: float = 100.0) -> Dict[str, np.ndarray]:
    """Run calibration batches in bf16, return per-site static activation
    scales {site: (Cin,) clip/127} where clip is the max over batches of
    each site's per-channel ``percentile``-clipped |x|. Batches: (B, H, W,
    C) floats.

    Caveat: with ``percentile < 100`` the statistic is computed over ALL
    pixels of each batch — run it on unpadded inputs, since batch/bucket
    zero-padding dilutes the percentile toward 0 and would freeze too-small
    scales that hard-clip real activations (abs-max, the default, is
    padding-immune). The engine's streaming calibration always uses
    percentile=100 for this reason."""
    fn = build_calib_forward(model_type, dtype, percentile)
    amax: Dict[str, np.ndarray] = {}
    for b in batches:
        _, out = fn(params, jnp.asarray(b))
        out = jax.device_get(out)
        for k, v in out.items():
            v = np.asarray(v, np.float32)
            amax[k] = np.maximum(amax[k], v) if k in amax else v
    return scales_from_amax(amax)


# Measured guidance for which sites to quantize (v5e, B=128, bf=32):
# - Isolated-site probe (tools/bench_int8_probe2.py): the static quantize
#   pass costs ~2.4x its bandwidth floor (bf16->int8 retiling, unfused
#   with the conv), so in isolation narrow/512^2 sites regress (final
#   32->16 site 10.5->13.5 ms) and only FLOP-dense sites win.
# - Whole-model A/B, which is what actually matters: quantizing ALL sites
#   beats every partial configuration tried — unet 1428->1512 slices/s
#   (+6%) all-sites vs 1426 with the probe-derived exclusions; unet_tpu
#   2569->2450 all vs 2539 partial (both below bf16). XLA's fusion
#   decisions change with the surrounding graph, so isolated-site
#   arithmetic does not compose; trust end-to-end numbers only.
# Default: quantize everything (best measured config for both unet
# families; edsr/simple have no per-site measurements — their constant
# channel width makes every trunk conv the same MXU shape, so the
# all-sites default is the natural one there too).
_DEFAULT_EXCLUDE = {
    "unet": frozenset(),
    "unet_tpu": frozenset(),
    "edsr": frozenset(),
    "simple": frozenset(),
}


def quant_sites(params, model_type: str = "unet"):
    """``[(site, kernel)]`` for every quantizable conv site — everything
    except the never-quantized output head. Single source for the dense
    int8 forward below AND the row-sharded one
    (parallel/spatial.build_spatial_int8_forward): both fold the same
    per-site activation scales into the same kernels."""
    sites = []

    def dc(prefix, p):
        sites.append((f"{prefix}.conv1", p["conv1"]["kernel"]))
        sites.append((f"{prefix}.conv2", p["conv2"]["kernel"]))

    if model_type in ("unet", "unet_tpu"):
        dc("inc", params["inc"])
        for i in (1, 2, 3):
            dc(f"down{i}", params[f"down{i}"]["conv"])
        for i in (1, 2, 3):
            up = params[f"up{i}"]
            sites.append((f"up{i}.up_conv", up["up_conv"]["kernel"]))
            dc(f"up{i}.conv", up["conv"])
        if model_type == "unet":
            sites.append(("final_up_conv",
                          params["final_up_conv"]["kernel"]))
            sites.append(("final_up_pixelshuffle.conv",
                          params["final_up_pixelshuffle"]["conv"]["kernel"]))
            sites.append(("final_conv1", params["final_conv1"]["kernel"]))
        else:
            sites.append(("branch_a_conv",
                          params["branch_a_conv"]["kernel"]))
            sites.append(("branch_b_conv",
                          params["branch_b_conv"]["kernel"]))
            sites.append(("head_conv", params["head_conv"]["kernel"]))
    elif model_type == "edsr":
        sites.append(("head", params["head"]["kernel"]))
        for i in range(sum(1 for k in params if k.startswith("block"))):
            p = params[f"block{i}"]
            sites.append((f"block{i}.conv0", p["Conv_0"]["kernel"]))
            sites.append((f"block{i}.conv1", p["Conv_1"]["kernel"]))
        sites.append(("body_out", params["body_out"]["kernel"]))
    else:                                  # simple (the tail is __out__)
        sites.append(("extract", params["extract"]["kernel"]))
        sites.append(("map", params["map"]["kernel"]))
    return sites


def int8_qweights(params, scales: Dict[str, float],
                  model_type: str = "unet",
                  exclude: Optional[frozenset] = None
                  ) -> Dict[str, Tuple]:
    """Precompute every quantizable site's ``(q_kernel, k_scale)`` with the
    per-input-channel activation scales folded in (weight_qparams).
    Validates that ``scales`` covers every non-excluded site."""
    if exclude is None:
        exclude = _DEFAULT_EXCLUDE[model_type]
    sites = [(s, kp) for s, kp in quant_sites(params, model_type)
             if s not in exclude]
    missing = [s for s, _ in sites if s not in scales]
    if missing:
        raise ValueError(f"calibration scales missing for sites: {missing}")
    return {site: tuple(weight_qparams(kp, act_scale=scales[site]))
            for site, kp in sites}


def build_int8_forward(params, scales: Dict[str, float],
                       model_type: str = "unet",
                       dtype: Any = jnp.bfloat16,
                       exclude: Optional[frozenset] = None):
    """Returns ``fn(params, x) -> y`` running the calibrated conv sites in
    int8 (per-Cout weight scales with the per-Cin activation scales folded
    in). ``params``
    is accepted per-call so the engine's sharding plumbing stays uniform;
    the int8 weights are precomputed here once. ``exclude`` names sites
    kept in bf16 (default: the measured per-family loss list above)."""
    fwd = _FORWARDS[model_type]
    qweights = int8_qweights(params, scales, model_type, exclude)

    def run(p, x):
        ctx = _Ctx("int8", scales=scales, qweights=qweights)
        return fwd(ctx, p, x, dtype)

    return run
