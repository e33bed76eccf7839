"""int8 post-training-quantization primitives for TPU serving.

Measured motivation (tools/bench_int8_probe.py, v5e through the axon
tunnel, B=128): the MXU's s8 x s8 -> s32 path runs 329.5 TOP/s vs 161.9
TFLOP/s bf16 (2.04x), and every conv shape in the U-Net family speeds up
1.78-2.02x — including the final-stage Cout=16 convs at 512^2 that bound
the parity model (10.6 -> 5.6 ms). The reference has no quantized path
(PyTorch AMP fp16 only, scripts/train.py:47-52).

Scheme (standard symmetric PTQ):
- weights: per-output-channel symmetric int8, scale = amax(|w|)/127 over
  (kh, kw, cin). Quantized once at engine setup, outside jit.
- activations: per-INPUT-CHANNEL symmetric int8 with STATIC scales from a
  calibration pass (models/quant_forward.py), folded into the weights via
  ``weight_qparams(act_scale=...)`` so dequant needs only the per-Cout
  weight scale. Static scales matter on TPU: the quantize (scale, round,
  clip, cast) is a pure elementwise op that XLA fuses into the producing
  op's output write; a dynamic amax would insert a reduction barrier per
  conv. Per-channel (not per-tensor) matters for quality: GroupNorm gives
  each channel its own learned range — a shared range measured -3 dB on a
  trained model, per-channel -0.3 dB (RESULTS.md 2b).
- accumulation: int32 on the MXU (preferred_element_type), dequantized as
  float32 * s_w[cout] (activation scales pre-folded) and cast back to the
  serving dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

# Per-pixel intensity above which a pixel counts as foreground — shared by
# the serving engine's int8 content guardrail (near-empty batches route to
# bf16, infer/engine.py) and the QAT fakequant forward's per-sample routing
# (models/quant_forward.py), so training sees the same policy serving
# applies.
FOREGROUND_INTENSITY = 0.05


def quantize_tensor(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Symmetric int8 quantization with a static scale — a scalar
    (per-tensor) or a (C,)-vector broadcast over the trailing channel axis
    (per-channel). Either way a pure elementwise op XLA can fuse into the
    producer's output write."""
    q = jnp.round(x.astype(jnp.float32) / jnp.asarray(scale, jnp.float32))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def weight_qparams(kernel: jnp.ndarray,
                   act_scale=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantization of an HWIO kernel.

    ``act_scale`` (scalar or (Cin,)) folds the activation quantization into
    the weights: with q_x = x / s_a and w' = w * s_a (per input channel),
    sum(q_x * w') == sum(x * w) / s_w — so the conv's dequant needs only
    the returned per-Cout weight scale, and activation quantization can be
    per-INPUT-channel at zero serving cost (GroupNorm gives each channel
    its own learned scale, so per-channel ranges differ widely).

    Returns (q_kernel int8 HWIO, scale float32 (Cout,)). All-zero channels
    get scale 1 (their quantized weights are 0 either way).
    """
    k = kernel.astype(jnp.float32)
    if act_scale is not None:
        k = k * jnp.asarray(act_scale, jnp.float32).reshape(1, 1, -1, 1)
    amax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(k / scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8), scale


def ste(x: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Straight-through estimator: forward value ``q``, gradient of ``x``.

    The standard QAT trick (round/clip have zero gradient almost
    everywhere): y = x + stop_grad(q - x) evaluates to q but differentiates
    as the identity, so the optimizer sees the quantized forward while the
    backward ignores the quantization nonlinearity."""
    return x + lax.stop_gradient(q.astype(x.dtype) - x)


def fake_quant_act(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Quantize-dequantize simulation of :func:`quantize_tensor`: the float
    value the int8 serving conv effectively consumes (round-to-nearest,
    clip to +-127, re-scale). ``scale`` broadcasts over the trailing channel
    axis like quantize_tensor's."""
    s = jnp.asarray(scale, jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127.0, 127.0)
    return (q * s).astype(x.dtype)


def fake_quant_kernel(kernel: jnp.ndarray, act_scale) -> jnp.ndarray:
    """Float simulation of the weights the int8 serving conv effectively
    multiplies by: :func:`weight_qparams`'s fold(act_scale) -> per-Cout
    quantize -> dequantize -> unfold, so that
    ``conv(fake_quant_act(x, s_a), fake_quant_kernel(w, s_a))`` equals
    ``int8_conv(quantize_tensor(x, s_a), *weight_qparams(w, s_a))`` up to
    float summation order (tests/test_qat.py asserts it). Same zero-channel
    guard as weight_qparams."""
    k = kernel.astype(jnp.float32)
    s_a = jnp.asarray(act_scale, jnp.float32).reshape(1, 1, -1, 1)
    kf = k * s_a
    amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))
    s_w = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(kf / s_w), -127.0, 127.0)
    return ((q * s_w) / s_a).astype(kernel.dtype)


def int8_conv(qx: jnp.ndarray,
              qk: jnp.ndarray, k_scale: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None,
              padding: int = 0, dilation: int = 1,
              out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """s8 x s8 -> s32 NHWC conv, dequantized to ``out_dtype``.

    qx: (B,H,W,Cin) int8; qk: (kh,kw,Cin,Cout) int8 with the activation
    scale already folded in (weight_qparams(act_scale=...)); k_scale
    (Cout,) float32. Accumulates exactly in int32 (no precision loss inside
    the conv), then y = s32 * k_scale [+ bias].
    """
    d = dilation
    acc = lax.conv_general_dilated(
        qx, qk, (1, 1), ((padding, padding), (padding, padding)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * k_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
