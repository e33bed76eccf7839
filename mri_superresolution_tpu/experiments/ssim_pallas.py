"""Fused SSIM metric as a single Pallas TPU kernel.

The XLA path (ops/ssim.py) lowers to two depthwise convolutions over a
5-channel stack plus elementwise map/reduce — several HBM round-trips for
the intermediates. This kernel fuses everything per image: one program per
batch element loads img1/img2 into VMEM once, forms the five products,
applies the separable 11-tap Gaussian window entirely in VMEM (zero-padded,
exactly matching the reference's ``F.conv2d(padding=5)`` semantics at
utils/losses.py:55-64), evaluates the SSIM map, and reduces it to a scalar
in SMEM. No intermediate ever touches HBM.

Gradients: the fused kernel is forward-only by construction; a
``jax.custom_vjp`` routes the backward pass through the XLA implementation's
VJP, so ``ssim_fused`` is a drop-in differentiable replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mri_superresolution_tpu.ops.ssim import _gaussian_window_np, ssim


def _make_kernel(h: int, w: int, window_size: int, sigma: float,
                 val_range: float):
    g = [float(v) for v in _gaussian_window_np(window_size, sigma)]
    pad = window_size // 2
    c1 = (0.01 * val_range) ** 2
    c2 = (0.03 * val_range) ** 2

    def kernel(x1_ref, x2_ref, out_ref, rpad, cpad):
        def blur(x):
            # rows (along W), zero-padded
            rpad[...] = jnp.zeros((h, w + 2 * pad), jnp.float32)
            rpad[:, pad:pad + w] = x
            y = g[0] * rpad[:, 0:w]
            for k in range(1, window_size):
                y = y + g[k] * rpad[:, k:k + w]
            # cols (along H), zero-padded
            cpad[...] = jnp.zeros((h + 2 * pad, w), jnp.float32)
            cpad[pad:pad + h, :] = y
            z = g[0] * cpad[0:h, :]
            for k in range(1, window_size):
                z = z + g[k] * cpad[k:k + h, :]
            return z

        x1 = x1_ref[0].astype(jnp.float32)
        x2 = x2_ref[0].astype(jnp.float32)
        mu1 = blur(x1)
        mu2 = blur(x2)
        e11 = blur(x1 * x1)
        e22 = blur(x2 * x2)
        e12 = blur(x1 * x2)

        mu1_sq = mu1 * mu1
        mu2_sq = mu2 * mu2
        mu1_mu2 = mu1 * mu2
        s1 = e11 - mu1_sq
        s2 = e22 - mu2_sq
        s12 = e12 - mu1_mu2
        smap = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
            (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
        out_ref[pl.program_id(0), 0] = jnp.mean(smap)

    return kernel


@functools.partial(jax.jit, static_argnames=("window_size", "sigma",
                                             "val_range", "interpret"))
def ssim_fused_per_sample(img1: jnp.ndarray, img2: jnp.ndarray,
                          window_size: int = 11, sigma: float = 1.5,
                          val_range: float = 1.0,
                          interpret: bool = False) -> jnp.ndarray:
    """Per-sample SSIM (B,) for single-channel NHWC batches via the fused
    kernel. Inputs: (B, H, W, 1) or (B, H, W)."""
    if img1.ndim == 4:
        assert img1.shape[-1] == 1, "fused SSIM kernel is single-channel"
        img1 = img1[..., 0]
        img2 = img2[..., 0]
    b, h, w = img1.shape
    pad = window_size // 2
    kernel = _make_kernel(h, w, window_size, sigma, val_range)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h, w + 2 * pad), jnp.float32),
            pltpu.VMEM((h + 2 * pad, w), jnp.float32),
        ],
        interpret=interpret,
    )(img1.astype(jnp.float32).reshape(b, h, w),
      img2.astype(jnp.float32).reshape(b, h, w))
    return out[:, 0]


def _fused_mean(img1, img2, window_size, sigma, val_range, interpret):
    return jnp.mean(ssim_fused_per_sample(img1, img2, window_size, sigma,
                                          val_range, interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def ssim_fused(img1: jnp.ndarray, img2: jnp.ndarray,
               window_size: int = 11, sigma: float = 1.5,
               val_range: float = 1.0, interpret: bool = False) -> jnp.ndarray:
    """Scalar mean SSIM — fused Pallas forward, XLA-derived backward."""
    return _fused_mean(img1, img2, window_size, sigma, val_range, interpret)


def _fwd(img1, img2, window_size, sigma, val_range, interpret):
    return (_fused_mean(img1, img2, window_size, sigma, val_range, interpret),
            (img1, img2))


def _bwd(window_size, sigma, val_range, interpret, res, ct):
    img1, img2 = res
    x1 = img1[..., None] if img1.ndim == 3 else img1
    x2 = img2[..., None] if img2.ndim == 3 else img2
    _, vjp = jax.vjp(
        lambda a, b: ssim(a, b, window_size, sigma, val_range), x1, x2)
    d1, d2 = vjp(ct)
    if img1.ndim == 3:
        d1, d2 = d1[..., 0], d2[..., 0]
    return d1, d2


ssim_fused.defvjp(_fwd, _bwd)
