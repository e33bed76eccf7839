"""Phase-space (space-to-depth) algebra for lane-starved TPU convolutions.

STATUS: exact and fully tested (tests/test_phase.py), but a MEASURED
PERFORMANCE NEGATIVE on v5e — kept as an opt-in experiment
(UNetSuperRes(phase_final=True)). See the flag's comment in models/unet.py
and tools/bench_phase_probe{,2}.py for the numbers: XLA's conv lowering
already exceeds the naive output-lane bound on the Cout<=16 convs this was
designed to fix, and the layout ops (channel interleaves, strided-lane
slices, per-phase shifted views) cost far more than the conv savings.

Original motivation: the parity U-Net's final 2x stage (reference
models/unet_model.py:150-173) runs 3x3 convs at 512^2 with Cout<=16, which
uses at most 16 of the MXU's 128 output lanes (~12.5% utilization) and
dominates the forward pass (tools/bench_ablation.py: 53 of 100 ms at
batch 128). This module re-expresses those convs *exactly* at half
resolution over 4x the channels, where Cout=64 fills half the lanes and the
MAC count only grows 16/9 — in theory a ~2.25x MXU-time win, pure XLA.

Representation ("phase space"): a (B, 2H, 2W, C) tensor X is stored as the
(B, H, W, 4C) tensor T with

    T[n, m, 4c + 2a + b] = X[2n + a, 2m + b, c],   a, b in {0, 1}

i.e. channel-major ("c-major") ordering, which is exactly torch
``nn.PixelShuffle``'s channel convention — so a conv that feeds a
PixelShuffle already emits phase space for free.

Key identity (kernel rescatter): for a 3x3/s1 zero-padded conv W at 2Hx2W,

    Y[2i+a, 2j+b, co] = sum_{di,dj,ci} W[1+di, 1+dj, ci, co]
                                       * X[2i+a+di, 2j+b+dj, ci]

each input pixel (2i+a+di) lands in block i-1+r with sub-phase u where the
tap index satisfies  di + 1 = a + 2r + u - 1 + 1  =>  tap = a + 2r + u - 1.
Hence Y's phase-space form is a single 2x2 conv over T with the rescattered
kernel

    K2[r, s, 4ci+2u+v, 4co+2a+b] = W[a+2r+u-1, b+2s+v-1, ci, co]

(zero where the tap index falls outside [0, 3)). With padding ((1,1),(1,1))
the 2x2 conv emits an (H+1, W+1) grid Z where output phase (a, b) of block
(i, j) lives at Z[i+a, j+b] — a per-phase diagonal offset ("misaligned"
layout). `align_phase` slices it back to the aligned (B, H, W, 4C) form;
alternatively the offsets ride through any per-pixel op (GroupNorm affine,
LeakyReLU, 1x1 conv, sigmoid) and are absorbed for free by
`depth_to_space_rev_crop` at the network output.

GroupNorm exactness: a GroupNorm with groups of size g over C channels at
2Hx2W has groups of size 4g over 4C c-major phase channels at HxW covering
exactly the same value sets, so means/variances are identical (up to
summation order) — see `phase_group_norm` / `phase_group_norm_misaligned`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from mri_superresolution_tpu.ops.resize import _align_corners_matrix


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2H, 2W, C) -> (B, H, W, 4C), c-major phase channels."""
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(b, h, 2, w, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # b, h, w, c, a, b2
    return x.reshape(b, h, w, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) c-major -> (B, 2H, 2W, C). Inverse of space_to_depth;
    identical to torch PixelShuffle(2) channel semantics."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # b, h, a, w, b2, c
    return x.reshape(b, 2 * h, 2 * w, c)


def depth_to_space_rev_crop(z: jnp.ndarray) -> jnp.ndarray:
    """Collapse the *misaligned* (B, H+1, W+1, 4C) phase grid Z (output of a
    rescattered 2x2 conv, where phase (a,b) of block (i,j) sits at
    Z[i+a, j+b]) directly to the aligned (B, 2H, 2W, C) spatial tensor.

    Placing phase (a, b) at sub-position (1-a, 1-b) makes the true output a
    uniform +1 shift:  out[r, s] = interleave(Z)[r+1, s+1].
    """
    b, h1, w1, c4 = z.shape
    c = c4 // 4
    z = z.reshape(b, h1, w1, c, 2, 2)[..., ::-1, ::-1]
    z = z.transpose(0, 1, 4, 2, 5, 3)
    z = z.reshape(b, 2 * h1, 2 * w1, c)
    return z[:, 1:2 * h1 - 1, 1:2 * w1 - 1, :]


def align_phase(z: jnp.ndarray) -> jnp.ndarray:
    """Misaligned (B, H+1, W+1, 4C) -> aligned (B, H, W, 4C) c-major."""
    b, h1, w1, c4 = z.shape
    h, w = h1 - 1, w1 - 1
    parts = [z[:, a:a + h, bb:bb + w, (2 * a + bb)::4]
             for a in (0, 1) for bb in (0, 1)]
    return jnp.stack(parts, axis=-1).reshape(b, h, w, c4)


def phase_kernel_2x2(w3: jnp.ndarray) -> jnp.ndarray:
    """Rescatter a (3, 3, Ci, Co) conv kernel into its exact phase-space
    (2, 2, 4Ci, 4Co) equivalent (see module docstring for the derivation)."""
    pad = jnp.pad(w3, ((1, 1), (1, 1), (0, 0), (0, 0)))        # (5,5,Ci,Co)
    a = np.arange(2)
    # tap index into pad: a + 2r + u  (row), b + 2s + v  (col)
    ar = a[:, None, None] + 2 * a[None, :, None] + a[None, None, :]  # [a,r,u]
    k = pad[ar[:, :, :, None, None, None], ar[None, None, None, :, :, :]]
    # axes: (a, r, u, b, s, v, ci, co) -> (r, s, ci, u, v, co, a, b)
    k = k.transpose(1, 4, 6, 2, 5, 7, 0, 3)
    kh, kw, ci = k.shape[0], k.shape[1], k.shape[2]
    co = k.shape[5]
    return k.reshape(kh, kw, ci * 4, co * 4)


def phase_kernel_1x1(w1: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, Ci, Co) or (Ci, Co) 1x1 kernel -> phase-diagonal
    (1, 1, 4Ci, 4Co): phases don't mix under a 1x1 conv."""
    w = w1.reshape(w1.shape[-2], w1.shape[-1])
    eye = jnp.eye(4, dtype=w.dtype)
    k = jnp.einsum("ic,pq->ipcq", w, eye)      # (ci, p, co, p')
    return k.reshape(1, 1, w.shape[0] * 4, w.shape[1] * 4)


def phase_conv_2x2(t: jnp.ndarray, k2: jnp.ndarray) -> jnp.ndarray:
    """Run the rescattered 2x2 conv over an aligned phase tensor. Output is
    the (B, H+1, W+1, 4Co) *misaligned* grid (see depth_to_space_rev_crop /
    align_phase)."""
    return lax.conv_general_dilated(
        t, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def upsample_bilinear_phases(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear align_corners=True upsample of (B, H, W, C), emitted
    directly in aligned phase space (B, H, W, 4C) without materializing the
    (B, 2H, 2W, C) intermediate. Same matmul FLOPs as the dense version
    (ops/resize.py upsample_bilinear_align_corners): the even/odd row
    matrices are disjoint halves of the full one."""
    b, h, w, c = x.shape
    ah = np.asarray(_align_corners_matrix(h, 2 * h))
    aw = np.asarray(_align_corners_matrix(w, 2 * w))
    rows = [jnp.asarray(ah[a::2], dtype=x.dtype) for a in (0, 1)]
    cols = [jnp.asarray(aw[bb::2], dtype=x.dtype) for bb in (0, 1)]
    parts = []
    for ra in rows:
        xr = jnp.einsum("oh,bhwc->bowc", ra, x)
        for cb in cols:
            parts.append(jnp.einsum("pw,bowc->bopc", cb, xr))
    return jnp.stack(parts, axis=-1).reshape(b, h, w, 4 * c)


def _group_stats(views, n_groups: int, n_elems: int):
    """Mean/var per (batch, group) from one or more fp32 channel views whose
    channels are c-major contiguous per group."""
    s = 0.0
    sq = 0.0
    for v in views:
        bsz = v.shape[0]
        g = v.reshape(bsz, -1, n_groups, v.shape[-1] // n_groups)
        # channels are c-major: group i covers a contiguous channel block,
        # so reshape (..., G, C/G) is only valid when channel index // (C/G)
        # equals the group — true for the layouts produced in this module.
        s = s + jnp.sum(g, axis=(1, 3))
        sq = sq + jnp.sum(jnp.square(g), axis=(1, 3))
    mean = s / n_elems
    var = sq / n_elems - jnp.square(mean)
    return mean, var


def _apply_norm(x, mean, var, scale, bias, n_groups, eps, dtype):
    """Mirror flax GroupNorm's normalization: stats fp32, arithmetic in the
    compute dtype, per-channel affine."""
    b, ch = x.shape[0], x.shape[-1]
    reps = ch // n_groups
    mean_c = jnp.repeat(mean, reps, axis=-1).reshape(b, 1, 1, ch)
    mul = lax.rsqrt(var + eps)
    mul_c = jnp.repeat(mul, reps, axis=-1).reshape(b, 1, 1, ch)
    scale4 = jnp.repeat(scale, 4)          # true channel c -> phase 4c+p
    bias4 = jnp.repeat(bias, 4)
    y = (x.astype(dtype) - mean_c.astype(dtype)) * (
        mul_c.astype(dtype) * scale4.astype(dtype))
    return y + bias4.astype(dtype)


def phase_group_norm(t: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     n_groups: int, eps: float = 1e-5,
                     dtype=jnp.float32) -> jnp.ndarray:
    """GroupNorm over an *aligned* phase tensor (B, H, W, 4C), exactly
    equivalent to GroupNorm(n_groups) on the (B, 2H, 2W, C) original
    (same value sets per group; c-major keeps groups channel-contiguous)."""
    xf = t.astype(jnp.float32)
    n_elems = t.shape[1] * t.shape[2] * (t.shape[3] // n_groups)
    mean, var = _group_stats([xf], n_groups, n_elems)
    return _apply_norm(t, mean, var, scale, bias, n_groups, eps, dtype)


def phase_group_norm_misaligned(z: jnp.ndarray, scale: jnp.ndarray,
                                bias: jnp.ndarray, n_groups: int,
                                eps: float = 1e-5,
                                dtype=jnp.float32) -> jnp.ndarray:
    """GroupNorm over the *misaligned* (B, H+1, W+1, 4C) grid: statistics are
    computed from the valid per-phase views only (exactly the true tensor's
    values), then the full grid is normalized — border garbage is cropped
    later by depth_to_space_rev_crop, never observed."""
    b, h1, w1, c4 = z.shape
    h, w = h1 - 1, w1 - 1
    zf = z.astype(jnp.float32)
    views = [zf[:, a:a + h, bb:bb + w, (2 * a + bb)::4]
             for a in (0, 1) for bb in (0, 1)]
    # each view carries C = c4/4 c-major channels, so _group_stats' reshape
    # contract holds per view
    n_elems = h * w * (c4 // n_groups)
    mean, var = _group_stats(views, n_groups, n_elems)
    return _apply_norm(z, mean, var, scale, bias, n_groups, eps, dtype)
