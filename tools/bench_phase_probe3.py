#!/usr/bin/env python
"""Probe 3: p-major phase-space final stage — the layout that probe 2 said
might work.

Probe 2 showed the c-major phase pipeline lost to layout ops (stack
interleaves, ::4 lane-strided slices, strided GN views). In p-major order
(channel index = phase*C + c) every layout op becomes a concat of
channel-contiguous blocks and every kernel permutation happens at trace
time on the weights (free). This probe times:

  1. the p-major primitive ops (GN aligned, GN misaligned w/ fused align,
     collapse-to-dense)
  2. two composed final-stage candidates vs the dense reference:
       A. full p-major: everything from upsample to the 1x1 conv stays in
          phase space; one collapse at the very end
       B. partial: only bilinear-branch conv_up in phase space; blend in
          phase space; shuffle to dense for conv1 onward
  3. an exactness check (fp32, small shapes) of both candidates vs dense

Run on the real chip. B=128 matches bench.py's sweet spot.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mri_superresolution_tpu.experiments import phase as phase_ops
from mri_superresolution_tpu.ops.resize import (
    _align_corners_matrix, upsample_bilinear_align_corners)

B = 128
F = 32          # base_filters; branch channels F//2
DT = jnp.bfloat16


# ---------------------------------------------------------------- p-major ops

def cm_to_pm_perm(c: int) -> np.ndarray:
    """Permutation taking a c-major phase channel axis (index c*4+p) to
    p-major (index p*C+c): pm[i] = which cm index lands at i."""
    p, cc = np.divmod(np.arange(4 * c), c)
    return cc * 4 + p


def phase_kernel_2x2_pmajor(w3: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) -> (2,2,4Ci,4Co) rescattered kernel with p-major channel
    order on both sides (trace-time, tiny)."""
    k = phase_ops.phase_kernel_2x2(w3)
    pi = cm_to_pm_perm(w3.shape[2])
    po = cm_to_pm_perm(w3.shape[3])
    return k[:, :, pi][:, :, :, po]


def upsample_phases_pmajor(x: jnp.ndarray) -> jnp.ndarray:
    """2x align_corners bilinear upsample emitted as an aligned p-major
    phase tensor (B,H,W,4C): 4 disjoint-half matmuls + channel concat."""
    b, h, w, c = x.shape
    ah = np.asarray(_align_corners_matrix(h, 2 * h))
    aw = np.asarray(_align_corners_matrix(w, 2 * w))
    parts = []
    for a in (0, 1):
        xr = jnp.einsum("oh,bhwc->bowc", jnp.asarray(ah[a::2], x.dtype), x)
        for bb in (0, 1):
            parts.append(jnp.einsum("pw,bowc->bopc",
                                    jnp.asarray(aw[bb::2], x.dtype), xr))
    return jnp.concatenate(parts, axis=-1)


def gn_pmajor(t, scale, bias, n_groups=8, eps=1e-5, dtype=DT):
    """GroupNorm on an aligned p-major (B,H,W,4C) tensor, exactly equal to
    GroupNorm(n_groups) on the dense (B,2H,2W,C) tensor. p-major index
    p*C + c splits contiguously as (4, G, C/G), so stats are plain
    reshape+sum — no strided views."""
    b, h, w, c4 = t.shape
    c = c4 // 4
    cg = c // n_groups
    xf = t.astype(jnp.float32).reshape(b, -1, 4, n_groups, cg)
    n = h * w * 4 * cg
    s = jnp.sum(xf, axis=(1, 2, 4))
    sq = jnp.sum(jnp.square(xf), axis=(1, 2, 4))
    mean = s / n
    var = sq / n - jnp.square(mean)
    mul = lax.rsqrt(var + eps)
    mean_c = jnp.tile(jnp.repeat(mean, cg, -1), (1, 4)).reshape(b, 1, 1, c4)
    mul_c = jnp.tile(jnp.repeat(mul, cg, -1), (1, 4)).reshape(b, 1, 1, c4)
    sc = jnp.tile(scale, 4).astype(dtype)
    bi = jnp.tile(bias, 4).astype(dtype)
    y = (t.astype(dtype) - mean_c.astype(dtype)) * (mul_c.astype(dtype) * sc)
    return y + bi


def gn_pmajor_misaligned_to_aligned(z, scale, bias, n_groups=8, eps=1e-5,
                                    dtype=DT):
    """Stats from the valid per-phase views of a misaligned p-major
    (B,H+1,W+1,4C) grid, then emit the ALIGNED (B,H,W,4C) normalized tensor
    (align fused into the affine pass). Views are channel-contiguous."""
    b, h1, w1, c4 = z.shape
    h, w, c = h1 - 1, w1 - 1, c4 // 4
    cg = c // n_groups
    views = [z[:, a:a + h, bb:bb + w, (2 * a + bb) * c:(2 * a + bb + 1) * c]
             for a in (0, 1) for bb in (0, 1)]
    s = 0.0
    sq = 0.0
    for v in views:
        g = v.astype(jnp.float32).reshape(b, -1, n_groups, cg)
        s = s + jnp.sum(g, axis=(1, 3))
        sq = sq + jnp.sum(jnp.square(g), axis=(1, 3))
    n = h * w * 4 * cg
    mean = s / n
    var = sq / n - jnp.square(mean)
    mul = lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, -1).reshape(b, 1, 1, c).astype(dtype)
    mul_c = jnp.repeat(mul, cg, -1).reshape(b, 1, 1, c).astype(dtype)
    sc = scale.astype(dtype)
    bi = bias.astype(dtype)
    out = [(v.astype(dtype) - mean_c) * (mul_c * sc) + bi for v in views]
    return jnp.concatenate(out, axis=-1)


def conv1x1_pmajor_kernel(w1: jnp.ndarray) -> jnp.ndarray:
    """(1,1,Ci,Co) -> block-diagonal (1,1,4Ci,4Co) p-major (phases don't
    mix under a 1x1 conv)."""
    w = w1.reshape(w1.shape[-2], w1.shape[-1])
    eye = jnp.eye(4, dtype=w.dtype)
    k = jnp.einsum("pq,ic->piqc", eye, w)       # (p, ci, p', co)
    return k.reshape(1, 1, 4 * w.shape[0], 4 * w.shape[1])


def d2s_rev_crop_pmajor(z: jnp.ndarray) -> jnp.ndarray:
    """Misaligned p-major (B,H+1,W+1,4C) -> dense (B,2H,2W,C); phase (a,b)
    of block (i,j) sits at z[i+a, j+b], placed at sub-position (1-a,1-b) so
    the result is a uniform +1 shift, then cropped."""
    b, h1, w1, c4 = z.shape
    c = c4 // 4
    z = z.reshape(b, h1, w1, 2, 2, c)[:, :, :, ::-1, ::-1, :]
    z = z.transpose(0, 1, 3, 2, 4, 5)
    z = z.reshape(b, 2 * h1, 2 * w1, c)
    return z[:, 1:2 * h1 - 1, 1:2 * w1 - 1, :]


def pixel_shuffle_pmajor(t: jnp.ndarray) -> jnp.ndarray:
    """Aligned p-major (B,H,W,4C) -> dense (B,2H,2W,C)."""
    b, h, w, c4 = t.shape
    c = c4 // 4
    t = t.reshape(b, h, w, 2, 2, c)
    t = t.transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(b, 2 * h, 2 * w, c)


# ----------------------------------------------------------- final stages

def make_weights(rng, dtype=jnp.float32):
    f = F
    return {
        "k_up": jnp.asarray(rng.normal(0, 0.1, (3, 3, f, f // 2)), dtype),
        "k_ps": jnp.asarray(rng.normal(0, 0.1, (3, 3, f, 2 * f)), dtype),
        "b_ps": jnp.asarray(rng.normal(0, 0.1, (2 * f,)), dtype),
        "k_c1": jnp.asarray(rng.normal(0, 0.1, (3, 3, f // 2, f // 2)), dtype),
        "k_c2": jnp.asarray(rng.normal(0, 0.1, (1, 1, f // 2, 1)), dtype),
        "b_c2": jnp.asarray(rng.normal(0, 0.1, (1,)), dtype),
        "gn_up_s": jnp.asarray(rng.normal(1, 0.1, (f // 2,)), dtype),
        "gn_up_b": jnp.asarray(rng.normal(0, 0.1, (f // 2,)), dtype),
        "gn_ps_s": jnp.asarray(rng.normal(1, 0.1, (f // 2,)), dtype),
        "gn_ps_b": jnp.asarray(rng.normal(0, 0.1, (f // 2,)), dtype),
        "gn_f_s": jnp.asarray(rng.normal(1, 0.1, (f // 2,)), dtype),
        "gn_f_b": jnp.asarray(rng.normal(0, 0.1, (f // 2,)), dtype),
    }


def conv3x3(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv1x1(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def gn_dense(x, scale, bias, n_groups=8, eps=1e-5, dtype=DT):
    b, h, w, c = x.shape
    cg = c // n_groups
    xf = x.astype(jnp.float32).reshape(b, -1, n_groups, cg)
    n = h * w * cg
    mean = jnp.sum(xf, axis=(1, 3)) / n
    var = jnp.sum(jnp.square(xf), axis=(1, 3)) / n - jnp.square(mean)
    mul = lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, -1).reshape(b, 1, 1, c).astype(dtype)
    mul_c = jnp.repeat(mul, cg, -1).reshape(b, 1, 1, c).astype(dtype)
    return ((x.astype(dtype) - mean_c) * (mul_c * scale.astype(dtype))
            + bias.astype(dtype))


def final_dense(y, W, dtype=DT):
    """The parity model's final stage (dense, current production path)."""
    cast = lambda a: a.astype(dtype)
    yb = upsample_bilinear_align_corners(y, 2)
    yb = conv3x3(yb, cast(W["k_up"]))
    yb = jax.nn.leaky_relu(gn_dense(yb, W["gn_up_s"], W["gn_up_b"],
                                    dtype=dtype), 0.2)
    yp = conv3x3(y, cast(W["k_ps"])) + cast(W["b_ps"])
    # torch pixel_shuffle channel order: c*4 + p
    bsz, h, w, _ = yp.shape
    yp = yp.reshape(bsz, h, w, F // 2, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    yp = yp.reshape(bsz, 2 * h, 2 * w, F // 2)
    yp = jax.nn.leaky_relu(gn_dense(yp, W["gn_ps_s"], W["gn_ps_b"],
                                    dtype=dtype), 0.2)
    t = 0.5 * yb + 0.5 * yp
    t = conv3x3(t, cast(W["k_c1"]))
    t = jax.nn.leaky_relu(gn_dense(t, W["gn_f_s"], W["gn_f_b"],
                                   dtype=dtype), 0.2)
    t = conv1x1(t, cast(W["k_c2"])) + cast(W["b_c2"])
    return jax.nn.sigmoid(t.astype(jnp.float32))


def final_pmajor_full(y, W, dtype=DT):
    """Candidate A: full p-major pipeline, single collapse at the end."""
    cast = lambda a: a.astype(dtype)
    f = F
    # bilinear branch
    t = upsample_phases_pmajor(y)                              # (B,H,W,4f)
    z = conv3x3_22(t, cast(phase_kernel_2x2_pmajor(W["k_up"])))
    yb = gn_pmajor_misaligned_to_aligned(z, W["gn_up_s"], W["gn_up_b"],
                                         dtype=dtype)          # aligned 4f/2
    yb = jax.nn.leaky_relu(yb, 0.2)
    # pixelshuffle branch: permute conv output channels to p-major (free)
    po = cm_to_pm_perm(f // 2)
    k_ps = cast(W["k_ps"])[:, :, :, po]
    b_ps = cast(W["b_ps"])[po]
    yp = conv3x3(y, k_ps) + b_ps                               # aligned 2f
    yp = jax.nn.leaky_relu(gn_pmajor(yp, W["gn_ps_s"], W["gn_ps_b"],
                                     dtype=dtype), 0.2)
    t = 0.5 * yb + 0.5 * yp
    z1 = conv3x3_22(t, cast(phase_kernel_2x2_pmajor(W["k_c1"])))
    z1 = jax.nn.leaky_relu(
        gn_pmajor_misaligned_to_aligned_keep(z1, W["gn_f_s"], W["gn_f_b"],
                                             dtype=dtype), 0.2)
    z2 = lax.conv_general_dilated(
        z1, cast(conv1x1_pmajor_kernel(W["k_c2"])), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z2 = z2 + jnp.tile(cast(W["b_c2"]), 4)
    return d2s_rev_crop_pmajor(jax.nn.sigmoid(z2.astype(jnp.float32)))


def gn_pmajor_misaligned_to_aligned_keep(z, scale, bias, n_groups=8,
                                         eps=1e-5, dtype=DT):
    """Misaligned GN that KEEPS the misaligned layout (normalizes the whole
    grid incl. border garbage, which the final crop drops). Stats from valid
    views only — exact."""
    b, h1, w1, c4 = z.shape
    h, w, c = h1 - 1, w1 - 1, c4 // 4
    cg = c // n_groups
    views = [z[:, a:a + h, bb:bb + w, (2 * a + bb) * c:(2 * a + bb + 1) * c]
             for a in (0, 1) for bb in (0, 1)]
    s = 0.0
    sq = 0.0
    for v in views:
        g = v.astype(jnp.float32).reshape(b, -1, n_groups, cg)
        s = s + jnp.sum(g, axis=(1, 3))
        sq = sq + jnp.sum(jnp.square(g), axis=(1, 3))
    n = h * w * 4 * cg
    mean = s / n
    var = sq / n - jnp.square(mean)
    mul = lax.rsqrt(var + eps)
    mean_c = jnp.tile(jnp.repeat(mean, cg, -1), (1, 4)).reshape(
        b, 1, 1, c4).astype(dtype)
    mul_c = jnp.tile(jnp.repeat(mul, cg, -1), (1, 4)).reshape(
        b, 1, 1, c4).astype(dtype)
    sc = jnp.tile(scale, 4).astype(dtype)
    bi = jnp.tile(bias, 4).astype(dtype)
    return (z.astype(dtype) - mean_c) * (mul_c * sc) + bi


def conv3x3_22(t, k2):
    return lax.conv_general_dilated(
        t, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def final_pmajor_partial(y, W, dtype=DT):
    """Candidate B: only conv_up in phase space; dense from the blend on."""
    cast = lambda a: a.astype(dtype)
    f = F
    t = upsample_phases_pmajor(y)
    z = conv3x3_22(t, cast(phase_kernel_2x2_pmajor(W["k_up"])))
    yb = gn_pmajor_misaligned_to_aligned(z, W["gn_up_s"], W["gn_up_b"],
                                         dtype=dtype)
    yb = jax.nn.leaky_relu(yb, 0.2)
    po = cm_to_pm_perm(f // 2)
    yp = conv3x3(y, cast(W["k_ps"])[:, :, :, po]) + cast(W["b_ps"])[po]
    yp = jax.nn.leaky_relu(gn_pmajor(yp, W["gn_ps_s"], W["gn_ps_b"],
                                     dtype=dtype), 0.2)
    t = 0.5 * yb + 0.5 * yp
    t = pixel_shuffle_pmajor(t)                                # dense 512^2
    t = conv3x3(t, cast(W["k_c1"]))
    t = jax.nn.leaky_relu(gn_dense(t, W["gn_f_s"], W["gn_f_b"],
                                   dtype=dtype), 0.2)
    t = conv1x1(t, cast(W["k_c2"])) + cast(W["b_c2"])
    return jax.nn.sigmoid(t.astype(jnp.float32))


# ----------------------------------------------------------------- harness

def timed(name, fn, x0):
    @jax.jit
    def chain(x, n):
        def body(_, a):
            out = fn(a)
            return a + (1e-20 * jnp.mean(out.astype(jnp.float32))).astype(a.dtype)
        return lax.fori_loop(0, n, body, x)

    def t(n):
        t0 = time.perf_counter()
        float(jnp.sum(chain(x0, n)))
        return time.perf_counter() - t0

    t(1)
    t1 = min(t(2) for _ in range(3))
    t2 = min(t(8) for _ in range(3))
    per = (t2 - t1) / 6
    print(f"{name:<44} {per * 1e3:8.2f} ms/step", flush=True)
    return per


def check_exact():
    rng = np.random.default_rng(1)
    W = make_weights(rng)
    y = jnp.asarray(rng.random((2, 32, 32, F), np.float32))
    d = jax.jit(lambda a: final_dense(a, W, dtype=jnp.float32))(y)
    a = jax.jit(lambda a: final_pmajor_full(a, W, dtype=jnp.float32))(y)
    b = jax.jit(lambda a: final_pmajor_partial(a, W, dtype=jnp.float32))(y)
    print(f"exactness fp32 (max|diff|): full={float(jnp.max(jnp.abs(a - d))):.3e}"
          f" partial={float(jnp.max(jnp.abs(b - d))):.3e}", flush=True)


def main():
    rng = np.random.default_rng(0)
    W = make_weights(rng)

    check_exact()

    y = jnp.asarray(rng.random((B, 256, 256, F), np.float32), DT)
    t64 = jnp.asarray(rng.random((B, 256, 256, 64), np.float32), DT)
    z64 = jnp.asarray(rng.random((B, 257, 257, 64), np.float32), DT)
    z4 = jnp.asarray(rng.random((B, 257, 257, 4), np.float32), DT)

    sc = jnp.ones((16,), jnp.float32)
    bi = jnp.zeros((16,), jnp.float32)
    timed("GN p-major aligned 256^2x64",
          lambda x: gn_pmajor(x, sc, bi), t64)
    timed("GN p-major misaligned->aligned 257^2x64",
          lambda x: gn_pmajor_misaligned_to_aligned(x, sc, bi), z64)
    timed("GN p-major misaligned (keep) 257^2x64",
          lambda x: gn_pmajor_misaligned_to_aligned_keep(x, sc, bi), z64)
    timed("d2s_rev_crop p-major (B,257,257,4) bf16",
          d2s_rev_crop_pmajor, z4)
    timed("pixel_shuffle p-major 256^2x64",
          pixel_shuffle_pmajor, t64)
    timed("phase conv 2x2 128->64 @257^2 (conv_up)",
          lambda x: conv3x3_22(
              x, phase_kernel_2x2_pmajor(
                  jnp.asarray(np.asarray(W["k_up"]))).astype(DT)),
          jnp.asarray(rng.random((B, 256, 256, 128), np.float32), DT))
    timed("phase conv 2x2 64->64 @257^2 (conv1)",
          lambda x: conv3x3_22(
              x, phase_kernel_2x2_pmajor(
                  jnp.asarray(np.asarray(W["k_c1"]))).astype(DT)), t64)

    print("--- composed final stage (B=128, 256^2xF input) ---", flush=True)
    timed("final DENSE (production)", lambda x: final_dense(x, W), y)
    timed("final p-major FULL (A)", lambda x: final_pmajor_full(x, W), y)
    timed("final p-major PARTIAL (B)", lambda x: final_pmajor_partial(x, W), y)


if __name__ == "__main__":
    main()
