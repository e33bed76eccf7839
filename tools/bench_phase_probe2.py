#!/usr/bin/env python
"""Probe 2: where did the phase-space final stage lose 37 ms?

Suspects are the layout ops, not the convs: c-major channel interleaves
(stack+reshape) and strided-lane slices (p::4) force Mosaic/XLA relayouts.
Times each layout op and the p-major (concat/contiguous-slice) alternates.
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
DT = jnp.bfloat16


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
    print(f"{name:<46} {per * 1e3:8.2f} ms/step", flush=True)
    return per


def upsample_phases_pmajor(x):
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


def align_pmajor(z):
    b, h1, w1, c4 = z.shape
    h, w, c = h1 - 1, w1 - 1, c4 // 4
    parts = [z[:, a:a + h, bb:bb + w, (2 * a + bb) * c:(2 * a + bb + 1) * c]
             for a in (0, 1) for bb in (0, 1)]
    return jnp.concatenate(parts, axis=-1)


def main():
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.random(shape, np.float32), DT)

    y = mk((B, 256, 256, 32))
    timed("dense bilinear up 512^2 (matmuls)",
          lambda x: upsample_bilinear_align_corners(x, 2), y)
    timed("upsample phases c-major (stack interleave)",
          phase_ops.upsample_bilinear_phases, y)
    timed("upsample phases p-major (concat)", upsample_phases_pmajor, y)

    z = mk((B, 257, 257, 64))
    timed("align_phase c-major (strided slices)", phase_ops.align_phase, z)
    timed("align p-major (contiguous slices)", align_pmajor, z)

    t = mk((B, 256, 256, 64))
    from mri_superresolution_tpu.models.unet import pixel_shuffle
    timed("pixel_shuffle 256^2x64 -> 512^2x16", lambda x: pixel_shuffle(x), t)

    sc = jnp.ones((16,), jnp.float32)
    bi = jnp.zeros((16,), jnp.float32)
    timed("phase GN aligned 256^2x64",
          lambda x: phase_ops.phase_group_norm(x, sc, bi, 8, dtype=DT), t)
    timed("phase GN misaligned 257^2x64",
          lambda x: phase_ops.phase_group_norm_misaligned(x, sc, bi, 8,
                                                          dtype=DT), z)

    zf = jnp.asarray(rng.random((B, 257, 257, 4), np.float32))
    timed("d2s_rev_crop fp32 (B,257,257,4)",
          phase_ops.depth_to_space_rev_crop, zf)


if __name__ == "__main__":
    main()
