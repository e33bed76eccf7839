#!/usr/bin/env python
"""Probe 4: batch-to-channel folding for the lane-starved final-stage convs.

Idea: the final stage's convs have Cout<=16 at 512^2 (<=16 of 128 MXU output
lanes). Folding 8 batch images into the channel axis — (128,512,512,16) ->
(16,512,512,128) — and running the conv as a feature_group_count=8 grouped
conv with the kernel replicated per group is EXACT (groups don't mix) and
fills the lanes. Whether it wins depends entirely on XLA's grouped-conv
lowering on TPU, which this probe measures, along with the fold/unfold
relayout costs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B = 128
FOLD = 8
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
    print(f"{name:<52} {per * 1e3:8.2f} ms/step", flush=True)
    return per


def conv(x, k, groups=1):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def fold(x):
    """(B,H,W,C) -> (B/FOLD, H, W, FOLD*C); channel = img*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b // FOLD, FOLD, h, w, c)
    return x.transpose(0, 2, 3, 1, 4).reshape(b // FOLD, h, w, FOLD * c)


def unfold(x, c):
    b8, h, w, fc = x.shape
    x = x.reshape(b8, h, w, FOLD, c).transpose(0, 3, 1, 2, 4)
    return x.reshape(b8 * FOLD, h, w, c)


def rep_kernel(k):
    """(kh,kw,ci,co) -> (kh,kw,ci,FOLD*co) grouped-replicated: group g
    (input channels g*ci..) produces output channels g*co.. with the SAME
    kernel."""
    return jnp.tile(k, (1, 1, 1, FOLD))


def check_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((FOLD * 2, 16, 16, 4), np.float32))
    k = jnp.asarray(rng.normal(0, 0.3, (3, 3, 4, 6)), np.float32)
    d = conv(x, k)
    g = unfold(conv(fold(x), rep_kernel(k), groups=FOLD), 6)
    print(f"grouped-fold exactness: {float(jnp.max(jnp.abs(d - g))):.3e}",
          flush=True)


# folded GroupNorm-8 per image: channel = img*16 + c, groups of 2 —
# contiguous split (FOLD, 8, 2)
def gn_folded(t, eps=1e-5):
    b8, h, w, fc = t.shape
    xf = t.astype(jnp.float32).reshape(b8, -1, FOLD, 8, 2)
    n = h * w * 2
    mean = jnp.sum(xf, axis=(1, 4)) / n                  # (b8, FOLD, 8)
    var = jnp.sum(jnp.square(xf), axis=(1, 4)) / n - jnp.square(mean)
    mul = lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean.reshape(b8, -1), 2, -1).reshape(b8, 1, 1, fc)
    mul_c = jnp.repeat(mul.reshape(b8, -1), 2, -1).reshape(b8, 1, 1, fc)
    return (t - mean_c.astype(DT)) * mul_c.astype(DT)


def main():
    check_exact()
    rng = np.random.default_rng(0)
    k_16_16 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 16)), DT)
    k_32_16 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 32, 16)), DT)

    def mk(shape):
        # allocate per test; previous buffer is dropped before the next
        return jnp.asarray(rng.random(shape, np.float32), DT)

    cases = [
        ("dense conv 16->16 @512^2 (conv1)",
         lambda a: conv(a, k_16_16), (B, 512, 512, 16)),
        ("dense conv 32->16 @512^2 (conv_up)",
         lambda a: conv(a, k_32_16), (B, 512, 512, 32)),
        ("folded grouped conv 128->128 G=8 (conv1)",
         lambda a: conv(a, rep_kernel(k_16_16), groups=FOLD),
         (B // FOLD, 512, 512, 128)),
        ("folded grouped conv 256->128 G=8 (conv_up)",
         lambda a: conv(a, rep_kernel(k_32_16), groups=FOLD),
         (B // FOLD, 512, 512, 256)),
        ("fold relayout (128,512,512,16)->(16,...,128)",
         fold, (B, 512, 512, 16)),
        ("unfold relayout (16,512,512,128)->(128,...,16)",
         lambda a: unfold(a, 16), (B // FOLD, 512, 512, 128)),
        ("folded GN(8)/image 512^2x128",
         gn_folded, (B // FOLD, 512, 512, 128)),
    ]
    for name, fn, shape in cases:
        x = mk(shape)
        try:
            timed(name, fn, x)
        except Exception as e:
            print(f"{name:<52} FAILED ({type(e).__name__})", flush=True)
        del x


if __name__ == "__main__":
    main()
