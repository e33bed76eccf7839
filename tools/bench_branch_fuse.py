#!/usr/bin/env python
"""Probe: fuse unet_tpu's two parallel branch convs into one wide conv.

branch_a: conv3x3 32->64 @256^2, GN(8), leaky
branch_b: conv3x3 32->64 @256^2 (+bias), GN(8), leaky
blend: w*a + (1-w)*b

Exact rewrite: conv3x3 32->128 with channel-concatenated kernels, GN(16)
(same 8-channel group boundaries => identical statistics), leaky, split,
blend. Full 128 MXU output lanes instead of 2x 64.

RESULT (v5e, B=128): bit-exact (max diff 0.0) but the fused form is ~50%
SLOWER — split 10.44 ms vs fused 15.56 ms (with the following head conv:
12.78 vs 17.05). Consistent with every other probe in this repo: XLA's
conv codegen already beats the naive output-lane bound at Cout=64, and
the channel-slice split (y[..., :64] — lane slicing, the known-worst
primitive) plus the wider GN cost more than the lane gain. Negative
result; branch convs stay separate.

Single-arg chain carry (avoids the multi-arg rematerialization artifact
documented in bench_decoder_probe2.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

B = 128
DT = jnp.bfloat16


def timed(name, fn, x0):
    @jax.jit
    def chain(n, x):
        def body(_, a):
            out = fn(a)
            d = 1e-20 * jnp.mean(out.astype(jnp.float32))
            return a + d.astype(a.dtype)
        return lax.fori_loop(0, n, body, x)

    def t(n):
        t0 = time.perf_counter()
        float(jnp.sum(chain(n, x0).astype(jnp.float32)))
        return time.perf_counter() - t0

    t(1)
    t1 = min(t(2) for _ in range(3))
    t2 = min(t(8) for _ in range(3))
    per = (t2 - t1) / 6
    print(f"{name:<40} {per * 1e3:8.2f} ms", flush=True)
    return per


def conv(x, k, bias=None):
    y = lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if bias is None else y + bias


def gn_leaky(x, scale, bias, groups):
    y = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=DT).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    return nn.leaky_relu(y, 0.2)


def main():
    rng = np.random.default_rng(0)

    def mk(s, dt=DT):
        return jnp.asarray(rng.random(s, np.float32) - 0.3, dt)

    x = mk((B, 256, 256, 32))
    ka, kb = mk((3, 3, 32, 64)), mk((3, 3, 32, 64))
    bb = mk((64,), jnp.float32)
    sa, ba = mk((64,), jnp.float32), mk((64,), jnp.float32)
    sb, b2 = mk((64,), jnp.float32), mk((64,), jnp.float32)
    w = 0.37

    def split_version(a):
        ya = gn_leaky(conv(a, ka), sa, ba, 8)
        yb = gn_leaky(conv(a, kb, bb.astype(DT)), sb, b2, 8)
        return w * ya + (1.0 - w) * yb

    kf = jnp.concatenate([ka, kb], axis=-1)                # (3,3,32,128)
    bf = jnp.concatenate([jnp.zeros((64,)), bb]).astype(DT)
    sf = jnp.concatenate([sa, sb])
    bf2 = jnp.concatenate([ba, b2])

    def fused_version(a):
        y = gn_leaky(conv(a, kf, bf), sf, bf2, 16)
        return w * y[..., :64] + (1.0 - w) * y[..., 64:]

    # exactness check (fp32 on-device compare of the bf16 paths)
    d = float(jnp.max(jnp.abs(split_version(x).astype(jnp.float32)
                              - fused_version(x).astype(jnp.float32))))
    print(f"max |split - fused| = {d:.3e}", flush=True)

    timed("split: 2x(conv 32->64 + GN8 + leaky)", split_version, x)
    timed("fused: conv 32->128 + GN16 + leaky", fused_version, x)

    # head_conv context: does the split slice hurt the following conv?
    kh = mk((3, 3, 64, 64))

    def split_then_head(a):
        return conv(split_version(a), kh)

    def fused_then_head(a):
        return conv(fused_version(a), kh)

    timed("split + head conv 64->64", split_then_head, x)
    timed("fused + head conv 64->64", fused_then_head, x)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    main()
