#!/usr/bin/env python
"""Probe 2: COMPOSED int8 site cost vs bf16 at model shapes.

bench_int8_probe.py showed raw s8xs8->s32 convs run 1.78-2.02x faster, but
the end-to-end model gains only +6% (unet) / -5% (unet_tpu). This probe
times the full quantized SITE — producer(leaky) -> static quantize ->
int8 conv -> dequant+bias -> bf16 — against the bf16 site, per shape, to
locate the composition overhead (suspected: bf16<->int8 retiling + unfused
quantize/dequant passes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mri_superresolution_tpu.ops.quant import (int8_conv, quantize_tensor,
                                               weight_qparams)

B = 128


def timed(name, fn, *xs):
    @jax.jit
    def chain(n, *args):
        def body(_, a):
            out = fn(*a)
            d = 1e-20 * jnp.mean(out.astype(jnp.float32))
            return tuple(x + d.astype(x.dtype) for x in a)
        return lax.fori_loop(0, n, body, args)[0]

    def t(n):
        t0 = time.perf_counter()
        float(jnp.sum(chain(n, *xs).astype(jnp.float32)))
        return time.perf_counter() - t0

    t(1)
    t1 = min(t(2) for _ in range(3))
    t2 = min(t(8) for _ in range(3))
    per = (t2 - t1) / 6
    print(f"  {name:<48} {per * 1e3:8.2f} ms", flush=True)
    return per


def conv_bf16(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("enc 32->32 @256^2", (B, 256, 256, 32), (3, 3, 32, 32)),
        ("dec up3 64->32 @256^2", (B, 256, 256, 64), (3, 3, 64, 32)),
        ("dec up1 256->128 @64^2", (B, 64, 64, 256), (3, 3, 256, 128)),
        ("final 32->16 @512^2", (B, 512, 512, 32), (3, 3, 32, 16)),
        ("final 16->16 @512^2", (B, 512, 512, 16), (3, 3, 16, 16)),
    ]
    for name, xs, ks in shapes:
        print(f"-- {name}", flush=True)
        x = jnp.asarray(rng.random(xs, np.float32) - 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.random(ks, np.float32) - 0.5, jnp.bfloat16)
        qk, sk = weight_qparams(k)
        s = float(jnp.max(jnp.abs(x)) / 127.0)

        t_b = timed("bf16: leaky -> conv", lambda a: conv_bf16(
            jax.nn.leaky_relu(a, 0.2), k), x)
        t_q = timed("int8 site: leaky -> q -> conv -> dq",
                    lambda a: int8_conv(
                        quantize_tensor(jax.nn.leaky_relu(a, 0.2), s),
                        qk, sk, padding=1), x)
        t_quant_only = timed("quantize alone (leaky -> q)",
                             lambda a: quantize_tensor(
                                 jax.nn.leaky_relu(a, 0.2), s), x)
        xq = quantize_tensor(x, s)
        t_conv_only = timed("int8 conv alone (pre-quantized in)",
                            lambda a: int8_conv(a, qk, sk, padding=1), xq)
        print(f"  overhead: site-total {t_q * 1e3:.2f} vs "
              f"quant {t_quant_only * 1e3:.2f} + conv {t_conv_only * 1e3:.2f}",
              flush=True)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    main()
