"""Column-packed 3x3 convolution — a Pallas kernel that beats the MXU
N-lane bound for narrow output channels.

Why: a 3x3 conv with Cout=16 fills only 16 of the MXU's 128 output lanes;
XLA's conv runs at ~12% MXU utilization on such shapes (measured — see
tools/bench_ablation.py), and the reference U-Net's final stage is full of
them (Cout=16 at 512²). This kernel packs P = 128//Cout *consecutive output
columns* into the matmul's N dimension: each group of P output pixels is
produced by one (3·(P+2)·Cin) × (P·Cout) matmul against a host-built packed
weight matrix (kernel taps scattered per column phase, zeros elsewhere).
FLOP overhead is (P+2)/3 ≈ 3.3x for P=8, but N utilization improves 8x —
a ~2.4x net win on the N-bound shapes.

Semantics: stride 1, zero padding 1, NHWC, bias-free (the U-Net's convs are
bias-free before GroupNorm), bf16 inputs/weights with fp32 accumulation.
Forward-only here; `conv3x3_packed` wires a custom VJP through
``lax.conv_general_dilated``'s gradients so it is a drop-in replacement.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_weights(kernel: jnp.ndarray, p: int) -> jnp.ndarray:
    """(3, 3, Ci, Co) HWIO kernel → packed (3*(P+2)*Ci, P*Co) matrix.

    Row index = (dh, dw_patch, ci) over a (3, P+2, Ci) input patch whose
    columns start one pixel left of the output group; column index =
    (p_col, co). Entry = kernel[dh, dw_patch - p_col, ci, co] when the tap
    falls inside the 3-tap window of that output column.
    """
    kh, kw, ci, co = kernel.shape
    assert (kh, kw) == (3, 3)
    k = kernel.astype(jnp.float32)
    w = jnp.zeros((3, p + 2, ci, p, co), jnp.float32)
    for pc in range(p):  # static unroll; traceable
        for dw in range(3):
            w = w.at[:, pc + dw, :, pc, :].set(k[:, dw, :, :])
    return w.reshape(3 * (p + 2) * ci, p * co)


def _kernel_body(h_tile: int, w: int, ci: int, co: int, p: int):
    groups = w // p

    def body(x0_ref, x1_ref, x2_ref, w_ref, o_ref):
        # x{dh}_ref: (1, h_tile, w+p, ci) — the strip's rows shifted by dh
        # (three inputs so every BlockSpec is plain non-overlapping Blocked);
        # w_ref packed weights; o_ref: (1, h_tile, w, co)
        wp = w_ref[...]
        blocks = []
        for rows_ref in (x0_ref, x1_ref, x2_ref):
            rows = rows_ref[0]                             # (h_tile, w+p, ci)
            main = rows[:, :w, :].reshape(h_tile, groups, p * ci)
            tail = rows[:, p:p + w, :].reshape(h_tile, groups, p, ci)
            tail2 = tail[:, :, :2, :].reshape(h_tile, groups, 2 * ci)
            blocks.append(jnp.concatenate([main, tail2], axis=-1))
        patches = jnp.concatenate(blocks, axis=-1)         # (h, g, 3(P+2)Ci)
        patches = patches.reshape(h_tile * groups, 3 * (p + 2) * ci)
        y = jnp.dot(patches, wp, preferred_element_type=jnp.float32)
        y = y.reshape(h_tile, groups, p, co).reshape(h_tile, w, co)
        o_ref[0] = y.astype(o_ref.dtype)

    return body


@functools.partial(jax.jit, static_argnames=("h_tile", "interpret"))
def conv3x3_packed_fwd(x: jnp.ndarray, kernel: jnp.ndarray,
                       h_tile: int = 64, interpret: bool = False
                       ) -> jnp.ndarray:
    """Forward conv3x3 (stride 1, pad 1, no bias) on (B, H, W, Ci) NHWC."""
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    p = max(128 // co, 1)
    assert w % p == 0, f"W={w} must divide the packing factor {p}"
    assert h % h_tile == 0, f"H={h} must divide h_tile={h_tile}"
    wp = pack_weights(kernel, p).astype(x.dtype)

    # pad: 1 row top/bottom; 1 column left and p-1 right (the packed patch
    # windows read up to column W+1; the extra zero columns keep the strided
    # tail view reshapeable). Three row-shifted copies give each grid strip
    # its dh = 0/1/2 rows through plain non-overlapping Blocked specs.
    wpad = max(p - 1, 1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad), (0, 0)))
    shifted = tuple(xp[:, dh:dh + h, :, :] for dh in range(3))
    grid = (b, h // h_tile)
    strip_spec = pl.BlockSpec((1, h_tile, w + wpad + 1, ci),
                              lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel_body(h_tile, w, ci, co, p),
        grid=grid,
        in_specs=[strip_spec, strip_spec, strip_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h_tile, w, co),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        interpret=interpret,
    )(*shifted, wp)
    return out


def _xla_conv(x, kernel):
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, kernel, (1, 1), [(1, 1), (1, 1)],
                                    dimension_numbers=dn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_packed(x: jnp.ndarray, kernel: jnp.ndarray,
                   h_tile: int = 64, interpret: bool = False) -> jnp.ndarray:
    """Drop-in conv3x3: packed Pallas forward, XLA-derived backward."""
    return conv3x3_packed_fwd(x, kernel, h_tile, interpret)


def _fwd(x, kernel, h_tile, interpret):
    return conv3x3_packed_fwd(x, kernel, h_tile, interpret), (x, kernel)


def _bwd(h_tile, interpret, res, g):
    x, kernel = res
    _, vjp = jax.vjp(lambda a, k: _xla_conv(a, k), x, kernel)
    return vjp(g)


conv3x3_packed.defvjp(_fwd, _bwd)
