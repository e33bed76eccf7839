"""Column-packed 3x3 convolution — an EXPERIMENTAL Pallas kernel targeting
the MXU N-lane bound for narrow output channels.

Why: a 3x3 conv with Cout=16 fills only 16 of the MXU's 128 output lanes;
XLA's conv runs at ~12% MXU utilization on such shapes (measured — see
tools/bench_ablation.py), and the reference U-Net's final stage is full of
them (Cout=16 at 512²). This kernel packs P = 128//Cout *consecutive output
columns* into the matmul's N dimension: each group of P output pixels is
produced by one (3·(P+2)·Cin) × (P·Cout) matmul against a host-built packed
weight matrix (kernel taps scattered per column phase, zeros elsewhere).
FLOP overhead is (P+2)/3 ≈ 3.3x for P=8, but N utilization improves 8x —
a theoretical ~2.4x net win on the N-bound shapes.

STATUS (v5e, jax 0.9 Mosaic): numerically exact (tests pass in interpret
mode and the kernel compiles and runs on hardware), but NOT faster — the
patch assembly (3·(P+2) sublane-indexed slices + scratch stores per strip)
lowers to relayout-heavy code that costs ~5x the matmul itself (measured
57 ms vs XLA's 10.8 ms for Cout=16 @512², batch 64). Mosaic currently has
no cheap lowering for these layout changes (lane-merging reshapes, offset
lane-concats, and <128-lane DMA slices are all rejected or slow — each
alternative was tried). Kept as a documented experiment; the production
path remains XLA's conv, and the architectural answer to the N-bound is
the `unet_tpu` model family (wide channels until a terminal
depth-to-space).

Semantics: stride 1, zero padding 1, NHWC, bias-free (the U-Net's convs are
bias-free before GroupNorm), bf16 inputs/weights with fp32 accumulation.
Forward-only here; `conv3x3_packed` wires a custom VJP through
``lax.conv_general_dilated``'s gradients so it is a drop-in replacement.
"""

from __future__ import annotations

import functools
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

    def body(x_ref, tb_ref, w_ref, o_ref, patch_ref):
        # x_ref: (1, h_tile, w+p, ci) — this strip's rows (non-overlapping
        # Blocked; overlapping windows aren't expressible with BlockSpecs and
        # Mosaic rejected both shifted-copy inputs (3x HBM) and manual DMA of
        # <128-lane slices). tb_ref: (1, 1, 2, w+p, ci) — the strip's
        # top/bottom halo rows, precomputed outside. The three row-shifted
        # views are assembled by sublane-concatenating halo rows with strip
        # slices. w_ref: packed weights; o_ref: (1, h_tile, groups, p*co).
        #
        # Patch assembly avoids lane-merging reshapes (Mosaic rejects
        # vector<...x512x32> -> <...x64x256> shape casts): the W axis is
        # sublane-split into (groups, p), taps are sublane-indexed slices
        # stored into the patch scratch at their K offset.
        wp = w_ref[...]
        strip = x_ref[0]                                   # (h_tile, w+p, ci)
        top = tb_ref[0, 0, 0:1]                            # (1, w+p, ci)
        bottom = tb_ref[0, 0, 1:2]
        t = 0
        for dh in range(3):
            if dh == 0:
                rows = jnp.concatenate([top, strip[:h_tile - 1]], axis=0)
            elif dh == 1:
                rows = strip
            else:
                rows = jnp.concatenate([strip[1:], bottom], axis=0)
            v0 = rows[:, :w, :].reshape(h_tile, groups, p, ci)
            v1 = rows[:, p:p + w, :].reshape(h_tile, groups, p, ci)
            for dwp in range(p + 2):
                src = v0 if dwp < p else v1
                piece = src[:, :, dwp % p, :]              # (h, g, ci)
                patch_ref[:, t * ci:(t + 1) * ci] = piece.reshape(
                    h_tile * groups, ci)
                t += 1
        y = jnp.dot(patch_ref[...], wp,
                    preferred_element_type=jnp.float32)
        # output stays packed as (h, groups, p*co): unpacking to (h, w, co)
        # is a contiguous (free) reshape done by XLA outside the kernel
        o_ref[0] = y.reshape(h_tile, groups, p * co).astype(o_ref.dtype)

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

    # pad columns: 1 left and p-1 right (the packed patch windows read up to
    # column W+1; the extra zero columns keep the strided tail view
    # reshapeable). Rows stay unpadded — each strip's top/bottom halo rows
    # are gathered into a tiny side array (2/h_tile of the input).
    wpad = max(p - 1, 1)
    xw = jnp.pad(x, ((0, 0), (0, 0), (1, wpad), (0, 0)))
    n_strips = h // h_tile
    zrow = jnp.zeros((b, 1, w + wpad + 1, ci), x.dtype)
    # top halo of strip j is row j*h_tile - 1 (zeros for j=0)
    tops = jnp.concatenate(
        [zrow, xw[:, h_tile - 1:h - 1:h_tile, :, :]], axis=1)
    # bottom halo of strip j is row (j+1)*h_tile (zeros for the last strip)
    bottoms = jnp.concatenate(
        [xw[:, h_tile::h_tile, :, :], zrow], axis=1)
    halos = jnp.stack([tops, bottoms], axis=2)  # (b, n_strips, 2, w+p, ci)

    grid = (b, n_strips)
    groups = w // p
    out = pl.pallas_call(
        _kernel_body(h_tile, w, ci, co, p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h_tile, w + wpad + 1, ci),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, w + wpad + 1, ci),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_tile, groups, p * co),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, groups, p * co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h_tile * (w // p), 3 * (p + 2) * ci), x.dtype),
        ],
        interpret=interpret,
    )(xw, halos, wp)
    return out.reshape(b, h, w, co)


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
