"""One-pass fused GroupNorm + LeakyReLU (+ residual add) Pallas TPU kernel.

STATUS: numerically exact, fully tested, but a measured LOSS on hardware —
kept as a documented experiment (like ops/conv_pallas.py), NOT wired into
the models. tools/bench_gn_probe.py on the real v5e chip (B=128 bf16):

    shape            3-pass floor   XLA GN+leaky   this kernel
    (512,512,16)        3.93 ms        6.47 ms       11.58 ms
    (256,256,32)        1.97 ms        2.98 ms        5.92 ms
    (128,128,64)        0.98 ms        1.13 ms        3.16 ms
    (64,64,128)         0.49 ms        0.68 ms        1.66 ms

The kernel's theoretical 2-pass floor (~2.6 ms at the largest shape) is
never approached: Mosaic's lowering of the phase-split grid runs ~4.4x off
the bandwidth bound, and in-model XLA does even better than the standalone
XLA numbers above because it fuses the normalize pass into the neighbouring
conv reads (measured in-model GN cost ~4.5 ms at (512,512,16), near its
3-pass floor). Conclusion: standalone-op Pallas rewrites of
bandwidth-bound ops lose to XLA's cross-op fusion on this toolchain; do
not re-integrate without a fundamentally new idea.

Motivation (measured, tools/bench_gn_probe.py): the parity U-Net runs 20
GroupNorm+LeakyReLU pairs per forward (reference models/unet_model.py uses
``nn.GroupNorm(8, c)`` after every conv). XLA lowers each as a two-pass
algorithm — read the tensor to reduce statistics, then read it again to
normalize — i.e. 3 HBM passes (2 reads + 1 write) of an activation tensor
that is purely bandwidth-bound. This kernel does it in 2 passes (1 read +
1 write): the image is staged through VMEM once, group statistics are
accumulated while it streams in, and the normalize+activation(+residual)
is applied from the VMEM-resident copy on the way out.

Layout strategy (the part that makes this kernel viable where the
column-packed conv kernel was not, see ops/conv_pallas.py): the (W, C)
axes are flattened into the lane dimension, so every block is a dense
(rows x W*C) tile with full 128-lane utilization — no lane-strided slices,
no sub-128 channel tiles, no relayouts. Per-group sums over the
channel-interleaved lanes are computed with a tiny one-hot matmul
(G x W*C one-hot membership matrix on the MXU), and per-lane mean/rstd are
expanded back from (1, G) with the same matrix. W*C must be a multiple of
128 (true everywhere in the 256^2 pipeline: every stage has W*C = 8192);
anything else falls back to an equivalent jnp implementation.

Grid design: ``(B, 2, n_chunks)`` — for each image, phase 0 streams H-chunks
HBM->VMEM (auto-pipelined by Pallas) into a persistent full-image scratch
while accumulating (sum, sum-of-squares) per group; phase 1 computes
mean/rstd once, folds scale/bias into per-lane affine coefficients, and
streams normalized chunks out. Input blocks at phase 1 are pinned to the
last phase-0 index (same index => no re-DMA) and output blocks at phase 0
are pinned to the first phase-1 index (same index => garbage is never
flushed); this is what keeps HBM traffic at exactly one read + one write.

Numerics match ``flax.linen.GroupNorm(num_groups, epsilon)`` followed by
``nn.leaky_relu``: statistics in float32 regardless of input dtype, affine
in float32, single cast back to the input dtype at the end.

Gradients: ``jax.custom_vjp`` with an analytic float32 GroupNorm backward
(standard three-reduction formula) implemented in jnp, so the op is a
drop-in differentiable replacement inside the training step.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Target bytes per streamed H-chunk. Chosen so the VMEM budget at the
# largest model shape (512 x 8192 bf16 = 8.4 MB image scratch) stays well
# under the ~16 MB/core limit: scratch + 2x double-buffered in + 2x out +
# float32 elementwise temps.
_CHUNK_TARGET_BYTES = 1 << 20


def _pick_chunks(h: int, row_bytes: int) -> int:
    """Largest power-of-two chunk count dividing h with chunks <= target
    (>= 1). Whole image as one chunk when small enough."""
    nc = 1
    while (h % (nc * 2) == 0
           and (h // nc) * row_bytes > _CHUNK_TARGET_BYTES):
        nc *= 2
    return nc


@functools.lru_cache(maxsize=64)
def _group_matrix(w: int, c: int, n_groups: int) -> np.ndarray:
    """(G, W*C) float32 one-hot group membership of each flattened lane."""
    lane_ch = np.arange(w * c) % c
    lane_grp = lane_ch // (c // n_groups)
    m = np.zeros((n_groups, w * c), np.float32)
    m[lane_grp, np.arange(w * c)] = 1.0
    return m


def _make_kernel(h: int, wc: int, n_groups: int, nc: int,
                 negative_slope: float, epsilon: float, has_res: bool):
    r = h // nc
    n_per_group = (h * wc) // n_groups

    def kernel(*refs):
        if has_res:
            x_ref, gam_ref, bet_ref, m_ref, res_ref, out_ref = refs[:6]
            img_ref, sums_ref, ab_ref = refs[6:]
        else:
            x_ref, gam_ref, bet_ref, m_ref, out_ref = refs[:5]
            img_ref, sums_ref, ab_ref = refs[5:]

        p = pl.program_id(1)
        hb = pl.program_id(2)

        @pl.when(p == 0)
        def _stats_phase():
            chunk = x_ref[0]
            if nc > 1:
                img_ref[pl.ds(pl.multiple_of(hb * r, r), r), :] = chunk
            cf = chunk.astype(jnp.float32)
            s12 = jnp.concatenate(
                [jnp.sum(cf, axis=0, keepdims=True),
                 jnp.sum(cf * cf, axis=0, keepdims=True)], axis=0)
            # per-group partials: contract lanes against the one-hot matrix
            part = jax.lax.dot_general(
                s12, m_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (2, G)

            @pl.when(hb == 0)
            def _():
                sums_ref[:] = part

            @pl.when(hb > 0)
            def _():
                sums_ref[:] = sums_ref[:] + part

        @pl.when(p == 1)
        def _apply_phase():
            @pl.when(hb == 0)
            def _():
                mean = sums_ref[0:1] / n_per_group            # (1, G)
                var = sums_ref[1:2] / n_per_group - mean * mean
                rstd = jax.lax.rsqrt(var + epsilon)
                # expand (1, G) -> (1, W*C) lanes through the same matrix
                rstd_l = jax.lax.dot_general(
                    rstd, m_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                mean_l = jax.lax.dot_general(
                    mean, m_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                a = gam_ref[:] * rstd_l
                ab_ref[0:1] = a
                ab_ref[1:2] = bet_ref[:] - mean_l * a

            if nc > 1:
                src = img_ref[pl.ds(pl.multiple_of(hb * r, r), r), :]
            else:
                src = x_ref[0]
            z = src.astype(jnp.float32) * ab_ref[0:1] + ab_ref[1:2]
            z = jnp.where(z >= 0, z, negative_slope * z)
            if has_res:
                z = z + res_ref[0].astype(jnp.float32)
            out_ref[0] = z.astype(out_ref.dtype)

    return kernel


def _pallas_forward(x, scale, bias, residual, n_groups, negative_slope,
                    epsilon, interpret):
    b, h, w, c = x.shape
    wc = w * c
    nc = _pick_chunks(h, wc * x.dtype.itemsize)
    r = h // nc
    has_res = residual is not None

    gamma_l = jnp.tile(scale.astype(jnp.float32), w).reshape(1, wc)
    beta_l = jnp.tile(bias.astype(jnp.float32), w).reshape(1, wc)
    m = jnp.asarray(_group_matrix(w, c, n_groups))

    x_spec = pl.BlockSpec(
        (1, r, wc),
        lambda bb, p, hb: (bb, jnp.where(p == 0, hb, nc - 1), 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, r, wc),
        lambda bb, p, hb: (bb, jnp.where(p == 1, hb, 0), 0),
        memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, wc), lambda bb, p, hb: (0, 0),
                              memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((n_groups, wc), lambda bb, p, hb: (0, 0),
                          memory_space=pltpu.VMEM)

    in_specs = [x_spec, const_spec, const_spec, m_spec]
    args = [x.reshape(b, h, wc), gamma_l, beta_l, m]
    if has_res:
        in_specs.append(pl.BlockSpec(
            (1, r, wc),
            lambda bb, p, hb: (bb, jnp.where(p == 1, hb, 0), 0),
            memory_space=pltpu.VMEM))
        args.append(residual.reshape(b, h, wc))

    out = pl.pallas_call(
        _make_kernel(h, wc, n_groups, nc, negative_slope, epsilon, has_res),
        grid=(b, 2, nc),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, wc), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, wc) if nc > 1 else (1, wc), x.dtype),
            pltpu.VMEM((2, n_groups), jnp.float32),
            pltpu.VMEM((2, wc), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, w, c)


def _ref_forward(x, scale, bias, residual, n_groups, negative_slope, epsilon):
    """jnp fallback with the same float32 numerics as the kernel."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, n_groups, c // n_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(xf * xf, axis=(1, 2, 4), keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + epsilon)
    y = y.reshape(b, h, w, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = jnp.where(y >= 0, y, negative_slope * y)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


def pallas_supported(x_shape, x_dtype, n_groups: int) -> bool:
    """Shape/platform gate for the fused kernel."""
    if jax.default_backend() != "tpu":
        return False
    # Under jit-GSPMD a pallas_call does not auto-partition over a sharded
    # batch axis; restrict the fused path to single-device processes (the
    # jnp fallback keeps multi-chip DP correct; shard_map-based paths like
    # parallel/spatial.py use their own collectives and per-shard shapes).
    if jax.device_count() != 1:
        return False
    if len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    if c % n_groups != 0 or (w * c) % 128 != 0:
        return False
    if jnp.dtype(x_dtype) not in (jnp.dtype(jnp.bfloat16),
                                  jnp.dtype(jnp.float32)):
        return False
    # whole image must fit in VMEM scratch alongside the stream buffers,
    # and the per-chunk block must stay near the chunk target — an H whose
    # power-of-two factor runs out early (e.g. 514 = 2 * 257) would leave
    # oversized chunks that blow the VMEM budget at compile time
    row_bytes = w * c * jnp.dtype(x_dtype).itemsize
    img_bytes = h * row_bytes
    nc = _pick_chunks(h, row_bytes)
    if nc > 1 and (h // nc) * row_bytes > 2 * _CHUNK_TARGET_BYTES:
        return False  # chunking stalled on an odd factor; chunks too big
    if nc == 1 and img_bytes > 2 * _CHUNK_TARGET_BYTES:
        return False  # odd h too large to chunk
    return img_bytes <= 9 * (1 << 20)


def _forward(x, scale, bias, residual, n_groups, negative_slope, epsilon,
             interpret):
    if interpret or pallas_supported(x.shape, x.dtype, n_groups):
        return _pallas_forward(x, scale, bias, residual, n_groups,
                               negative_slope, epsilon, interpret)
    return _ref_forward(x, scale, bias, residual, n_groups, negative_slope,
                        epsilon)


def _backward(x, scale, bias, n_groups, negative_slope, epsilon, g):
    """Analytic GroupNorm+LeakyReLU backward (float32)."""
    b, h, w, c = x.shape
    cg = c // n_groups
    xf = x.astype(jnp.float32).reshape(b, h, w, n_groups, cg)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(xf * xf, axis=(1, 2, 4), keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + epsilon)
    xhat = (xf - mean) * rstd                                # (b,h,w,G,cg)
    sc = scale.astype(jnp.float32).reshape(n_groups, cg)
    z = xhat * sc + bias.astype(jnp.float32).reshape(n_groups, cg)

    gf = g.astype(jnp.float32).reshape(b, h, w, n_groups, cg)
    dz = gf * jnp.where(z >= 0, 1.0, negative_slope)
    dscale = jnp.sum(dz * xhat, axis=(0, 1, 2)).reshape(c)
    dbias = jnp.sum(dz, axis=(0, 1, 2)).reshape(c)

    dxhat = dz * sc
    m1 = jnp.mean(dxhat, axis=(1, 2, 4), keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=(1, 2, 4), keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    return (dx.reshape(b, h, w, c).astype(x.dtype),
            dscale.astype(scale.dtype), dbias.astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_leaky(x, scale, bias, n_groups, negative_slope, epsilon, interpret):
    return _forward(x, scale, bias, None, n_groups, negative_slope, epsilon,
                    interpret)


def _gn_leaky_fwd(x, scale, bias, n_groups, negative_slope, epsilon,
                  interpret):
    y = _forward(x, scale, bias, None, n_groups, negative_slope, epsilon,
                 interpret)
    return y, (x, scale, bias)


def _gn_leaky_bwd(n_groups, negative_slope, epsilon, interpret, res, g):
    x, scale, bias = res
    return _backward(x, scale, bias, n_groups, negative_slope, epsilon, g)


_gn_leaky.defvjp(_gn_leaky_fwd, _gn_leaky_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _gn_leaky_res(x, scale, bias, residual, n_groups, negative_slope,
                  epsilon, interpret):
    return _forward(x, scale, bias, residual, n_groups, negative_slope,
                    epsilon, interpret)


def _gn_leaky_res_fwd(x, scale, bias, residual, n_groups, negative_slope,
                      epsilon, interpret):
    y = _forward(x, scale, bias, residual, n_groups, negative_slope, epsilon,
                 interpret)
    return y, (x, scale, bias, residual)


def _gn_leaky_res_bwd(n_groups, negative_slope, epsilon, interpret, res, g):
    x, scale, bias, residual = res
    dx, dscale, dbias = _backward(x, scale, bias, n_groups, negative_slope,
                                  epsilon, g)
    return dx, dscale, dbias, g.astype(residual.dtype)


_gn_leaky_res.defvjp(_gn_leaky_res_fwd, _gn_leaky_res_bwd)


def fused_group_norm_leaky(x, scale, bias, *, n_groups: int = 8,
                           negative_slope: float = 0.2,
                           epsilon: float = 1e-5, residual=None,
                           interpret: bool = False):
    """``leaky_relu(group_norm(x) * scale + bias) [+ residual]`` — one-pass
    fused Pallas kernel on TPU, equivalent jnp math elsewhere.

    x: (B, H, W, C); scale/bias: (C,); residual: broadcast-compatible with
    the output (same shape). Returns x.dtype.
    """
    if residual is None:
        return _gn_leaky(x, scale, bias, n_groups, negative_slope, epsilon,
                         interpret)
    return _gn_leaky_res(x, scale, bias, residual, n_groups, negative_slope,
                         epsilon, interpret)
