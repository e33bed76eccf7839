"""On-device dihedral test-time-augmentation ensemble.

The serving engine's ``--tta`` averages the model over the dihedral
transforms of the input: mean_t t^-1(upscale(t(x))) — the 8 symmetries of
the square when h == w, the 4 axis flips otherwise (the reference has no
TTA; this is a framework extension, measured +0.65/+1.22 dB PSNR in
RESULTS.md §5i).

Two equivalent evaluation strategies exist and the engine picks per batch:

- **host loop** (infer/engine.py ``upscale_batch``): each transform is a
  numpy view and the ONE compiled single-forward program serves all of
  them. Cheap to compile, but every transform is a full host->device
  upload, a synchronous forward, and a device->host fetch — 8 serialized
  round trips per batch (the upload alone is 8x the data motion, and on
  the axon tunnel each fetch is a blocking RPC).
- **on-device ensemble** (this module): the transforms, forwards,
  accumulation and mean are traced into a single jitted program; the
  batch crosses the host<->device boundary ONCE each way. The forwards
  run under a ``lax.fori_loop`` over the stacked transformed inputs —
  ONE forward body in the program (compile cost ~= the single forward)
  whose intermediates are reused across iterations (inlining all 8
  bodies instead lets XLA keep every member's intermediates live at
  once: measured 18.0 GB > the chip's 15.75 GB HBM at batch 64x256^2);
  each member's inverse transform is applied by ``lax.switch`` before a
  fp32 accumulate, so peak memory is one forward + one (N,2H,2W,C)
  accumulator.

Exactness under shape bucketing: a dihedral transform of a zero-PADDED
array is not the padding of the transformed image (the pad rows land on
the wrong side, shifting pooling-grid alignment), so the ensemble NEVER
transforms a padded buffer — it takes the unpadded batch, transforms each
member, and zero-pads to the bucket INSIDE the traced body (then crops
the forward's output back to 2h x 2w before the inverse), which is
exactly the host loop's transform-then-pad order in
``infer/engine.py _upscale_once``. Within that contract the two
strategies are the same math evaluated in the same precision: forward
(with its [0,1] clip) per transform, crop, inverse, fp32 accumulate,
divide.
"""

from typing import Callable

import jax.numpy as jnp

__all__ = ["dihedral_pairs", "build_tta_ensemble"]


def _identity(x: jnp.ndarray) -> jnp.ndarray:
    return x


def _flip_h(x: jnp.ndarray) -> jnp.ndarray:
    return x[:, ::-1]


def _flip_w(x: jnp.ndarray) -> jnp.ndarray:
    return x[:, :, ::-1]


def _flip_hw(x: jnp.ndarray) -> jnp.ndarray:
    return x[:, ::-1, ::-1]


def _transpose(x: jnp.ndarray) -> jnp.ndarray:
    # swap the spatial axes only; works for NHWC and channel-less NHW
    # (pure method call, so numpy arrays stay numpy)
    return x.swapaxes(1, 2)


def dihedral_pairs(square: bool):
    """(transform, inverse) pairs on batched spatial arrays.

    The 4 axis flips are involutions (inverse == transform). With
    ``square`` the 4 transpose-composed elements are added: t = f . T has
    t^-1 = T . f (both f and T are involutions). The first pair is always
    the identity (the engine's int8-calibration contract keys on it).
    Every pair is pure indexing/axis-swapping on axes 1–2, so the SAME
    list serves the traced NHWC ensemble below and the engine's host-side
    numpy (N, H, W) loop (infer/engine.py ``upscale_batch``) — one copy,
    one member order.
    """
    pairs = [(_identity, _identity), (_flip_h, _flip_h),
             (_flip_w, _flip_w), (_flip_hw, _flip_hw)]
    if square:
        pairs += [(lambda x, f=f: f(_transpose(x)),
                   lambda y, f=f: _transpose(f(y)))
                  for f, _ in list(pairs)]
    return pairs


def build_tta_ensemble(forward: Callable, square: bool,
                       bucket_fn: Callable = None) -> Callable:
    """Wrap ``forward(params, x)`` into the traced dihedral mean.

    ``forward`` must be shape-preserving up to the 2x upscale and include
    its own output clip; the ensemble accumulates each inverse-transformed
    output in fp32 (same member order as the host loop) and returns the
    mean — one jit-able function whose single dispatch replaces
    n_transforms host round trips, with the members evaluated
    sequentially under ``lax.fori_loop`` so only ONE forward's
    intermediates are ever live (see module docstring for the measured
    OOM the inlined form hits).

    ``bucket_fn(h, w) -> (bh, bw)`` (the engine passes ``_bucket_hw``)
    sets the spatial shape the forward actually runs at: each transformed
    member is zero-padded to the bucket inside the loop body — AFTER its
    dihedral transform, matching the host loop's order — and the output
    is cropped back to (2h, 2w) before the inverse. The pad target is
    resolved from the static input shape at trace time, so one ensemble
    callable serves every shape jit specializes on. With no ``bucket_fn``
    (or one that returns (h, w)) the pad/crop trace away entirely.
    """
    from jax import lax

    pairs = dihedral_pairs(square)
    invs = [inv for _, inv in pairs]

    def ensemble(params, x):
        n, h, w, c = x.shape
        bh, bw = bucket_fn(h, w) if bucket_fn is not None else (h, w)
        # stack the transforms UNPADDED (pad after transform, like the
        # host loop; also keeps the (T, ...) buffer at input size)
        xs = jnp.stack([t(x) for t, _ in pairs])      # (T, N, H, W, C)

        def body(i, acc):
            xi = xs[i]
            if (bh, bw) != (h, w):
                xi = jnp.pad(xi, ((0, 0), (0, bh - h), (0, bw - w), (0, 0)))
            y = forward(params, xi).astype(jnp.float32)
            # crop to the real region BEFORE the inverse (host-loop order);
            # all inverse branches preserve (N, 2H, 2W, C): flips reverse
            # axes; the transpose members only occur when h == w
            return acc + lax.switch(i, invs, y[:, :2 * h, :2 * w])

        acc = lax.fori_loop(
            0, len(pairs), body,
            jnp.zeros((n, 2 * h, 2 * w, c), jnp.float32))
        return acc / len(pairs)

    return ensemble
