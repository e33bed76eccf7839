"""Device mesh construction and sharding rules.

The reference is single-process single-device (SURVEY.md §2.2: no
torch.distributed anywhere). Here data parallelism is first-class and
TPU-native: a 1-D ``('data',)`` mesh, parameters replicated, the batch axis
sharded. ``jax.jit`` + GSPMD insert the gradient ``psum`` and eval-metric
reductions automatically over ICI; there is no hand-written communication.

A ~2M-param U-Net needs no tensor/pipeline parallelism (SURVEY.md §2.2
documents TP/PP/EP as out of scope); the scaling axes that matter are batch
(training, full-volume inference) and — for arbitrarily large slices —
spatial tiling in the inference engine.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices
    (0 = all visible)."""
    if devices is None:
        from mri_superresolution_tpu.utils import backend
        devices = backend.devices()   # fail fast on a dead TPU tunnel
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for (B, ...) arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def zero1_shardings(tree, mesh: Mesh):
    """ZeRO-1-style sharding tree for optimizer state.

    Each array leaf is sharded along its LARGEST axis divisible by the
    mesh's data-axis size (scalars and indivisible leaves replicate) — per
    device, Adam's m/v moments then occupy 1/n_data of their replicated
    footprint. The reference has no distributed training at all
    (SURVEY.md §2.2); this is the TPU-native analogue of optimizer-state
    sharding: storage shardings are declared on the jitted step's
    in/out_shardings and GSPMD inserts the (ICI) collectives — the update
    math runs shard-local on each moment slice and only the final
    parameter delta is all-gathered. Exactness: the Adam update is
    elementwise, so sharding changes data placement, not values
    (equivalence-tested in tests/test_train.py)."""
    n = mesh.shape[DATA_AXIS]
    repl = NamedSharding(mesh, P())

    def leaf(x):
        shape = tuple(getattr(x, "shape", ()))
        for ax in sorted(range(len(shape)), key=lambda a: -shape[a]):
            if shape[ax] >= n and shape[ax] % n == 0:
                spec = [None] * len(shape)
                spec[ax] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return repl

    return jax.tree_util.tree_map(leaf, tree)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, batch axis sharded."""
    ds = data_sharding(mesh)
    return {k: jax.device_put(v, ds) for k, v in batch.items()}


def pad_batch_to_devices(batch_size: int, n_devices: int) -> int:
    """Smallest batch size >= batch_size divisible by the mesh size."""
    return int(-(-batch_size // n_devices) * n_devices)
