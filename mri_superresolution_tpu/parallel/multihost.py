"""Multi-host (multi-process) data-parallel training support.

The TPU-native scaling model past one host: a pod slice runs ONE Python
process per host, each seeing only its local chips; ``jax.distributed``
connects them so ``jax.devices()`` becomes the GLOBAL device list and the
trainer's existing GSPMD mesh/shardings simply span hosts — gradient
psums ride ICI across the slice, no NCCL/MPI-style code. The reference is
strictly single-process (no ``torch.distributed`` anywhere — SURVEY.md
§2.2); this module supplies the three host-side pieces the jump to N
processes actually needs:

- :func:`initialize` — process bootstrap (TPU-pod auto-detection, or
  explicit coordinator/rank for generic clusters and the CPU-backend
  integration test, ``tests/test_multihost.py``);
- :func:`put_global` — build a globally-sharded batch from each host's
  copy of the data (every process derives the identical (seed, epoch)
  batch order, so each contributes exactly its addressable shards and the
  global array is bit-identical to the single-process one);
- :func:`fetch` — host fetch that also works for cross-process sharded
  arrays (an allgather collective when needed).

Everything else — checkpoint/log/figure writes happening once, the stdout
JSON protocol speaking with one voice — is main-process gating inside
``train/trainer.py`` (``jax.process_index() == 0``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Connect this process to the training cluster.

    With no arguments, defers to ``jax.distributed.initialize()``'s
    automatic cluster detection (TPU pod metadata / standard env vars).
    Must run before the first backend touch (scripts/train.py sequences
    it between platform selection and the tunnel watchdog)."""
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def active() -> bool:
    """True when training spans more than one process."""
    return jax.process_count() > 1


def is_main() -> bool:
    """True on the process that owns checkpoints, logs, and the stdout
    protocol (process 0)."""
    return jax.process_index() == 0


def put_global(array: np.ndarray, sharding) -> jax.Array:
    """Host array → global ``jax.Array`` under ``sharding``.

    Every process holds the same full host batch (the batch order is
    (seed, epoch)-derived, data/dataset.py, so the bytes agree); the
    callback hands each local device exactly its shard, indexed straight
    out of the host copy — no cross-host data movement, and the global
    contents are exactly the single-process ones (equivalence-tested in
    tests/test_multihost.py)."""
    return jax.make_array_from_callback(array.shape, sharding,
                                        lambda idx: array[idx])


def fetch(arr) -> np.ndarray:
    """``device_get`` that also works for cross-process sharded arrays.

    For a fully-addressable array this is a plain local fetch. Otherwise
    it is an allgather COLLECTIVE: every process must call it at the same
    program point (the trainer only fetches under conditions that are
    identical on all processes)."""
    sharding = getattr(arr, "sharding", None)
    if sharding is not None and not arr.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
    return np.asarray(jax.device_get(arr))


def agree(value):
    """Return process 0's ``value`` on every process (broadcast collective).

    Guards host-side randomness that would otherwise silently diverge the
    processes: the trainer broadcasts the seed, because an unseeded
    ``--seed`` default draws per-process randomness — different model
    inits (caught by device_put's cross-process equality check) and,
    far worse, different shuffle orders feeding inconsistent shards into
    the same global batch (caught by nothing)."""
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(np.asarray(value))


def fetch_tree(tree):
    """Collective pytree fetch: :func:`fetch` per leaf, in deterministic
    tree order — every process must call it at the same program point
    (e.g. the trainer gathers ZeRO-1-sharded optimizer moments this way
    before process 0 writes a checkpoint)."""
    import jax.tree_util as jtu
    return jtu.tree_map(fetch, tree)
