"""Shared CLI bootstrap: repo root on sys.path + platform selection.

Mirrors the reference scripts' sys.path shim (scripts/train.py:19-21) and
adds a ``--cpu`` escape hatch: the container may pin JAX_PLATFORMS to the
TPU plugin, so CPU mode must be forced through jax.config before any
backend initializes.
"""

import os
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def force_cpu_if_requested(argv=None) -> None:
    argv = argv if argv is not None else sys.argv
    if "--cpu" in argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
