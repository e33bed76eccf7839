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


def enable_compilation_cache_if_configured() -> None:
    """Opt-in persistent XLA compilation cache (MRI_SR_XLA_CACHE_DIR).

    On a directly-attached TPU this eliminates recompiles across processes
    (the standard jax_compilation_cache_dir win). It is OFF by default
    because under the axon TPU tunnel a confirmed cache HIT is ~9x SLOWER
    than a cold compile (537 s vs 60 s — executable deserialization into
    the remote server dominates; tools/bench_xla_cache_probe.py), and the
    tunnel's own server-side cache already dedups repeated compiles.
    """
    cache_dir = os.environ.get("MRI_SR_XLA_CACHE_DIR")
    if not cache_dir:
        return
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def select_platform(argv=None) -> None:
    """Platform selection + cache config only — no backend touch.

    Split out of :func:`force_cpu_if_requested` for multi-host runs, where
    ``jax.distributed.initialize`` must happen BETWEEN platform selection
    and the first backend touch (scripts/train.py --multihost)."""
    argv = argv if argv is not None else sys.argv
    if "--cpu" in argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache_if_configured()


def force_cpu_if_requested(argv=None) -> None:
    select_platform(argv)
    fail_fast_on_dead_backend()


def fail_fast_on_dead_backend() -> None:
    """Initialize the selected backend behind a watchdog so CLIs whose
    first device touch is inside jit dispatch (extraction, training) emit
    a clean error instead of hanging forever on a dead TPU tunnel
    (utils/backend.py; instant on CPU, seconds on a healthy tunnel)."""
    from mri_superresolution_tpu.utils import backend

    try:
        backend.devices()
    except Exception as e:  # devices() re-raises the ORIGINAL init error,
        sys.exit(f"ERROR: {e}")  # whatever its type — keep the exit clean
