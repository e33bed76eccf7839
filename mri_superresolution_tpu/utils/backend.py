"""Watchdogged JAX backend initialization.

``jax.devices()`` blocks INDEFINITELY when the axon TPU tunnel is
unreachable (observed live: multi-hour outages hang every device CLI with
no diagnostic). Every device-discovery path in this package goes through
:func:`devices`, which races backend init against a watchdog and raises a
clear RuntimeError instead — the reference has no analogue (it fails fast
because CUDA init errors synchronously).

The timeout is generous (600 s — a healthy tunnel initializes in seconds;
first-ever compile does not go through this path) and adjustable via
``MRI_SR_BACKEND_TIMEOUT_S`` (0 disables the watchdog entirely).
"""

from __future__ import annotations

import os
import threading

_DEFAULT_TIMEOUT_S = 600.0


def devices(timeout_s: float | None = None):
    """``jax.devices()`` that fails fast on a dead TPU tunnel.

    Raises RuntimeError after ``timeout_s`` (default 600, env-overridable
    via MRI_SR_BACKEND_TIMEOUT_S) if backend initialization has not
    completed; re-raises the original exception if init itself errors.
    """
    import jax

    if timeout_s is None:
        timeout_s = float(os.environ.get("MRI_SR_BACKEND_TIMEOUT_S",
                                         _DEFAULT_TIMEOUT_S))
    if timeout_s <= 0:
        return jax.devices()

    done = threading.Event()
    state: dict = {}

    def probe():
        try:
            state["devices"] = jax.devices()
        except BaseException as e:  # noqa: BLE001 - propagate init errors
            state["error"] = e
        finally:
            done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        raise RuntimeError(
            f"JAX backend initialization did not finish in {timeout_s:.0f}s "
            f"— the TPU tunnel is likely unreachable. Pass --cpu to run on "
            f"CPU, or set MRI_SR_BACKEND_TIMEOUT_S to adjust the watchdog "
            f"(0 disables it).")
    if "error" in state:
        raise state["error"]
    return state["devices"]
