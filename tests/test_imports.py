"""Importing any package module must not initialize a JAX backend.

A module-level device array (e.g. ``jnp.asarray`` at import) commits to a
backend before any CLI ``--cpu`` flag can apply — host-only analytics then
hang forever whenever the TPU tunnel is unreachable (caught live in round 3:
``evalsuite/baselines.py`` froze ``scripts/visualise_res.py`` during a
tunnel outage). Importing under an invalid ``JAX_PLATFORMS`` makes any
import-time backend initialization raise immediately, so this guards the
whole bug class.
"""

import os
import subprocess
import sys

_PROBE = """
import pkgutil, importlib, sys
import mri_superresolution_tpu as pkg
for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
    importlib.import_module(m.name)
print("OK")
"""


def test_package_imports_do_not_initialize_backend():
    env = dict(os.environ, JAX_PLATFORMS="nonexistent_backend")
    env.pop("JAX_NUM_CPU_DEVICES", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    r = subprocess.run([sys.executable, "-c", _PROBE], env=env, cwd=repo,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "OK" in r.stdout, (r.stdout, r.stderr[-2000:])


def test_backend_watchdog_propagates_init_errors_quickly():
    """utils/backend.devices() must re-raise a backend-init ERROR promptly
    (not wait for the watchdog), and succeed normally on a live backend."""
    probe = """
import sys
from mri_superresolution_tpu.utils import backend
try:
    backend.devices()
    print("UNEXPECTED-OK")
except RuntimeError as e:
    assert "nonexistent_backend" in str(e) or "Unknown" in str(e) or \
        "platform" in str(e).lower(), e
    print("RAISED")
"""
    env = dict(os.environ, JAX_PLATFORMS="nonexistent_backend")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    r = subprocess.run([sys.executable, "-c", probe], env=env, cwd=repo,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "RAISED" in r.stdout, (r.stdout,
                                                        r.stderr[-2000:])

    # live (CPU) backend: devices() returns the device list
    from mri_superresolution_tpu.utils import backend
    assert len(backend.devices()) >= 1
