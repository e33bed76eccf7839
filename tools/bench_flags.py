#!/usr/bin/env python
"""Probe: XLA flag + batch-size sensitivity of the parity U-Net forward.

Each flag set needs a fresh process (XLA_FLAGS is parsed once), so this
script re-execs itself via subprocess per configuration and reports one
line each. Usage: python tools/bench_flags.py
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

CONFIGS = [
    ("baseline", ""),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("no_bounds", "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
]

BATCHES = "104,112,120,128,144"


def worker():
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mri_superresolution_tpu.config import ModelConfig
    from mri_superresolution_tpu.models import build_model

    model = build_model(ModelConfig(), dtype=jnp.bfloat16)
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 1)))["params"])(jax.random.key(0))

    @jax.jit
    def chain(p, x, n):
        def body(_, a):
            out = jnp.clip(model.apply({"params": p}, a), 0.0, 1.0)
            return a + (1e-20 * jnp.mean(out)).astype(a.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    def timed(x, n):
        t0 = time.perf_counter()
        float(jnp.sum(chain(params, x, n)))
        return time.perf_counter() - t0

    for bs in map(int, os.environ["BENCH_BATCHES"].split(",")):
        x = jnp.asarray(np.random.default_rng(0).random((bs, 256, 256, 1),
                                                        dtype=np.float32))
        timed(x, 2)
        t1 = min(timed(x, 2) for _ in range(3))
        t2 = min(timed(x, 8) for _ in range(3))
        per = (t2 - t1) / 6
        print(f"  batch {bs}: {per * 1e3:7.2f} ms -> {bs / per:7.0f} "
              f"slices/s", flush=True)


def main():
    if os.environ.get("BENCH_WORKER"):
        worker()
        return
    for name, flags in CONFIGS:
        env = dict(os.environ)
        env["BENCH_WORKER"] = "1"
        env["BENCH_BATCHES"] = BATCHES
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        print(f"[{name}] {flags}", flush=True)
        r = subprocess.run([sys.executable, __file__], env=env,
                           capture_output=True, text=True)
        out = "\n".join(line for line in r.stdout.splitlines()
                        if "batch" in line)
        print(out if r.returncode == 0 else
              f"  FAILED rc={r.returncode}: {r.stderr[-300:]}", flush=True)


if __name__ == "__main__":
    main()
