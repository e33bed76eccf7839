"""Probe: does the persistent XLA compilation cache help through the axon
TPU tunnel? (VERDICT r2 item 7)

MEASURED NEGATIVE RESULT (v5e via axon tunnel, 2026-08-17):

    run A, cache MISS  (compile + serialize + write):  60.2 s first call
    run B, cache HIT   (read + deserialize + load):   536.7 s first call

A confirmed cache hit ("Persistent compilation cache hit for 'jit__lambda'")
is ~9x SLOWER than a cold compile: loading a serialized executable back
into the remote server dominates, while the tunnel's own server-side cache
already makes repeated identical compiles cheap within/across processes
(measured 347 s -> 20 s for back-to-back runs of one program). Conclusion:
never enable jax_compilation_cache_dir under the axon tunnel; on a
directly-attached TPU it remains the standard win, so the CLIs expose it
as the opt-in MRI_SR_XLA_CACHE_DIR env var (scripts/_bootstrap.py).

Usage: rm -rf /tmp/xla_cache_probe3; run twice, compare "first-call" times.
"""

import logging
import time

logging.basicConfig(level=logging.WARNING)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/xla_cache_probe3")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
import jax.numpy as jnp

f = jax.jit(lambda x: (jnp.cos(x) @ x.T).sum() * 9.87654)
x = jnp.ones((384, 384), jnp.bfloat16)
jnp.zeros(()).block_until_ready()  # backend init outside the timer
t0 = time.time()
print("result", float(f(x)), "first-call %.2fs" % (time.time() - t0))
