#!/usr/bin/env python
"""HLO cost breakdown for the int8 vs bf16 serving forward (round 3, V1).

bench_int8_probe2.py located the int8 composition overhead by timing; this
tool localizes it structurally: compile both forwards at the real serving
shape, parse the scheduled HLO, and bucket every op's `estimated_cycles`
by opcode so the copy/retiling waste is attributable line-by-line.

Findings feed RESULTS.md and the quantize-pass attack (ops/quant.py).
Compile-only — safe to run through the axon tunnel (no timing involved,
so the no-sync caveat does not apply).

Usage: python tools/bench_int8_hlo.py [unet|unet_tpu] [B] [H] [--cpu]
"""

import re
import sys
import os
from collections import defaultdict

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import ModelConfig
from mri_superresolution_tpu.models import build_model
from mri_superresolution_tpu.models import quant_forward as qf


def parse_costs(txt):
    """Bucket estimated_cycles by opcode; return (buckets, top_ops)."""
    buckets = defaultdict(int)
    ops = []
    # scheduled HLO: one op per line; cycles in backend_config JSON
    for line in txt.splitlines():
        m = re.search(
            r"%(\S+) = (\S+) ([a-z0-9-]+)\(.*estimated_cycles\":\"?(\d+)",
            line)
        if not m:
            continue
        name, shape, kind, cyc = m.groups()
        cyc = int(cyc)
        if kind == "fusion":
            # classify fusions by payload: conv/dot fusions vs elementwise
            if "conv" in line.split("calls=")[-1][:60] or ".conv" in name:
                kind = "fusion:conv"
            else:
                kind = "fusion:elem"
        buckets[kind] += cyc
        ops.append((cyc, kind, shape, name))
    ops.sort(reverse=True)
    return buckets, ops


def report(tag, txt, top=25):
    buckets, ops = parse_costs(txt)
    total = sum(buckets.values())
    print(f"\n== {tag}: total estimated {total:,} cycles")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"   {k:<16} {v:>14,}  ({100.0 * v / max(total, 1):.1f}%)")
    print(f"   top {top} ops:")
    for cyc, kind, shape, name in ops[:top]:
        print(f"   {cyc:>12,}  {kind:<12} {shape:<48} {name[:40]}")
    return total


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mt = args[0] if args else "unet"
    B = int(args[1]) if len(args) > 1 else 128
    H = int(args[2]) if len(args) > 2 else 256

    model = build_model(ModelConfig(model_type=mt, base_filters=32),
                        dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))["params"]
    x = jnp.asarray(np.random.default_rng(0).random((B, H, H, 1), np.float32),
                    jnp.bfloat16)

    scales = qf.calibrate(params, [np.asarray(x[:2], np.float32)], mt)
    fwd_q = qf.build_int8_forward(jax.device_get(params), scales, mt)

    print(f"model={mt} B={B} H={H}", flush=True)
    txt_q = jax.jit(fwd_q).lower(params, x).compile().as_text()
    t_q = report(f"{mt} int8 (B={B}, H={H})", txt_q)

    txt_b = (jax.jit(lambda p, a: model.apply({"params": p}, a))
             .lower(params, x).compile().as_text())
    t_b = report(f"{mt} bf16 (B={B}, H={H})", txt_b)

    print(f"\nint8/bf16 estimated-cycle ratio: {t_q / max(t_b, 1):.3f}")


if __name__ == "__main__":
    main()
