"""Checkpointing: save/restore full train state with hyperparams + resume.

Improvements over the reference (SURVEY.md §5): the reference only *saves*
(torch dicts at scripts/train.py:410-418,471-477; no resume path, and
hyperparameters are never written, which evaluate.py:49-60 then tries and
fails to sniff). Here every checkpoint carries params, optimizer state,
scheduler/early-stop state, and the full config; ``--resume`` restores all
of it deterministically.

Format: one msgpack file (flax.serialization) + a JSON sidecar with the
hyperparams/metrics for cheap inspection. File naming and discovery
precedence mirror the reference: ``best_model_{type}`` → ``final_model_{type}``
→ any file containing the model type (scripts/infer.py:74-95).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    meta: Optional[Dict] = None,
                    extras: Optional[Dict[str, Any]] = None) -> None:
    """Write ``{path}.ckpt`` (msgpack) and ``{path}.json`` (meta sidecar).

    ``extras``: additional named pytrees stored alongside (e.g. the trainer
    stores the live weights under ``raw_params`` when EMA is active, so
    ``params`` — what inference loads — are the averaged serving weights
    while ``--resume`` still restores the exact optimizer trajectory).
    """
    state = {"params": serialization.to_state_dict(_to_numpy(params))}
    if opt_state is not None:
        state["opt_state"] = serialization.to_state_dict(_to_numpy(opt_state))
    for key, tree in (extras or {}).items():
        if key in state:
            raise ValueError(f"extras key {key!r} collides with {list(state)}")
        state[key] = serialization.to_state_dict(_to_numpy(tree))
    blob = serialization.msgpack_serialize(state)
    base = path[:-5] if path.endswith(".ckpt") else path
    # atomic writes: a crash mid-save must never corrupt the previous
    # checkpoint (SURVEY.md §5 failure-recovery requirement)
    tmp = base + ".ckpt.tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, base + ".ckpt")
    tmp = base + ".json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta or {}, f, indent=2, sort_keys=True, default=str)
    os.replace(tmp, base + ".json")


def load_checkpoint(path: str,
                    opt_state_template: Any = None,
                    return_extras: bool = False):
    """Read a checkpoint → (params, opt_state or None, meta dict).

    ``opt_state_template``: a freshly-built optimizer state whose pytree
    structure types the restored one (optax states are namedtuples).
    ``return_extras``: also return a dict of any extra stored pytrees
    (keys beyond params/opt_state, e.g. ``raw_params`` from EMA runs) as a
    fourth element.
    """
    base = path[:-5] if path.endswith(".ckpt") else path
    with open(base + ".ckpt", "rb") as f:
        state = serialization.msgpack_restore(f.read())
    meta = {}
    if os.path.exists(base + ".json"):
        with open(base + ".json") as f:
            meta = json.load(f)
    params = state["params"]
    opt_state = None
    if "opt_state" in state and opt_state_template is not None:
        opt_state = serialization.from_state_dict(opt_state_template,
                                                  state["opt_state"])
    if return_extras:
        extras = {k: v for k, v in state.items()
                  if k not in ("params", "opt_state")}
        return params, opt_state, meta, extras
    return params, opt_state, meta


def checkpoint_paths(checkpoint_dir: str, model_type: str) -> Dict[str, str]:
    return {
        "best": os.path.join(checkpoint_dir, f"best_model_{model_type}"),
        "final": os.path.join(checkpoint_dir, f"final_model_{model_type}"),
        # mid-epoch step checkpoint (TrainConfig.save_every_steps): carries
        # a "batch_cursor" in its meta; resume prefers whichever of
        # final/step has the greater optimizer step count
        "step": os.path.join(checkpoint_dir, f"step_model_{model_type}"),
    }


def find_best_checkpoint(checkpoint_dir: str, model_type: str) -> str:
    """best → final → any-match precedence (scripts/infer.py:74-95).
    Also accepts reference ``.pth`` files (converted on load)."""
    names = checkpoint_paths(checkpoint_dir, model_type)
    for key in ("best", "final"):
        if os.path.exists(names[key] + ".ckpt"):
            return names[key] + ".ckpt"
        if os.path.exists(names[key] + ".pth"):
            return names[key] + ".pth"
    # substring match like the reference, but never cross model families:
    # a query for 'unet' must not pick up 'unet_tpu' checkpoints
    from mri_superresolution_tpu.models import available_models
    longer = [m for m in available_models()
              if m != model_type and model_type in m]
    for file in sorted(os.listdir(checkpoint_dir)):
        if not (file.endswith(".ckpt") or file.endswith(".pth")):
            continue
        if model_type in file and not any(m in file for m in longer):
            return os.path.join(checkpoint_dir, file)
    raise FileNotFoundError(
        f"No checkpoint found for {model_type} model in {checkpoint_dir}")


def resolve_checkpoint(checkpoint_dir: str, model_type: str,
                       checkpoint_path: str = None) -> str:
    """load_engine's resolution rule, shared with the export CLI: an
    explicit existing ``checkpoint_path`` wins; otherwise best→final→any
    discovery in ``checkpoint_dir``."""
    if checkpoint_path and os.path.exists(checkpoint_path):
        return checkpoint_path
    return find_best_checkpoint(checkpoint_dir, model_type)


def calib_sidecar_path(path: str) -> str:
    """The QAT calibration sidecar written next to a checkpoint
    (``<base>.calib.json``; trainer save_state / load_engine contract)."""
    return (path[:-len(".ckpt")] if path.endswith(".ckpt") else path
            ) + ".calib.json"


def load_params_any(path: str) -> Tuple[Any, Dict]:
    """Load model params from a .ckpt, a converted .msgpack of bare params,
    or a reference torch .pth (via tools/torch_compat)."""
    if path.endswith(".pth"):
        from mri_superresolution_tpu.utils.torch_compat import (
            load_torch_checkpoint)
        return load_torch_checkpoint(path), {"source": "torch"}
    if path.endswith(".msgpack"):
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read()), {}
    params, _, meta = load_checkpoint(path)
    return params, meta
