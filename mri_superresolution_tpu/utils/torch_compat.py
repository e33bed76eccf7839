"""Convert reference PyTorch ``UNetSuperRes`` checkpoints to our Flax params
— and back.

Lets a user of the reference repo (checkpoint format at
scripts/train.py:410-418: dict with 'model_state_dict') load their trained
weights into the TPU framework, and export TPU-trained weights back to a
``.pth`` the unmodified reference scripts can serve. Conv weights transpose
OIHW ↔ HWIO; GroupNorm weight/bias map to scale/bias. PixelShuffle channel
order is already torch-compatible (see models/unet.py:pixel_shuffle), so no
channel permute is needed. The mapping is a bijection; the round trip is
exact (tests/test_unet.py).

CLI wrappers: tools/convert_torch_checkpoint.py (.pth → .msgpack),
tools/export_torch_checkpoint.py (.ckpt → .pth)
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW→HWIO


def _double_conv(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    # torch Sequential indices: 0 conv, 1 GN, 3 conv, 4 GN
    return {
        "conv1": {"kernel": _conv(sd[f"{prefix}.0.weight"])},
        "norm1": {"scale": sd[f"{prefix}.1.weight"], "bias": sd[f"{prefix}.1.bias"]},
        "conv2": {"kernel": _conv(sd[f"{prefix}.3.weight"])},
        "norm2": {"scale": sd[f"{prefix}.4.weight"], "bias": sd[f"{prefix}.4.bias"]},
    }


def torch_state_dict_to_flax(sd: Dict[str, np.ndarray]) -> dict:
    """Map the reference model's state_dict (models/unet_model.py:116-211)
    onto our parameter pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "inc": _double_conv(sd, "inc.double_conv"),
        "alpha": sd["alpha"].reshape(()),
        "final_up_conv": {"kernel": _conv(sd["final_up_bilinear.1.weight"])},
        "final_up_norm": {"scale": sd["final_up_bilinear.2.weight"],
                          "bias": sd["final_up_bilinear.2.bias"]},
        "final_up_pixelshuffle": {
            "conv": {"kernel": _conv(sd["final_up_pixelshuffle.conv.weight"]),
                     "bias": sd["final_up_pixelshuffle.conv.bias"]},
            "norm": {"scale": sd["final_up_pixelshuffle.norm.weight"],
                     "bias": sd["final_up_pixelshuffle.norm.bias"]},
        },
        "final_conv1": {"kernel": _conv(sd["final_conv.0.weight"])},
        "final_norm": {"scale": sd["final_conv.1.weight"],
                       "bias": sd["final_conv.1.bias"]},
        "final_conv2": {"kernel": _conv(sd["final_conv.3.weight"]),
                        "bias": sd["final_conv.3.bias"]},
    }
    for i in (1, 2, 3):
        params[f"down{i}"] = {
            "conv": _double_conv(sd, f"down{i}.maxpool_conv.1.double_conv")}
    for i in (1, 2, 3):
        params[f"up{i}"] = {
            "up_conv": {"kernel": _conv(sd[f"up{i}.up.1.weight"])},
            "up_norm": {"scale": sd[f"up{i}.up.2.weight"],
                        "bias": sd[f"up{i}.up.2.bias"]},
            "conv": _double_conv(sd, f"up{i}.conv.double_conv"),
        }
    return params


def _conv_inv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))  # HWIO→OIHW


def _double_conv_inv(tree: dict, prefix: str, out: Dict[str, np.ndarray]):
    out[f"{prefix}.0.weight"] = _conv_inv(tree["conv1"]["kernel"])
    out[f"{prefix}.1.weight"] = tree["norm1"]["scale"]
    out[f"{prefix}.1.bias"] = tree["norm1"]["bias"]
    out[f"{prefix}.3.weight"] = _conv_inv(tree["conv2"]["kernel"])
    out[f"{prefix}.4.weight"] = tree["norm2"]["scale"]
    out[f"{prefix}.4.bias"] = tree["norm2"]["bias"]


def flax_to_torch_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_state_dict_to_flax`: our parameter pytree →
    the reference model's state_dict keys (models/unet_model.py:116-211).
    Only the 'unet' family maps (the reference has no other real model)."""
    import jax

    params = jax.tree_util.tree_map(
        lambda t: np.asarray(t, np.float32), params)
    sd: Dict[str, np.ndarray] = {}
    _double_conv_inv(params["inc"], "inc.double_conv", sd)
    sd["alpha"] = params["alpha"].reshape((1,))
    sd["final_up_bilinear.1.weight"] = _conv_inv(
        params["final_up_conv"]["kernel"])
    sd["final_up_bilinear.2.weight"] = params["final_up_norm"]["scale"]
    sd["final_up_bilinear.2.bias"] = params["final_up_norm"]["bias"]
    ps = params["final_up_pixelshuffle"]
    sd["final_up_pixelshuffle.conv.weight"] = _conv_inv(ps["conv"]["kernel"])
    sd["final_up_pixelshuffle.conv.bias"] = ps["conv"]["bias"]
    sd["final_up_pixelshuffle.norm.weight"] = ps["norm"]["scale"]
    sd["final_up_pixelshuffle.norm.bias"] = ps["norm"]["bias"]
    sd["final_conv.0.weight"] = _conv_inv(params["final_conv1"]["kernel"])
    sd["final_conv.1.weight"] = params["final_norm"]["scale"]
    sd["final_conv.1.bias"] = params["final_norm"]["bias"]
    sd["final_conv.3.weight"] = _conv_inv(params["final_conv2"]["kernel"])
    sd["final_conv.3.bias"] = params["final_conv2"]["bias"]
    for i in (1, 2, 3):
        _double_conv_inv(params[f"down{i}"]["conv"],
                         f"down{i}.maxpool_conv.1.double_conv", sd)
    for i in (1, 2, 3):
        up = params[f"up{i}"]
        sd[f"up{i}.up.1.weight"] = _conv_inv(up["up_conv"]["kernel"])
        sd[f"up{i}.up.2.weight"] = up["up_norm"]["scale"]
        sd[f"up{i}.up.2.bias"] = up["up_norm"]["bias"]
        _double_conv_inv(up["conv"], f"up{i}.conv.double_conv", sd)
    return sd


def save_torch_checkpoint(path: str, params: dict,
                          meta: Dict | None = None) -> None:
    """Write a reference-format .pth (scripts/train.py:410-418 keys) the
    unmodified reference infer/eval scripts can load."""
    import torch

    meta = meta or {}
    # copy=True: jax-exported arrays can be non-writable views, which torch
    # tensors must not wrap
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in flax_to_torch_state_dict(params).items()}
    torch.save({
        "epoch": int(meta.get("epoch", 0)),
        "model_state_dict": sd,
        "val_loss": float(meta.get("val_loss", 0.0)),
        "val_ssim": float(meta.get("val_ssim", 0.0)),
    }, path)


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth (full checkpoint dict or bare state_dict,
    format sniffing as in scripts/infer.py:56-65) → flax params."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"] if isinstance(ckpt, dict) and \
        "model_state_dict" in ckpt else ckpt
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return torch_state_dict_to_flax(sd)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--base_filters", type=int, default=32)
    args = ap.parse_args()

    from flax import serialization

    params = load_torch_checkpoint(args.pth)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
