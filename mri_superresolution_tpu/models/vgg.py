"""VGG19 feature extractor for the perceptual loss — from scratch in Flax.

Mirrors the role of torchvision's ``vgg19(...).features`` in the reference
(utils/losses.py:83-118): grayscale inputs are replicated to 3 channels,
normalized with the ImageNet mean/std, and run through the conv/relu/maxpool
stack up to ``feature_layer_idx`` (torch Sequential index semantics, e.g. 35
= relu5_4).

Weights: this environment is zero-egress, so ImageNet weights cannot be
downloaded. The extractor accepts:
- an ``.npz`` file of HWIO kernels/biases (``conv{i}/kernel``, ``conv{i}/bias``),
- a torchvision-style state_dict converted via ``params_from_torch_state_dict``
  (``features.{idx}.weight`` OIHW → HWIO),
- or random He-initialized weights (``random_params``) — random-CNN
  perceptual losses are still usable as a structural prior, and this keeps
  the loss fully testable offline.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

VGG_MEAN = (0.485, 0.456, 0.406)
VGG_STD = (0.229, 0.224, 0.225)

# torchvision VGG19 'E' configuration; 'M' = 2x2 maxpool stride 2.
_CFG: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


def layer_table() -> List[Tuple[str, int]]:
    """(kind, arg) per torch Sequential index: ('conv', out_ch) / ('relu', 0)
    / ('pool', 0). VGG19 features has 37 entries; index 35 is relu5_4."""
    table: List[Tuple[str, int]] = []
    for v in _CFG:
        if v == "M":
            table.append(("pool", 0))
        else:
            table.append(("conv", int(v)))
            table.append(("relu", 0))
    return table


def conv_indices() -> List[int]:
    return [i for i, (k, _) in enumerate(layer_table()) if k == "conv"]


def random_params(key: jax.Array, feature_layer_idx: int = 35) -> Dict:
    """He-normal random VGG weights (offline fallback; reproducible)."""
    params: Dict = {}
    in_ch = 3
    table = layer_table()
    ci = 0
    for i, (kind, arg) in enumerate(table):
        if i > feature_layer_idx:
            break
        if kind == "conv":
            key, sub = jax.random.split(key)
            fan_in = in_ch * 9
            kern = jax.random.normal(sub, (3, 3, in_ch, arg), jnp.float32)
            kern = kern * np.sqrt(2.0 / fan_in)
            params[f"conv{ci}"] = {"kernel": kern,
                                   "bias": jnp.zeros((arg,), jnp.float32)}
            in_ch = arg
            ci += 1
    return params


def params_from_torch_state_dict(sd: Dict[str, np.ndarray],
                                 feature_layer_idx: int = 35) -> Dict:
    """Convert torchvision ``vgg19().features`` keys (``features.{i}.weight``
    or bare ``{i}.weight``) to our param tree."""
    out: Dict = {}
    ci = 0
    for idx in conv_indices():
        if idx > feature_layer_idx:
            break
        for pref in (f"features.{idx}", str(idx)):
            wk, bk = f"{pref}.weight", f"{pref}.bias"
            if wk in sd:
                w = np.asarray(sd[wk])
                out[f"conv{ci}"] = {
                    "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                    "bias": jnp.asarray(np.asarray(sd[bk])),
                }
                break
        else:
            raise KeyError(f"missing conv weight for features index {idx}")
        ci += 1
    return out


def load_params_npz(path: str) -> Dict:
    data = np.load(path)
    params: Dict = {}
    for name in data.files:
        layer, leaf = name.split("/")
        params.setdefault(layer, {})[leaf] = jnp.asarray(data[name])
    return params


def save_params_npz(path: str, params: Dict) -> None:
    flat = {f"{layer}/{leaf}": np.asarray(v)
            for layer, leaves in params.items() for leaf, v in leaves.items()}
    np.savez(path, **flat)


def n_pools(feature_layer_idx: int) -> int:
    """Number of 2x2 maxpools crossed by ``extract_features`` up to (and
    including) ``feature_layer_idx``."""
    return sum(1 for i, (kind, _) in enumerate(layer_table())
               if i <= feature_layer_idx and kind == "pool")


def _dense_conv(x, kern, bias):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn) + bias


def _dense_pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def extract_features(params: Dict, x: jnp.ndarray,
                     feature_layer_idx: int = 35,
                     dtype=jnp.float32, conv_fn=None,
                     pool_fn=None) -> jnp.ndarray:
    """Run NHWC images in [0,1] through VGG19 up to ``feature_layer_idx``.

    1-channel inputs are replicated to 3 (utils/losses.py:106-108) and
    normalized with the ImageNet statistics (:110-114).

    ``conv_fn(x, kernel, bias)`` / ``pool_fn(x)`` override the dense 3x3
    padded conv and 2x2 maxpool — the spatially-sharded perceptual loss
    passes halo'd variants so this layer loop stays the single copy of the
    VGG19 stack.
    """
    conv_fn = conv_fn or _dense_conv
    pool_fn = pool_fn or _dense_pool
    if x.shape[-1] == 1:
        x = jnp.tile(x, (1, 1, 1, 3))
    mean = jnp.asarray(VGG_MEAN, dtype).reshape(1, 1, 1, 3)
    std = jnp.asarray(VGG_STD, dtype).reshape(1, 1, 1, 3)
    x = (x.astype(dtype) - mean) / std

    ci = 0
    for i, (kind, _) in enumerate(layer_table()):
        if i > feature_layer_idx:
            break
        if kind == "conv":
            x = conv_fn(x, params[f"conv{ci}"]["kernel"].astype(dtype),
                        params[f"conv{ci}"]["bias"].astype(dtype))
            ci += 1
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:  # pool
            x = pool_fn(x)
    return x
