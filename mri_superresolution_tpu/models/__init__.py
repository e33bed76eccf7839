"""Model zoo with a central registry.

The reference repeats an ``if model_type == "unet"`` dispatch in three
scripts (scripts/train.py:166-175, scripts/infer.py:45-53,
scripts/compare_ssim_detailed.py:30-34); here there is one registry.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from mri_superresolution_tpu.config import ModelConfig
from mri_superresolution_tpu.models.unet import (  # noqa: F401
    UNetSuperRes,
    DoubleConv,
    Down,
    Up,
    PixelShuffleUp,
    pixel_shuffle,
    init_params,
    param_count,
)

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


@register_model("unet")
def _build_unet(cfg: ModelConfig, dtype=jnp.float32, **kwargs):
    return UNetSuperRes(
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        base_filters=cfg.base_filters,
        initial_alpha=cfg.initial_alpha,
        dtype=dtype,
        **kwargs,
    )


@register_model("simple")
def _build_simple(cfg: ModelConfig, dtype=jnp.float32, **kwargs):
    from mri_superresolution_tpu.models.simple import SimpleSR
    return SimpleSR(
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        base_filters=cfg.base_filters,
        dtype=dtype,
        **kwargs,
    )


@register_model("edsr")
def _build_edsr(cfg: ModelConfig, dtype=jnp.float32, **kwargs):
    from mri_superresolution_tpu.models.edsr import EDSR
    return EDSR(
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        base_filters=cfg.base_filters,
        num_blocks=cfg.num_blocks,
        dtype=dtype,
        **kwargs,
    )


@register_model("unet_tpu")
def _build_unet_tpu(cfg: ModelConfig, dtype=jnp.float32, **kwargs):
    from mri_superresolution_tpu.models.unet_tpu import UNetSuperResTPU
    return UNetSuperResTPU(
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        base_filters=cfg.base_filters,
        initial_alpha=cfg.initial_alpha,
        dtype=dtype,
        **kwargs,
    )


def available_models():
    return sorted(_REGISTRY)


def build_model(cfg: ModelConfig, dtype=jnp.float32, **kwargs):
    if cfg.model_type not in _REGISTRY:
        raise ValueError(
            f"Unknown model type: {cfg.model_type} (have {available_models()})")
    return _REGISTRY[cfg.model_type](cfg, dtype=dtype, **kwargs)
