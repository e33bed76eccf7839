"""Composite training loss: L1 + SSIM + optional VGG perceptual.

Parity with the reference ``CombinedLoss`` (utils/losses.py:153-240):
``total = l1_w * L1 + ssim_w * (1 - clip(SSIM, 0, 1)) + perc_w * Perc`` with
``l1_w = 1 - ssim_w - perc_w``, SSIM window 11 / sigma 1.5 / val_range 1.0,
and target features stop-gradiented in the perceptual term
(utils/losses.py:146-147).

Everything is a pure jittable function; per-sample weights extend the
reference (unweighted) semantics to masked/padded batches so jit shapes stay
static without skewing the loss.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import LossConfig
from mri_superresolution_tpu.models import vgg as vgg_mod
from mri_superresolution_tpu.ops.ssim import ssim


def _weighted_mean(per_sample: jnp.ndarray,
                   sample_weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    if sample_weights is None:
        return jnp.mean(per_sample)
    w = sample_weights.astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1e-12)


def l1_loss(a: jnp.ndarray, b: jnp.ndarray,
            sample_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    per = jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)),
                   axis=tuple(range(1, a.ndim)))
    return _weighted_mean(per, sample_weights)


def l2_loss(a: jnp.ndarray, b: jnp.ndarray,
            sample_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    per = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=tuple(range(1, a.ndim)))
    return _weighted_mean(per, sample_weights)


class CombinedLoss:
    """Callable loss bundle. Instantiate once (host), call inside jit.

    Args:
        cfg: LossConfig (weights validated like utils/losses.py:166-171).
        vgg_params: VGG19 param tree — required iff perceptual_weight > 0.
    """

    def __init__(self, cfg: LossConfig, vgg_params: Optional[dict] = None):
        cfg.validate()
        self.cfg = cfg
        self.vgg_params = vgg_params
        if cfg.perceptual_weight > 0 and vgg_params is None:
            raise ValueError(
                "perceptual_weight > 0 requires VGG19 weights "
                "(pass vgg_params; see models/vgg.py for loading options)")

    def __call__(self, output: jnp.ndarray, target: jnp.ndarray,
                 sample_weights: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        out32 = output.astype(jnp.float32)
        tgt32 = target.astype(jnp.float32)
        total = jnp.asarray(0.0, jnp.float32)
        comps: Dict[str, jnp.ndarray] = {}

        if cfg.l1_weight > 0:
            l1 = l1_loss(out32, tgt32, sample_weights)
            total = total + cfg.l1_weight * l1
            comps["l1_loss"] = l1

        if cfg.ssim_weight > 0:
            ssim_val = ssim(out32, tgt32, cfg.window_size, cfg.sigma,
                            cfg.val_range, sample_weights=sample_weights)
            ssim_val = jnp.clip(ssim_val, 0.0, 1.0)  # utils/losses.py:221
            ssim_l = 1.0 - ssim_val
            total = total + cfg.ssim_weight * ssim_l
            comps["ssim_loss"] = ssim_l
            comps["ssim_metric"] = ssim_val

        if cfg.perceptual_weight > 0:
            fg = vgg_mod.extract_features(self.vgg_params, out32,
                                          cfg.vgg_layer_idx)
            ft = vgg_mod.extract_features(self.vgg_params, tgt32,
                                          cfg.vgg_layer_idx)
            ft = jax.lax.stop_gradient(ft)  # utils/losses.py:146-147
            if cfg.perceptual_loss_type == "l1":
                perc = l1_loss(fg, ft, sample_weights)
            elif cfg.perceptual_loss_type in ("l2", "mse"):
                perc = l2_loss(fg, ft, sample_weights)
            else:
                raise ValueError(
                    f"Unsupported perceptual loss: {cfg.perceptual_loss_type}")
            total = total + cfg.perceptual_weight * perc
            comps["perceptual_loss"] = perc

        return total, comps
