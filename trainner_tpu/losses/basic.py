"""Pixel-space loss primitives (pure jnp functions, NHWC, f32).

Equivalents of ref codes/models/modules/loss.py:
  CharbonnierLoss:47, ElasticLoss:328, RelativeL1:347, L1CosineSim:364,
  ClipL1:387, MaskedL1Loss:405, MultiscalePixelLoss:431,
  FrobeniusNormLoss:457, and plain l1/l2 from torch.

All losses reduce to a scalar mean like the reference defaults.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


l2 = mse


def charbonnier(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """sqrt(diff^2 + eps) robust L1 (ref loss.py:47)."""
    return jnp.mean(jnp.sqrt((x - y) ** 2 + eps))


def elastic(x: jnp.ndarray, y: jnp.ndarray, a: float = 0.2) -> jnp.ndarray:
    """Weighted L1+L2 mix (ref ElasticLoss:328, a=0.2 default)."""
    return a * mse(x, y) + (1 - a) * l1(x, y)


def relative_l1(x: jnp.ndarray, y: jnp.ndarray, eps: float = 0.01) -> jnp.ndarray:
    """L1 normalized by target magnitude (ref RelativeL1:347)."""
    return jnp.mean(jnp.abs(x - y) / (jnp.abs(y) + eps))


def l1_cosine_sim(x: jnp.ndarray, y: jnp.ndarray, loss_lambda: float = 5.0
                  ) -> jnp.ndarray:
    """L1 + color-angle (cosine) term over the channel axis
    (ref L1CosineSim:364)."""
    xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
    yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-8)
    cos = jnp.sum(xn * yn, axis=-1)
    return l1(x, y) + loss_lambda * jnp.mean(1.0 - cos)


def clip_l1(x: jnp.ndarray, y: jnp.ndarray, clip_min: float = 0.0,
            clip_max: float = 10.0) -> jnp.ndarray:
    """Clipped L1 (ref ClipL1:387) — caps outlier penalties."""
    return jnp.mean(jnp.clip(jnp.abs(x - y), clip_min, clip_max))


def masked_l1(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(ref MaskedL1Loss:405)"""
    diff = jnp.abs(x - y) * mask
    return jnp.sum(diff) / jnp.maximum(jnp.sum(mask), 1.0)


def frobenius(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Frobenius (L2) norm of the whole flattened difference, normalized
    by the channel count (ref FrobeniusNormLoss:457, defaults kind='vec',
    out_norm='c')."""
    return jnp.linalg.norm((x - y).ravel()) / x.shape[-1]


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def multiscale_pixel(x: jnp.ndarray, y: jnp.ndarray,
                     base: Callable = l1,
                     weights: Sequence[float] = (1, 0.5, 0.25, 0.125, 0.125),
                     scales: int = 5) -> jnp.ndarray:
    """Pyramid pixel loss (ref MultiscalePixelLoss:431): base loss at
    successive 2x downscales with fixed weights."""
    total = 0.0
    for i in range(scales):
        total = total + weights[i] * base(x, y)
        if i != scales - 1:
            x, y = _avg_pool2(x), _avg_pool2(y)
    return total


# name -> fn registry used by the GeneratorLoss builder
PIXEL_CRITERIA = {
    "l1": l1,
    "l2": mse,
    "mse": mse,
    "cb": charbonnier,
    "charbonnier": charbonnier,
    "elastic": elastic,
    "relativel1": relative_l1,
    "relative": relative_l1,
    "l1cosinesim": l1_cosine_sim,
    "clipl1": clip_l1,
    "fro": frobenius,
    "frobenius": frobenius,
}


def get_pixel_criterion(name: str) -> Callable:
    key = (name or "l1").lower().replace("-", "").replace("_", "")
    if key.startswith("multiscale"):
        inner = key.replace("multiscale", "") or "l1"
        return partial(multiscale_pixel, base=PIXEL_CRITERIA[inner])
    if key not in PIXEL_CRITERIA:
        raise NotImplementedError(f"pixel criterion [{name}] not found")
    return PIXEL_CRITERIA[key]
