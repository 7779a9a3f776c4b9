"""Structural / regularization losses (pure jnp, NHWC).

Equivalents of ref codes/models/modules/loss.py:
  HFENLoss:173 (LoG-filtered error), TVLoss:227 (tv/dtv, p=1/2),
  GradientLoss:302 (2d/4d image gradients), GPLoss:616 / CPLoss:652 /
  SPLoss:741 (spatial profile losses), FFTloss:509, OFLoss:527 (overflow),
  RangeLoss:545, ColorLoss:587, AverageLoss:601, GradientPenaltyLoss:140.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.colors import rgb_to_yuv
from ..ops.filters import filter2d, log_kernel
from .basic import l1, mse

# ---------------------------------------------------------------------------
# HFEN: high-frequency error norm via Laplacian-of-Gaussian
# ---------------------------------------------------------------------------


def hfen(x: jnp.ndarray, y: jnp.ndarray, criterion: Callable = l1,
         kernel_size: int = 15, sigma: float = 2.5,
         norm: bool = False) -> jnp.ndarray:
    """(ref HFENLoss:173): criterion(LoG(x), LoG(y)), optionally normalized
    by ||LoG(y)||."""
    k = log_kernel(kernel_size, sigma)
    lx, ly = filter2d(x, k), filter2d(y, k)
    val = criterion(lx, ly)
    if norm:
        val = val / jnp.maximum(jnp.linalg.norm(ly.ravel()), 1e-8)
    return val


# ---------------------------------------------------------------------------
# TV / DTV
# ---------------------------------------------------------------------------


def tv_loss(x: jnp.ndarray, tv_type: str = "tv", p: int = 1) -> jnp.ndarray:
    """Total variation (ref TVLoss:227). tv: 2-direction; dtv: adds the two
    diagonal differences ("4D")."""
    dh = x[:, 1:, :, :] - x[:, :-1, :, :]
    dw = x[:, :, 1:, :] - x[:, :, :-1, :]
    if p == 1:
        loss = jnp.mean(jnp.abs(dh)) + jnp.mean(jnp.abs(dw))
    else:
        loss = jnp.mean(dh * dh) + jnp.mean(dw * dw)
    if tv_type in ("dtv", "4d"):
        d1 = x[:, 1:, 1:, :] - x[:, :-1, :-1, :]
        d2 = x[:, 1:, :-1, :] - x[:, :-1, 1:, :]
        if p == 1:
            loss = loss + jnp.mean(jnp.abs(d1)) + jnp.mean(jnp.abs(d2))
        else:
            loss = loss + jnp.mean(d1 * d1) + jnp.mean(d2 * d2)
    return loss


# ---------------------------------------------------------------------------
# image gradient losses (2d = dx,dy; 4d = + diagonals)
# ---------------------------------------------------------------------------


def _grads(x: jnp.ndarray, four_d: bool):
    gh = x[:, 1:, :-1, :] - x[:, :-1, :-1, :]
    gw = x[:, :-1, 1:, :] - x[:, :-1, :-1, :]
    out = [gh, gw]
    if four_d:
        out.append(x[:, 1:, 1:, :] - x[:, :-1, :-1, :])
        out.append(x[:, 1:, :-1, :] - x[:, :-1, 1:, :])
    return out


def gradient_loss(x: jnp.ndarray, y: jnp.ndarray, criterion: Callable = l1,
                  four_d: bool = False) -> jnp.ndarray:
    """(ref GradientLoss:302): criterion over image gradients."""
    gx, gy = _grads(x, four_d), _grads(y, four_d)
    return sum(criterion(a, b) for a, b in zip(gx, gy)) / len(gx)


# ---------------------------------------------------------------------------
# spatial profile losses (SPL: GPLoss + CPLoss, ref :616-768)
# ---------------------------------------------------------------------------


def _trace_similarity(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Row/column-profile cosine similarity loss used by SPL
    (ref SPLoss:741): sum over rows and columns of normalized dot products,
    negated and averaged."""
    def norm(v, axis):
        return v / (jnp.linalg.norm(v, axis=axis, keepdims=True) + 1e-8)

    rows = jnp.sum(norm(a, 2) * norm(b, 2), axis=2)  # (B,H,C)
    cols = jnp.sum(norm(a, 1) * norm(b, 1), axis=1)  # (B,W,C)
    b_, h, w, c = a.shape
    val = (jnp.sum(rows) / h + jnp.sum(cols) / w) / (c * b_)
    return -val


def gp_loss(x: jnp.ndarray, y: jnp.ndarray, trace: bool = False,
            spl_denorm: bool = False) -> jnp.ndarray:
    """Gradient-profile loss (ref GPLoss:616)."""
    if spl_denorm:
        x, y = (x + 1) / 2, (y + 1) / 2
    sim = _trace_similarity if trace else (lambda a, b: l1(a, b))
    gx, gy = _grads(x, False), _grads(y, False)
    return sum(sim(a, b) for a, b in zip(gx, gy))


def cp_loss(x: jnp.ndarray, y: jnp.ndarray, rgb: bool = True,
            yuv: bool = True, yuvgrad: bool = True, trace: bool = False,
            spl_denorm: bool = False, yuv_denorm: bool = False) -> jnp.ndarray:
    """Color-profile loss (ref CPLoss:652)."""
    if spl_denorm:
        x, y = (x + 1) / 2, (y + 1) / 2
    sim = _trace_similarity if trace else (lambda a, b: l1(a, b))
    total = 0.0
    if rgb:
        total = total + sim(x, y)
    if yuv or yuvgrad:
        xy_, yy_ = rgb_to_yuv(x), rgb_to_yuv(y)
        if yuv:
            total = total + sim(xy_, yy_)
        if yuvgrad:
            gx, gy = _grads(xy_, False), _grads(yy_, False)
            total = total + sum(sim(a, b) for a, b in zip(gx, gy))
    return total


def spl_loss(x: jnp.ndarray, y: jnp.ndarray, **kw) -> jnp.ndarray:
    return gp_loss(x, y, **kw) + cp_loss(x, y, **kw)


# ---------------------------------------------------------------------------
# frequency / range / color / average losses
# ---------------------------------------------------------------------------


def fft_loss(x: jnp.ndarray, y: jnp.ndarray,
             criterion: Callable = l1) -> jnp.ndarray:
    """(ref FFTloss:509): criterion on 2D FFT magnitude+phase planes."""
    fx = jnp.fft.fft2(x, axes=(1, 2))
    fy = jnp.fft.fft2(y, axes=(1, 2))
    sx = jnp.stack([fx.real, fx.imag], axis=-1)
    sy = jnp.stack([fy.real, fy.imag], axis=-1)
    return criterion(sx, sy)


def overflow_loss(x: jnp.ndarray) -> jnp.ndarray:
    """(ref OFLoss:527): penalize values outside [0,1] (log barrier-ish:
    mean |clamp residual|)."""
    clipped = jnp.clip(x, 0.0, 1.0)
    return jnp.mean(jnp.abs(x - clipped))


def range_loss(x: jnp.ndarray, legit_range=(0.0, 1.0)) -> jnp.ndarray:
    """(ref RangeLoss:545): mean squared excursion outside the legit range."""
    d = jnp.maximum(x - legit_range[1], 0) + jnp.maximum(legit_range[0] - x, 0)
    return jnp.mean(d * d)


def color_loss(x: jnp.ndarray, y: jnp.ndarray, criterion: Callable = l1,
               ds_f: int = 4) -> jnp.ndarray:
    """(ref ColorLoss:587): criterion on UV chroma channels of avg-pooled
    images (color consistency at low frequency)."""
    def pool(z):
        return jax.lax.reduce_window(
            z, 0.0, jax.lax.add, (1, ds_f, ds_f, 1), (1, ds_f, ds_f, 1),
            "VALID") / (ds_f * ds_f)

    ux = rgb_to_yuv(pool(x))[..., 1:]
    uy = rgb_to_yuv(pool(y))[..., 1:]
    return criterion(ux, uy)


def average_loss(x: jnp.ndarray, y: jnp.ndarray, criterion: Callable = l1,
                 ds_f: int = 4) -> jnp.ndarray:
    """(ref AverageLoss:601): criterion on avg-pooled (downscaled) pair."""
    def pool(z):
        return jax.lax.reduce_window(
            z, 0.0, jax.lax.add, (1, ds_f, ds_f, 1), (1, ds_f, ds_f, 1),
            "VALID") / (ds_f * ds_f)

    return criterion(pool(x), pool(y))
