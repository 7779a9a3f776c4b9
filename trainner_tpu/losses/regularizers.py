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
    # zero padding to match ref load_filter:457 (nn.Conv2d int padding)
    lx = filter2d(x, k, pad_mode="constant")
    ly = filter2d(y, k, pad_mode="constant")
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
    grads = _grads(x, tv_type in ("dtv", "4d"))
    loss = 0.0
    for g in grads:
        loss = loss + (jnp.mean(jnp.abs(g)) if p == 1
                       else jnp.mean(g * g))
    return loss


# ---------------------------------------------------------------------------
# image gradient losses (2d = dx,dy; 4d = + diagonals)
# ---------------------------------------------------------------------------


def _grads(x: jnp.ndarray, four_d: bool):
    """Same-size finite differences with zeroed last row/col, matching
    ref dataops/filters.py get_image_gradients:722 (returns dx, dy) and
    get_4dim_image_gradients:749 (dx, dy, dp, dn)."""
    zc = jnp.zeros_like(x[:, :, :1, :])  # zero column
    zr = jnp.zeros_like(x[:, :1, :, :])  # zero row
    dx = jnp.concatenate([x[:, :, 1:, :] - x[:, :, :-1, :], zc], axis=2)
    dy = jnp.concatenate([x[:, 1:, :, :] - x[:, :-1, :, :], zr], axis=1)
    if not four_d:
        return [dx, dy]
    right = jnp.concatenate([x[:, :, 1:, :], zc], axis=2)
    bottom = jnp.concatenate([x[:, 1:, :, :], zr], axis=1)
    botright = jnp.concatenate(
        [jnp.concatenate([x[:, 1:, 1:, :], zc[:, 1:]], axis=2), zr],
        axis=1)
    dn = botright - x
    dp = right - bottom
    dp = dp.at[:, -1, :, :].set(0.0)
    return [dx, dy, dp, dn]


def gradient_loss(x: jnp.ndarray, y: jnp.ndarray, criterion: Callable = l1,
                  four_d: bool = False) -> jnp.ndarray:
    """(ref GradientLoss:302): criterion over image gradients."""
    gx, gy = _grads(x, four_d), _grads(y, four_d)
    return sum(criterion(a, b) for a, b in zip(gx, gy)) / len(gx)


# ---------------------------------------------------------------------------
# spatial profile losses (SPL: GPLoss + CPLoss, ref :616-768)
# ---------------------------------------------------------------------------


def _l2n(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    # torch F.normalize semantics: v / max(||v||, eps)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True),
                           1e-12)


def _spl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Spatial-profile similarity (ref SPLoss:741, the efficient batch
    form): column profiles (normalize along H) + row profiles (normalize
    along W), summed and scaled by -1/(H*B). NHWC axes 1/2 = NCHW 2/3."""
    h_term = jnp.sum(_l2n(a, 1) * _l2n(b, 1))
    w_term = jnp.sum(_l2n(a, 2) * _l2n(b, 2))
    return -(h_term + w_term) / (a.shape[1] * a.shape[0])


def _spl_trace(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Trace form (ref SPL_ComputeWithTrace:712): per-channel row/col
    cosine sums scaled by 1/H and 1/W respectively, -mean over batch."""
    rows = jnp.sum(_l2n(a, 2) * _l2n(b, 2), axis=(1, 2, 3)) / a.shape[1]
    cols = jnp.sum(_l2n(a, 1) * _l2n(b, 1), axis=(1, 2, 3)) / a.shape[2]
    return -jnp.sum(rows + cols) / a.shape[0]


def gp_loss(x: jnp.ndarray, y: jnp.ndarray, trace: bool = False,
            spl_denorm: bool = False) -> jnp.ndarray:
    """Gradient-profile loss (ref GPLoss:616)."""
    if spl_denorm:
        x, y = (x + 1) / 2, (y + 1) / 2
    sim = _spl_trace if trace else _spl
    gx, gy = _grads(x, False), _grads(y, False)
    return sum(sim(a, b) for a, b in zip(gx, gy))


def cp_loss(x: jnp.ndarray, y: jnp.ndarray, rgb: bool = True,
            yuv: bool = True, yuvgrad: bool = True, trace: bool = False,
            spl_denorm: bool = False, yuv_denorm: bool = False) -> jnp.ndarray:
    """Color-profile loss (ref CPLoss:652)."""
    if spl_denorm:
        x, y = (x + 1) / 2, (y + 1) / 2
    if yuv_denorm and not spl_denorm:
        x, y = (x + 1) / 2, (y + 1) / 2
    sim = _spl_trace if trace else _spl
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


def overflow_loss(x: jnp.ndarray, legit_range=(0.0, 1.0)) -> jnp.ndarray:
    """(ref OFLoss:527): mean log1p of the excursion outside the legit
    range (sum * out_norm 'bci' == mean)."""
    clipped = jnp.clip(x, legit_range[0], legit_range[1])
    return jnp.mean(jnp.log1p(jnp.abs(x - clipped)))


def range_loss(x: jnp.ndarray, legit_range=(0.0, 1.0)) -> jnp.ndarray:
    """(ref RangeLoss:545): mean (linear) excursion outside the legit
    range — max(max(x-hi, 0), max(lo-x, 0)) elementwise, averaged."""
    d = jnp.maximum(jnp.maximum(x - legit_range[1], 0.0),
                    jnp.maximum(legit_range[0] - x, 0.0))
    return jnp.mean(d)


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
