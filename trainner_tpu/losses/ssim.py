"""SSIM / MS-SSIM as differentiable jnp losses and metrics (NHWC).

Equivalent of ref codes/models/modules/ssim.py:200 (SSIM) and :418
(MS-SSIM): separable gaussian windows, train-capable. The gaussian window
matches the standard 11x11 sigma=1.5 used by the reference and MATLAB.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import gaussian_kernel_1d, separable_filter2d


def _filt(x: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    # valid-mode gaussian filtering (matches MATLAB ssim 'valid' behavior
    # closely enough for loss use; metric-parity version in utils.metrics)
    return separable_filter2d(x, k1d, pad_mode="symmetric")


def ssim(x: jnp.ndarray, y: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, data_range: float = 1.0,
         full: bool = False):
    """Mean SSIM over the batch. x,y in [0, data_range], NHWC."""
    k = gaussian_kernel_1d(window_size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_x, mu_y = _filt(x, k), _filt(y, k)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = _filt(x * x, k) - mu_x2
    sig_y = _filt(y * y, k) - mu_y2
    sig_xy = _filt(x * y, k) - mu_xy
    cs_map = (2 * sig_xy + c2) / (sig_x + sig_y + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_x2 + mu_y2 + c1)) * cs_map
    if full:
        return jnp.mean(ssim_map), jnp.mean(cs_map)
    return jnp.mean(ssim_map)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, window_size: int = 11,
            sigma: float = 1.5, data_range: float = 1.0,
            levels: int = 5) -> jnp.ndarray:
    """Multi-scale SSIM (ref ssim.py:418). Input must be >= 2^(levels-1) *
    (window_size+1) pixels; callers on small crops should lower `levels`."""
    # cap levels so the coarsest map stays at least window-sized
    h, w = x.shape[1], x.shape[2]
    max_levels = max(1, int(np.log2(max(min(h, w) // window_size, 1))) + 1)
    levels = min(levels, max_levels)
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    weights = weights / jnp.sum(weights)
    vals = []
    for i in range(levels):
        s, cs = ssim(x, y, window_size, sigma, data_range, full=True)
        vals.append(s if i == levels - 1 else cs)
        if i != levels - 1:
            x, y = _downsample2(x), _downsample2(y)
    vals = jnp.stack(vals)
    # clamp with epsilon, not 0: d/dx x**w is infinite at x=0, which
    # poisons gradients (standard relu-guard variant is not train-safe)
    return jnp.prod(jnp.clip(vals, 1e-6, None) ** weights)


def ssim_loss(x: jnp.ndarray, y: jnp.ndarray, **kw) -> jnp.ndarray:
    return 1.0 - ssim(x, y, **kw)


def ms_ssim_loss(x: jnp.ndarray, y: jnp.ndarray, **kw) -> jnp.ndarray:
    return 1.0 - ms_ssim(x, y, **kw)
