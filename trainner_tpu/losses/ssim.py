"""SSIM / MS-SSIM as differentiable jnp losses and metrics (NHWC).

Equivalent of ref codes/models/modules/ssim.py: ssim:58 (valid-conv
gaussian windows, sigma clamping), SSIM:200 (shave), ms_ssim:309
(per-level window shrink for small maps, padded avg-pool downsampling,
option-1 MATLAB weighting), MS_SSIM:418. Verified value-for-value
against the reference in tests/test_loss_fn_parity.py.

Train-safety note: the final geometric mean clamps its factors at 1e-6
instead of relu — d/dx x**w is infinite at x=0, which poisons gradients
(the relu guard the reference mentions is not train-safe).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import gaussian_kernel_1d


def _filt(x: jnp.ndarray, k1d: np.ndarray,
          use_padding: bool = False) -> jnp.ndarray:
    """Separable gaussian filtering; VALID by default (ref ssim.py
    apply_gaussian_filter with use_padding=False)."""
    k = jnp.asarray(k1d, x.dtype)
    n = k.shape[0]
    c = x.shape[-1]
    kh = jnp.broadcast_to(k.reshape(1, 1, n, 1), (c, 1, n, 1))
    kw = jnp.broadcast_to(k.reshape(1, 1, 1, n), (c, 1, 1, n))
    if use_padding:
        pad = (n - 1) // 2
        x = jnp.pad(x, ((0, 0), (pad, n - 1 - pad), (pad, n - 1 - pad),
                        (0, 0)), mode="symmetric")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=c)
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=c)


def ssim(x: jnp.ndarray, y: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, data_range: float = 1.0,
         full: bool = False, use_padding: bool = False,
         shave: int = 0, per_image: bool = False):
    """SSIM over the batch (ref ssim.py ssim:58 + SSIM.forward shave).
    x,y in [0, data_range], NHWC."""
    if shave:
        x = x[:, shave:-shave, shave:-shave, :]
        y = y[:, shave:-shave, shave:-shave, :]
    k = gaussian_kernel_1d(window_size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_x, mu_y = _filt(x, k, use_padding), _filt(y, k, use_padding)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    # clamp variances at 0 (ref :185 — required for mixed precision)
    sig_x = jnp.maximum(_filt(x * x, k, use_padding) - mu_x2, 0.0)
    sig_y = jnp.maximum(_filt(y * y, k, use_padding) - mu_y2, 0.0)
    sig_xy = _filt(x * y, k, use_padding) - mu_xy
    cs_map = (2 * sig_xy + c2) / (sig_x + sig_y + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_x2 + mu_y2 + c1)) * cs_map
    reduce = (lambda m: jnp.mean(m, axis=(1, 2, 3))) if per_image \
        else jnp.mean
    if full:
        return reduce(ssim_map), reduce(cs_map)
    return reduce(ssim_map)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Halve with 2x2 avg pooling, zero-padding odd dims first (ref
    ms_ssim:371 F.avg_pool2d(kernel_size=2, padding=(H%2, W%2)))."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, window_size: int = 11,
            sigma: float = 1.5, data_range: float = 1.0,
            levels: int = 5, use_padding: bool = False) -> jnp.ndarray:
    """Multi-scale SSIM, option 1 (MATLAB weighting) of ref ms_ssim:309:
    prod(cs_i^w_i, i<L) * ssim_L^w_L. When a level's map is smaller than
    the window, the window shrinks and sigma rescales with it (ref
    :348-360) so all `levels` always contribute."""
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    win, sig = window_size, sigma
    vals = []
    for i in range(levels):
        h, w = x.shape[1], x.shape[2]
        if win > h or win > w:
            new_win = min(win, h, w)
            if new_win % 2 == 0:
                new_win -= 1
            sig = new_win * sig / win if win else 0.0
            win = new_win
        s, cs = ssim(x, y, win, sig, data_range, full=True,
                     use_padding=use_padding, per_image=True)
        vals.append(s if i == levels - 1 else cs)
        if i != levels - 1:
            x, y = _downsample2(x), _downsample2(y)
    vals = jnp.stack(vals)  # (levels, batch): cs_0..cs_{L-2}, ssim_{L-1}
    # clamp with epsilon, not 0: d/dx x**w is infinite at x=0, which
    # poisons gradients (the relu-guard variant is not train-safe)
    vals = jnp.clip(vals, 1e-6, None)
    # ref ms_ssim:378 option 1 broadcasts ssim^w_L into every cs row
    # before the product, i.e. ssim_L contributes ^(w_L * (L-1)); kept
    # verbatim for parity
    per_img = jnp.prod(vals[:-1] ** weights[:-1, None]
                       * vals[-1] ** weights[-1], axis=0)
    return jnp.mean(per_img)


def ssim_loss(x: jnp.ndarray, y: jnp.ndarray, **kw) -> jnp.ndarray:
    return 1.0 - ssim(x, y, **kw)


def ms_ssim_loss(x: jnp.ndarray, y: jnp.ndarray, **kw) -> jnp.ndarray:
    return 1.0 - ms_ssim(x, y, **kw)
