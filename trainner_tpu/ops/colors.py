"""Differentiable color-space math (NHWC jnp).

Equivalent of ref codes/dataops/colors.py: rgb<->yuv/ycbcr/gray (:62-195),
srgb gamma (:197-204), WBC random color_shift:206 / ColorShift:267.
Coefficients follow BT.601 like the reference (and MATLAB rgb2ycbcr).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# BT.601 luma coefficients
_KR, _KG, _KB = 0.299, 0.587, 0.114


def rgb_to_grayscale(x: jnp.ndarray) -> jnp.ndarray:
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    return _KR * r + _KG * g + _KB * b


def rgb_to_yuv(x: jnp.ndarray, consts: str = "yuv") -> jnp.ndarray:
    """RGB -> YUV (ref dataops/colors.py rgb_to_yuv:66). Default 'yuv' is
    the reference's BT.601 analog form with delta=0.5 chroma offset; 'yuvK'
    is the Kornia offset-free matrix; 'ycbcr' the JPEG variant; 'uv'
    returns only chroma; 'y' only luma."""
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    y = _KR * r + _KG * g + _KB * b
    if consts == "y":
        return y
    if consts == "yuvK":
        u = -0.147 * r - 0.289 * g + 0.436 * b
        v = 0.615 * r - 0.515 * g - 0.100 * b
        return jnp.concatenate([y, u, v], axis=-1)
    if consts == "ycbcr":
        uc, vc = 0.564, 0.713
    else:  # 'yuv' / 'uv' / 'BT.601'
        uc, vc = 0.493, 0.877
    u = (b - y) * uc + 0.5
    v = (r - y) * vc + 0.5
    if consts == "uv":
        return jnp.concatenate([u, v], axis=-1)
    return jnp.concatenate([y, u, v], axis=-1)


def yuv_to_rgb(x: jnp.ndarray, consts: str = "yuv") -> jnp.ndarray:
    y, u, v = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    if consts == "yuvK":
        r = y + 1.14 * v
        g = y - 0.396 * u - 0.581 * v
        b = y + 2.029 * u
        return jnp.concatenate([r, g, b], axis=-1)
    uc, vc = (0.564, 0.713) if consts == "ycbcr" else (0.493, 0.877)
    r = y + (v - 0.5) / vc
    b = y + (u - 0.5) / uc
    g = (y - _KR * r - _KB * b) / _KG
    return jnp.concatenate([r, g, b], axis=-1)


def rgb_to_ycbcr(x: jnp.ndarray, only_y: bool = False) -> jnp.ndarray:
    """MATLAB-style rgb2ycbcr on [0,1] images (footroom/headroom scaling),
    matching ref dataops/common.py:265 bgr2ycbcr math (RGB order here)."""
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    y = (65.481 * r + 128.553 * g + 24.966 * b + 16.0) / 255.0
    if only_y:
        return y
    cb = (-37.797 * r - 74.203 * g + 112.0 * b + 128.0) / 255.0
    cr = (112.0 * r - 93.786 * g - 18.214 * b + 128.0) / 255.0
    return jnp.concatenate([y, cb, cr], axis=-1)


def ycbcr_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    y, cb, cr = x[..., 0:1] * 255.0, x[..., 1:2] * 255.0, x[..., 2:3] * 255.0
    r = (298.082 * y / 256.0 + 408.583 * cr / 256.0 - 222.921) / 255.0
    g = (298.082 * y / 256.0 - 100.291 * cb / 256.0 - 208.120 * cr / 256.0
         + 135.576) / 255.0
    b = (298.082 * y / 256.0 + 516.412 * cb / 256.0 - 276.836) / 255.0
    return jnp.concatenate([r, g, b], axis=-1)


def srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x <= 0.04045, x / 12.92,
                     jnp.power(jnp.maximum((x + 0.055) / 1.055, 1e-8), 2.4))


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * jnp.power(jnp.maximum(x, 1e-8), 1 / 2.4) - 0.055)


def color_shift(rng: jax.Array, img1: jnp.ndarray, img2: jnp.ndarray = None,
                mode: str = "uniform") -> Tuple:
    """WBC random-weighted grayscale projection (ref colors.py:206
    color_shift / ColorShift:267): random per-batch RGB weights."""
    k1, k2, k3 = jax.random.split(rng, 3)
    if mode == "normal":
        br = jax.random.normal(k1, ()) * 0.1 + 0.299
        bg = jax.random.normal(k2, ()) * 0.1 + 0.587
        bb = jax.random.normal(k3, ()) * 0.1 + 0.114
    else:
        br = jax.random.uniform(k1, (), minval=0.199, maxval=0.399)
        bg = jax.random.uniform(k2, (), minval=0.487, maxval=0.687)
        bb = jax.random.uniform(k3, (), minval=0.014, maxval=0.214)
    den = br + bg + bb

    def proj(img):
        return (img[..., 0:1] * br + img[..., 1:2] * bg
                + img[..., 2:3] * bb) / den

    if img2 is None:
        return (proj(img1),)
    return proj(img1), proj(img2)
