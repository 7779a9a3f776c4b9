"""Differentiable filter bank in jnp (NHWC).

Equivalent of ref codes/dataops/filters.py: kernel builders (:50-417),
generic filter2D (:544), FilterLow:643 / FilterHigh:674 (frequency
separation), GuidedFilter:873 + guided_filter:789 (WBC surface
representation, CEM post-processing).

TPU-first: filtering is a depthwise `lax.conv_general_dilated` with
`feature_group_count=C` — XLA maps it to the VPU/MXU; kernels are built
host-side as numpy constants and closed over, so everything stays static
under jit.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# kernel builders (numpy, host-side constants)
# ---------------------------------------------------------------------------


def box_kernel(size: int) -> np.ndarray:
    k = np.ones((size, size), np.float32)
    return k / k.sum()


def gaussian_kernel_1d(size: int, sigma: float) -> np.ndarray:
    ax = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    k = np.exp(-0.5 * (ax / sigma) ** 2)
    return k / k.sum()


def gaussian_kernel_2d(size: int, sigma: float,
                       sigma_y: Optional[float] = None,
                       angle: float = 0.0) -> np.ndarray:
    """Isotropic/anisotropic (rotated) gaussian kernel
    (ref augmennt RandomAnIsoBlur:2509 semantics)."""
    sigma_y = sigma if sigma_y is None else sigma_y
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax)
    if angle:
        t = math.radians(angle)
        xr = xx * math.cos(t) + yy * math.sin(t)
        yr = -xx * math.sin(t) + yy * math.cos(t)
        xx, yy = xr, yr
    k = np.exp(-0.5 * ((xx / max(sigma, 1e-8)) ** 2 +
                       (yy / max(sigma_y, 1e-8)) ** 2))
    k /= k.sum()
    return k.astype(np.float32)


def sinc_kernel(size: int, cutoff: float) -> np.ndarray:
    """2D circular lowpass (sinc) filter kernel via jinc, as used by
    Real-ESRGAN final sinc blur (ref augmennt RandomSincBlur:2593)."""
    from scipy.special import j1  # scipy is a baked-in dependency

    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax)
    r = np.sqrt(xx**2 + yy**2)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = cutoff * j1(cutoff * r) / (2 * math.pi * r)
    k[(size - 1) // 2, (size - 1) // 2] = cutoff**2 / (4 * math.pi)
    k /= k.sum()
    return k.astype(np.float32)


def log_kernel(size: int, sigma: float = 0.5) -> np.ndarray:
    """Laplacian-of-Gaussian kernel, numerically identical to ref
    filters.py get_log_kernel2d:224 (used by the HFEN loss): gaussian x
    (r^2 - 2 sigma^2) / (2 pi sigma^4), then sign-flipped and normalized
    by its own sum."""
    half = (size - 1) // 2
    ax = np.arange(-half, half + 1, dtype=np.float64)
    yy, xx = np.meshgrid(ax, ax, indexing="ij")
    s2 = sigma * sigma
    g = np.exp(-(xx ** 2) / (2 * s2)) * np.exp(-(yy ** 2) / (2 * s2))
    lg = g * ((xx ** 2 + yy ** 2) - 2 * s2) / (2 * math.pi * s2 * s2)
    lg = -lg / lg.sum()
    return lg.astype(np.float32)


def laplacian_kernel(size: int = 3) -> np.ndarray:
    if size == 3:
        return np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
    if size == 5:
        k = np.ones((5, 5), np.float32)
        k[2, 2] = -24.0
        return k
    raise ValueError("laplacian size must be 3 or 5")


def sobel_kernels() -> Tuple[np.ndarray, np.ndarray]:
    gx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    return gx, gx.T.copy()


def scharr_kernels() -> Tuple[np.ndarray, np.ndarray]:
    gx = np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], np.float32) / 16.0
    return gx, gx.T.copy()


def prewitt_kernels() -> Tuple[np.ndarray, np.ndarray]:
    gx = np.array([[-1, 0, 1], [-1, 0, 1], [-1, 0, 1]], np.float32)
    return gx, gx.T.copy()


def motion_kernel(size: int, angle: float = 0.0) -> np.ndarray:
    """Linear motion blur kernel at an angle."""
    k = np.zeros((size, size), np.float32)
    k[(size - 1) // 2, :] = 1.0
    if angle:
        from scipy.ndimage import rotate

        k = rotate(k, angle, reshape=False, order=1)
        k = np.clip(k, 0, None)
    k /= max(k.sum(), 1e-8)
    return k.astype(np.float32)


# ---------------------------------------------------------------------------
# application (jnp, NHWC)
# ---------------------------------------------------------------------------


def filter2d(x: jnp.ndarray, kernel, pad_mode: str = "reflect",
             stride: int = 1) -> jnp.ndarray:
    """Depthwise 2D filtering of an NHWC tensor with a single 2D kernel
    (ref filters.py:544 filter2D). Kernel may be numpy or jnp (kh, kw)."""
    k = jnp.asarray(kernel, x.dtype)
    kh, kw = k.shape[-2], k.shape[-1]
    c = x.shape[-1]
    # depthwise: OIHW with O=C, I=1
    kern = jnp.broadcast_to(k.reshape(1, 1, kh, kw), (c, 1, kh, kw))
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    x = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)),
                mode=pad_mode)
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "OIHW", "NHWC"), feature_group_count=c)


def filter2d_per_sample(x: jnp.ndarray, kernels: jnp.ndarray,
                        pad_mode: str = "reflect") -> jnp.ndarray:
    """Apply a different 2D kernel to every sample in the batch
    (B, kh, kw) -> per-sample depthwise conv. Used by the on-device
    degradation pipeline where each sample draws its own blur kernel."""
    def one(img, k):
        return filter2d(img[None], k, pad_mode)[0]

    return jax.vmap(one)(x, kernels.astype(x.dtype))


def separable_filter2d(x: jnp.ndarray, k1d: jnp.ndarray,
                       pad_mode: str = "reflect") -> jnp.ndarray:
    """Separable (e.g. gaussian) filtering as two 1D depthwise convs —
    cheaper on HBM bandwidth than the full 2D kernel."""
    k = jnp.asarray(k1d, x.dtype)
    n = k.shape[0]
    c = x.shape[-1]
    pad = (n - 1) // 2
    kh = jnp.broadcast_to(k.reshape(1, 1, n, 1), (c, 1, n, 1))
    kw = jnp.broadcast_to(k.reshape(1, 1, 1, n), (c, 1, 1, n))
    x = jnp.pad(x, ((0, 0), (pad, n - 1 - pad), (0, 0), (0, 0)), mode=pad_mode)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=c)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, n - 1 - pad), (0, 0)), mode=pad_mode)
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=c)


def filter_low(x: jnp.ndarray, kernel_size: int = 9,
               sigma: Optional[float] = None,
               filter_type: str = "gaussian") -> jnp.ndarray:
    """Low-pass filter (ref filters.py FilterLow:643): 'average' is
    AvgPool2d with zero padding counted in (count_include_pad=True);
    'gaussian' is a zero-padded conv with sigma = kernel_size/6
    (ref get_kernel_sigma:27). Parity-tested vs the reference."""
    if filter_type in ("average", "box"):
        return filter2d(x, box_kernel(kernel_size), pad_mode="constant")
    sigma = sigma or kernel_size / 6.0
    return separable_filter2d(x, gaussian_kernel_1d(kernel_size, sigma),
                              pad_mode="constant")


def filter_high(x: jnp.ndarray, kernel_size: int = 9,
                sigma: Optional[float] = None,
                filter_type: str = "gaussian",
                normalize: bool = True) -> jnp.ndarray:
    """High-pass = x - lowpass(x); normalize maps the signed residual to
    [0,1] via denorm ((hf+1)/2, ref FilterHigh:714 + common.denorm)."""
    hf = x - filter_low(x, kernel_size, sigma, filter_type)
    if normalize:
        hf = (hf + 1.0) / 2.0
    return hf


# ---------------------------------------------------------------------------
# guided filter (ref filters.py GuidedFilter:873)
# ---------------------------------------------------------------------------


def _box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Box filter of radius r via two 1D convs (sum, then normalize)."""
    size = 2 * r + 1
    k = np.ones((size,), np.float32) / size
    # reflect padding matches ref filter2D:545 (border_type='reflect')
    return separable_filter2d(x, k, pad_mode="reflect")


def guided_filter(guide: jnp.ndarray, src: jnp.ndarray, radius: int = 1,
                  eps: float = 1e-2) -> jnp.ndarray:
    """Edge-preserving guided filter (He et al.), NHWC per-channel guide.
    Used by WBC surface representation (ref wbc_model.py) and CEM
    post-processing (ref test.py:150-169)."""
    mean_i = _box_filter(guide, radius)
    mean_p = _box_filter(src, radius)
    mean_ip = _box_filter(guide * src, radius)
    cov_ip = mean_ip - mean_i * mean_p
    mean_ii = _box_filter(guide * guide, radius)
    var_i = mean_ii - mean_i * mean_i
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    mean_a = _box_filter(a, radius)
    mean_b = _box_filter(b, radius)
    return mean_a * guide + mean_b
