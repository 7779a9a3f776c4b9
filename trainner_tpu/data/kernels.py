"""Realistic degradation assets: KernelGAN kernel pools + real noise
patches.

Equivalents of ref codes/dataops/augmentations.py get_ds_kernels:1326 /
NoisePatches:375 / RandomNoisePatches:416 and augmennt ApplyKernel
(transforms.py:2428, loads estimated downscale kernels from .npy/.mat).

TPU-native: assets load ONCE into device-resident banks; the pipeline
draws per-sample indices with jax.random (batched gather), instead of the
reference's per-sample file reads in worker processes.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def load_kernel_pool(path: str, kernel_size: int = 21,
                     max_kernels: int = 256) -> Optional[np.ndarray]:
    """Load estimated downscale kernels (.npy / .mat) into one
    (N, k, k) bank, center-padded/cropped to kernel_size and normalized
    (ref get_ds_kernels:1326, ApplyKernel:2428)."""
    if not path or not os.path.isdir(path):
        return None
    kernels = []
    for f in sorted(os.listdir(path)):
        p = os.path.join(path, f)
        try:
            if f.endswith(".npy"):
                k = np.load(p)
            elif f.endswith(".mat"):
                from scipy.io import loadmat

                m = loadmat(p)
                k = next(v for v in m.values()
                         if isinstance(v, np.ndarray) and v.ndim == 2)
            else:
                continue
        except Exception:
            continue
        k = np.asarray(k, np.float64).squeeze()
        if k.ndim != 2:
            continue
        k = _center_fit(k, kernel_size)
        s = k.sum()
        if abs(s) < 1e-8:
            continue
        kernels.append((k / s).astype(np.float32))
        if len(kernels) >= max_kernels:
            break
    if not kernels:
        return None
    return np.stack(kernels)


def _center_fit(k: np.ndarray, size: int) -> np.ndarray:
    """Center-pad or center-crop a kernel to (size, size)."""
    h, w = k.shape
    out = np.zeros((size, size), k.dtype)
    sy = max((h - size) // 2, 0)
    sx = max((w - size) // 2, 0)
    dy = max((size - h) // 2, 0)
    dx = max((size - w) // 2, 0)
    ch = min(h, size)
    cw = min(w, size)
    out[dy:dy + ch, dx:dx + cw] = k[sy:sy + ch, sx:sx + cw]
    return out


def load_noise_patches(path: str, patch_size: int = 32,
                       n_patches: int = 256,
                       grayscale: bool = False,
                       seed: int = 0) -> Optional[np.ndarray]:
    """Extract random zero-mean noise patches from real noise images
    into one (N, p, p, c) bank (ref NoisePatches:375)."""
    from .common import read_img, scan_images

    if not path or not os.path.isdir(path):
        return None
    paths = scan_images(path)
    if not paths:
        return None
    rng = np.random.default_rng(seed)
    patches = []
    per_img = max(1, n_patches // len(paths))
    for p in paths:
        img = read_img(p)
        if grayscale:
            img = img.mean(-1, keepdims=True)
        h, w = img.shape[:2]
        if h < patch_size or w < patch_size:
            continue
        for _ in range(per_img):
            y = int(rng.integers(0, h - patch_size + 1))
            x = int(rng.integers(0, w - patch_size + 1))
            crop = img[y:y + patch_size, x:x + patch_size]
            patches.append(crop - crop.mean(axis=(0, 1), keepdims=True))
            if len(patches) >= n_patches:
                break
        if len(patches) >= n_patches:
            break
    if not patches:
        return None
    return np.stack(patches).astype(np.float32)


def apply_kernel_pool(rng, x, bank, scale: Optional[int] = None):
    """Per-sample realistic-kernel blur (+ optional aligned subsample)
    from a device-resident bank (the batched ApplyKernel)."""
    import jax
    import jax.numpy as jnp

    from ..ops.degradations import apply_kernels

    b = x.shape[0]
    idx = jax.random.randint(rng, (b,), 0, bank.shape[0])
    kerns = jnp.asarray(bank)[idx]
    y = apply_kernels(x, kerns)
    if scale and scale > 1:
        y = y[:, ::scale, ::scale, :]
    return y


def apply_noise_patches(rng, x, bank, noise_amp: float = 1.0):
    """Inject a random real-noise patch tile per sample
    (ref RandomNoisePatches:416). Patches tile spatially if smaller than
    the image."""
    import jax
    import jax.numpy as jnp

    b, h, w, c = x.shape
    bank = jnp.asarray(bank)
    n, p, _, pc = bank.shape
    r1, r2 = jax.random.split(rng)
    idx = jax.random.randint(r1, (b,), 0, n)
    patches = bank[idx]  # (b, p, p, pc)
    reps_h = (h + p - 1) // p
    reps_w = (w + p - 1) // p
    tiled = jnp.tile(patches, (1, reps_h, reps_w, 1))[:, :h, :w, :]
    if pc == 1 and c > 1:
        tiled = jnp.repeat(tiled, c, axis=-1)
    flip = jax.random.uniform(r2, (b, 1, 1, 1)) < 0.5
    tiled = jnp.where(flip, tiled[:, :, ::-1, :], tiled)
    return jnp.clip(x + noise_amp * tiled[..., :c], 0.0, 1.0)
