"""Batched geometric transforms (rotation / perspective) on device.

Equivalents of ref codes/dataops/augmentations.py rotateHR:833 (random
continuous rotation with crop-to-valid) and augmennt RandomPerspective
(transforms.py:1353) — the reference applies them per-sample with OpenCV
in workers; here whole batches warp through one bilinear gather
(ops/warp.grid_sample).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .warp import grid_sample


def _affine_grid(theta: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """theta: (b, 2, 3) affines over normalized coords -> sampling grid
    (b, h, w, 2) (torch affine_grid convention, align_corners=True)."""
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (h, w, 3)
    return jnp.einsum("bij,hwj->bhwi", theta, base)


def rotate_batch(rng: jax.Array, x: jnp.ndarray,
                 max_deg: float = 45.0,
                 crop_to_valid: bool = True) -> jnp.ndarray:
    """Random per-sample rotation; optionally zoom so no invalid corners
    appear (ref rotateHR crops to the largest valid rect)."""
    b, h, w, c = x.shape
    ang = jax.random.uniform(rng, (b,), minval=-max_deg, maxval=max_deg)
    rad = ang * math.pi / 180.0
    ct, st = jnp.cos(rad), jnp.sin(rad)
    if crop_to_valid:
        # zoom factor so the rotated frame covers the full crop
        zoom = jnp.abs(ct) + jnp.abs(st)
    else:
        zoom = jnp.ones_like(ct)
    theta = jnp.stack([
        jnp.stack([ct * zoom, -st * zoom, jnp.zeros_like(ct)], -1),
        jnp.stack([st * zoom, ct * zoom, jnp.zeros_like(ct)], -1),
    ], axis=1)  # (b, 2, 3)
    grid = _affine_grid(theta, h, w)
    return grid_sample(x, grid, align_corners=True, padding_mode="border")


def rotate_pair(rng: jax.Array, hr: jnp.ndarray, lr: jnp.ndarray,
                max_deg: float = 45.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate an HR/LR pair consistently (same per-sample angles)."""
    b = hr.shape[0]
    ang_rng, _ = jax.random.split(rng)
    # share the angle stream: rotate both with the same key
    return (rotate_batch(ang_rng, hr, max_deg),
            rotate_batch(ang_rng, lr, max_deg))


def perspective_batch(rng: jax.Array, x: jnp.ndarray,
                      distortion: float = 0.2) -> jnp.ndarray:
    """Random per-sample perspective warp (ref RandomPerspective:1353):
    jitter the 4 corners by up to `distortion` of the image size and
    sample through the induced homography."""
    b, h, w, c = x.shape
    d = distortion
    jit = jax.random.uniform(rng, (b, 4, 2), minval=-d, maxval=d)
    # source corners (normalized): TL, TR, BR, BL
    src = jnp.asarray([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
    dst = src[None] + jit

    def homography(s, t):
        # solve 8-dof H with h33 = 1 from 4 correspondences
        rows = []
        rhs = []
        for i in range(4):
            xs, ys = s[i, 0], s[i, 1]
            xd, yd = t[i, 0], t[i, 1]
            rows.append(jnp.stack([xs, ys, 1.0, 0.0, 0.0, 0.0,
                                   -xd * xs, -xd * ys]))
            rows.append(jnp.stack([0.0, 0.0, 0.0, xs, ys, 1.0,
                                   -yd * xs, -yd * ys]))
            rhs.extend([xd, yd])
        A = jnp.stack(rows)
        bvec = jnp.stack(rhs)
        sol = jnp.linalg.solve(A, bvec)
        return jnp.concatenate([sol, jnp.ones((1,))]).reshape(3, 3)

    hs = jax.vmap(lambda t: homography(src, t))(dst)  # (b, 3, 3)
    inv = jnp.linalg.inv(hs)
    ys = jnp.linspace(-1.0, 1.0, h)
    xs_ = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs_, indexing="ij")
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
    warped = jnp.einsum("bij,hwj->bhwi", inv, base)
    grid = warped[..., :2] / jnp.clip(warped[..., 2:3], 1e-6, None)
    return grid_sample(x, grid, align_corners=True, padding_mode="border")
