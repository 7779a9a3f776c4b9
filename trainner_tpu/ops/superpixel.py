"""Batched SLIC superpixel segmentation + region recolor, in pure JAX.

TPU-native replacement for the reference's host-side superpixel transform
(ref codes/models/wbc_model.py batch_superpixel:23 + get_sp_transform:44,
augmennt Superpixels transforms.py:2711 / superpixels.py:344): where the
reference runs scikit-image felzenszwalb/SLIC per image on a joblib thread
pool, this runs SLIC k-means for the whole batch ON DEVICE — the
assignment step is a (h*w, K) distance matmul and the center update is a
one-hot segment-mean matmul, both MXU-shaped; iterations are a lax.scan.

p_replace=1 semantics: every pixel is replaced by its segment mean color
(the WBC "structure" representation), followed by random gamma like
get_sp_transform.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _init_centers(h: int, w: int, n_segments: int):
    gh = max(1, int(round(math.sqrt(n_segments * h / w))))
    gw = max(1, (n_segments + gh - 1) // gh)
    ys = (jnp.arange(gh) + 0.5) * (h / gh)
    xs = (jnp.arange(gw) + 0.5) * (w / gw)
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
    return cy.reshape(-1), cx.reshape(-1), gh, gw


@partial(jax.jit, static_argnames=("n_segments", "n_iter", "compactness"))
def slic_segment_mean(images: jnp.ndarray, n_segments: int = 200,
                      n_iter: int = 5, compactness: float = 10.0
                      ) -> jnp.ndarray:
    """images (b,h,w,c) in [0,1] -> piecewise-constant segment-mean images."""
    b, h, w, c = images.shape
    cy0, cx0, gh, gw = _init_centers(h, w, n_segments)
    K = cy0.shape[0]
    S = math.sqrt(h * w / K)
    ratio = (compactness / S) ** 2

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    pos = jnp.stack([py.reshape(-1), px.reshape(-1)], -1)  # (hw, 2)

    def one(img):
        feat = img.reshape(-1, c)  # (hw, c)
        cent_pos = jnp.stack([cy0, cx0], -1)  # (K, 2)
        # init center colors by bilinear sample at center positions
        yi = jnp.clip(cy0.astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(cx0.astype(jnp.int32), 0, w - 1)
        cent_col = img[yi, xi]

        def step(carry, _):
            cent_col, cent_pos = carry
            # (hw, K) squared distances = color + scaled spatial
            d_col = (jnp.sum(feat ** 2, -1, keepdims=True)
                     - 2.0 * feat @ cent_col.T
                     + jnp.sum(cent_col ** 2, -1)[None])
            d_pos = (jnp.sum(pos ** 2, -1, keepdims=True)
                     - 2.0 * pos @ cent_pos.T
                     + jnp.sum(cent_pos ** 2, -1)[None])
            assign = jnp.argmin(d_col + ratio * d_pos, axis=-1)
            onehot = jax.nn.one_hot(assign, K, dtype=jnp.float32)
            cnt = jnp.maximum(onehot.sum(0), 1.0)  # (K,)
            new_col = (onehot.T @ feat) / cnt[:, None]
            new_pos = (onehot.T @ pos) / cnt[:, None]
            return (new_col, new_pos), assign

        (cent_col, cent_pos), assigns = jax.lax.scan(
            step, (cent_col, cent_pos), None, length=n_iter)
        assign = assigns[-1]
        out = cent_col[assign].reshape(h, w, c)
        return out

    return jax.vmap(one)(images)


def superpixel_structure(rng: jax.Array, images: jnp.ndarray,
                         n_segments: int = 200, n_iter: int = 5,
                         gamma_range: Tuple[float, float] = (1.0, 1.2)
                         ) -> jnp.ndarray:
    """WBC structure representation: SLIC segment-mean + random gamma
    (ref get_sp_transform:44 applies RandomGamma(100,120)/100)."""
    sp = slic_segment_mean(images, n_segments, n_iter)
    b = images.shape[0]
    gamma = jax.random.uniform(rng, (b, 1, 1, 1), minval=gamma_range[0],
                               maxval=gamma_range[1])
    return jnp.clip(sp, 1e-6, 1.0) ** gamma
