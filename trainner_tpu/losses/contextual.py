"""Contextual loss (CX) over VGG features.

Equivalent of ref codes/models/modules/loss.py Contextual_Loss:769:
cosine / L1 / L2 distance variants over VGG feature patches, band_width
softmax aggregation, optional bilateral (spatial-aware) CX.

TPU note: the pairwise feature-distance matrix is a batched matmul -> MXU;
features are spatially subsampled to cap the N^2 term (the reference does
random 64x64 crops of feature maps — we subsample to max_points).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.perceptual import VGGFeatures, canonical_layer


def _subsample(feat: jnp.ndarray, max_points: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B,N,C) with N <= max_points via strided subsampling
    (static, jit-friendly)."""
    b, h, w, c = feat.shape
    n = h * w
    f = feat.reshape(b, n, c)
    if n > max_points:
        stride = -(-n // max_points)  # ceil
        f = f[:, ::stride, :]
    return f


def _cx_from_dist(dist: jnp.ndarray, band_width: float) -> jnp.ndarray:
    """CX similarity aggregation (Mechrez et al. 2018): relative distances,
    softmax over candidates, max over target, -log mean."""
    d_min = jnp.min(dist, axis=2, keepdims=True)
    d_tilde = dist / (d_min + 1e-5)
    w = jnp.exp((1.0 - d_tilde) / band_width)
    cx_ij = w / jnp.sum(w, axis=2, keepdims=True)
    cx = jnp.mean(jnp.max(cx_ij, axis=1), axis=1)
    return jnp.mean(-jnp.log(cx + 1e-5))


def _cosine_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(B,N,C),(B,M,C) -> (B,N,M) cosine distance with mean-shift by y."""
    y_mu = jnp.mean(y, axis=1, keepdims=True)
    xc = x - y_mu
    yc = y - y_mu
    xn = xc / (jnp.linalg.norm(xc, axis=-1, keepdims=True) + 1e-10)
    yn = yc / (jnp.linalg.norm(yc, axis=-1, keepdims=True) + 1e-10)
    sim = jnp.einsum("bnc,bmc->bnm", xn, yn,
                     preferred_element_type=jnp.float32)
    return jnp.clip(1.0 - sim, 0.0, 2.0)


def _l2_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)          # (B,N,1)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)          # (B,M,1)
    xy = jnp.einsum("bnc,bmc->bnm", x, y,
                    preferred_element_type=jnp.float32)
    d = x2 - 2 * xy + jnp.swapaxes(y2, 1, 2)
    return jnp.maximum(d, 0.0)


def _l1_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    # (B,N,M) pairwise L1 — memory heavy; only for small N
    return jnp.sum(jnp.abs(x[:, :, None, :] - y[:, None, :, :]), axis=-1)


@dataclass
class ContextualLoss:
    """(ref Contextual_Loss:769). layers_weights mirrors cx_vgg_layers
    option, e.g. {'conv_3_2': 1, 'conv_4_2': 1}."""

    layers_weights: Dict[str, float] = field(
        default_factory=lambda: {"conv3_2": 1.0, "conv4_2": 1.0})
    distance_type: str = "cosine"  # cosine | l1 | l2
    band_width: float = 0.5
    use_vgg: bool = True
    arch: str = "vgg19"
    weights_path: Optional[str] = None
    max_points: int = 4096
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.layers_weights = {
            canonical_layer(k): float(v)
            for k, v in self.layers_weights.items()}
        if self.use_vgg:
            self.model = VGGFeatures(
                arch=self.arch, listen=tuple(self.layers_weights),
                use_input_norm=True, dtype=self.dtype)
            if self.weights_path:
                from ..models.perceptual import load_vgg_npz

                self.variables = load_vgg_npz(self.weights_path)
            else:
                self.variables = self.model.init(
                    {"params": jax.random.PRNGKey(13)},
                    jnp.zeros((1, 32, 32, 3)))

    def _dist(self, x, y):
        if self.distance_type == "cosine":
            return _cosine_dist(x, y)
        if self.distance_type == "l2":
            return _l2_dist(x, y)
        return _l1_dist(x, y)

    def __call__(self, sr: jnp.ndarray, hr: jnp.ndarray) -> jnp.ndarray:
        if self.use_vgg:
            f_sr = self.model.apply(self.variables, sr)
            f_hr = jax.tree_util.tree_map(
                jax.lax.stop_gradient, self.model.apply(self.variables, hr))
        else:
            f_sr = {"pix": sr}
            f_hr = {"pix": hr}
            self.layers_weights = {"pix": 1.0}
        total = 0.0
        for name, w in self.layers_weights.items():
            x = _subsample(f_sr[name], self.max_points).astype(jnp.float32)
            y = _subsample(f_hr[name], self.max_points).astype(jnp.float32)
            dist = self._dist(x, y)
            total += w * _cx_from_dist(dist, self.band_width)
        return total
