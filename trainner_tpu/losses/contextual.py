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


def _cx_sim(dist: jnp.ndarray, band_width: float,
            b: float = 1.0) -> jnp.ndarray:
    """Eq (2)-(4) of Mechrez et al.: relative distances (min over the
    target axis), exp((b - d~)/h), softmax over the target axis
    (ref _calculate_relative_distance:983 + calculate_CX_Loss:1070-1079)."""
    d_min = jnp.min(dist, axis=2, keepdims=True)
    d_tilde = dist / (d_min + 1e-5)
    w = jnp.exp((b - d_tilde) / band_width)
    return w / jnp.sum(w, axis=2, keepdims=True)


def _cx_from_dist(dist: jnp.ndarray, band_width: float,
                  b: float = 1.0) -> jnp.ndarray:
    """Regular CX loss: max over source positions, mean over target
    positions, -log (ref calculate_CX_Loss:1087-1090)."""
    cx_ij = _cx_sim(dist, band_width, b)
    cx = jnp.mean(jnp.max(cx_ij, axis=1), axis=1)
    return jnp.mean(-jnp.log(cx))


def _cosine_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(B,N,C),(B,M,C) -> (B,N,M) cosine distance, mean-shifted by the
    GLOBAL (batch+position) channel mean of y and halved, matching ref
    _create_using_dotP:953 ((1 - cos) / 2, clamped at 0)."""
    y_mu = jnp.mean(y, axis=(0, 1), keepdims=True)
    xc = x - y_mu
    yc = y - y_mu
    xn = xc / jnp.maximum(jnp.linalg.norm(xc, axis=-1, keepdims=True),
                          1e-12)
    yn = yc / jnp.maximum(jnp.linalg.norm(yc, axis=-1, keepdims=True),
                          1e-12)
    sim = jnp.einsum("bnc,bmc->bnm", xn, yn,
                     preferred_element_type=jnp.float32)
    return jnp.maximum((1.0 - sim) / 2.0, 0.0)


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
    calc_type: str = "regular"  # regular | symetric | bilateral
    band_width: float = 0.5
    b: float = 1.0
    weight_sp: float = 0.1  # bilateral spatial mix
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

    def _cx(self, x, y, hw=None):
        """One layer's CX in the configured calc mode. `hw` is the
        feature-map spatial shape for the bilateral grid."""
        if self.calc_type == "symetric":
            # (ref symetric_CX_Loss:995)
            a = _cx_from_dist(self._dist(y, x), self.band_width, self.b)
            c = _cx_from_dist(self._dist(x, y), self.band_width, self.b)
            return (a + c) / 2.0
        if self.calc_type == "bilateral":
            # (ref bilateral_CX_Loss:998): blend feature CX with a
            # spatial-proximity CX over the normalized pixel grid
            h, w = hw
            rows = jnp.arange(h, dtype=jnp.float32) / (h + 1)
            cols = jnp.arange(w, dtype=jnp.float32) / (w + 1)
            gy, gx = jnp.meshgrid(rows, cols, indexing="ij")
            grid = jnp.stack([gy, gx], -1).reshape(1, h * w, 2)
            grid = _subsample(grid.reshape(1, h, w, 2), self.max_points)
            d_sp = _l2_dist(grid, grid)
            cx_sp = _cx_sim(d_sp, self.band_width, self.b)
            cx_feat = _cx_sim(self._dist(x, y), self.band_width, self.b)
            cx = ((1.0 - self.weight_sp) * cx_feat
                  + self.weight_sp * cx_sp)
            bb, n, p = cx.shape
            if n == h * w:
                # ref bilateral_CX_Loss:1030 reduces source positions as
                # max over W then mean over H (the NHWP dim=2 max)
                cs = jnp.mean(jnp.max(cx.reshape(bb, h, w, p), axis=2),
                              axis=1)
            else:  # subsampled maps: max over all source positions
                cs = jnp.max(cx, axis=1)
            return jnp.mean(-jnp.log(cs + 1e-5))
        return _cx_from_dist(self._dist(x, y), self.band_width, self.b)

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
            hw = f_sr[name].shape[1:3]
            x = _subsample(f_sr[name], self.max_points).astype(jnp.float32)
            y = _subsample(f_hr[name], self.max_points).astype(jnp.float32)
            total += w * self._cx(x, y, hw)
        return total
