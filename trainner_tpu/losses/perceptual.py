"""VGG perceptual loss + LPIPS-style calibrated distance.

Equivalents of ref codes/models/losses.py PerceptualLoss:220 (layer-weight
dicts, gram-matrix style loss, optional rotation/flip augmentation, lpips
path) and codes/models/modules/LPIPS/ (linear-calibrated feature distance).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.perceptual import VGGFeatures, canonical_layer, load_vgg_npz
from .basic import get_pixel_criterion

DEFAULT_LAYER_WEIGHTS = {"conv5_4": 1.0}  # classic ESRGAN feature layer


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,C,C) normalized gram (style loss)."""
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f,
                      preferred_element_type=jnp.float32) / (h * w * c)


@dataclass
class PerceptualLoss:
    """Feature-space loss over a VGG extractor (ref losses.py:220).

    Built once per training task; holds the (frozen) extractor params.
    `__call__(sr, hr)` is jit-safe.
    """

    layer_weights: Dict[str, float] = field(
        default_factory=lambda: dict(DEFAULT_LAYER_WEIGHTS))
    criterion: str = "l1"
    arch: str = "vgg19"
    use_input_norm: bool = True
    z_norm: bool = False
    style: bool = False  # gram-matrix style loss instead of feature loss
    weights_path: Optional[str] = None
    perceptual_weight: float = 1.0
    style_weight: float = 1.0
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        import jax.random as jr

        arch = (self.arch or "vgg19").lower()
        self._single_tap = False
        if arch.startswith("resnet"):
            # ref networks.py define_F resnet101 branch (perceptual.py:220)
            from ..models.perceptual import ResNet101Features

            self.model = ResNet101Features(
                use_input_norm=self.use_input_norm, z_norm=self.z_norm,
                dtype=self.dtype)
            self.layer_weights = {"feat": 1.0}
            self._single_tap = True
            self.variables = self.model.init(
                jr.PRNGKey(7), jnp.zeros((1, 64, 64, 3)))
        elif arch.startswith("minc"):
            # ref networks.py define_F minc branch (MINCNet, perceptual.py:249)
            from ..models.perceptual import MINCFeatures

            self.model = MINCFeatures(dtype=self.dtype)
            self.layer_weights = {"feat": 1.0}
            self._single_tap = True
            self.variables = self.model.init(
                jr.PRNGKey(7), jnp.zeros((1, 64, 64, 3)))
        else:
            self.layer_weights = {
                canonical_layer(k): float(v)
                for k, v in self.layer_weights.items()}
            self.model = VGGFeatures(
                arch=arch, listen=tuple(self.layer_weights),
                use_input_norm=self.use_input_norm, z_norm=self.z_norm,
                dtype=self.dtype)
            if self.weights_path:
                self.variables = load_vgg_npz(self.weights_path)
            else:
                self.variables = self.model.init(
                    {"params": jr.PRNGKey(7)}, jnp.zeros((1, 32, 32, 3)))
        self._crit = get_pixel_criterion(self.criterion)

    def features(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self._single_tap:
            out = self.model.apply(self.variables, x, train=False)
            return {"feat": out.astype(jnp.float32)}
        return self.model.apply(self.variables, x)

    def __call__(self, sr: jnp.ndarray, hr: jnp.ndarray) -> jnp.ndarray:
        f_sr = self.features(sr)
        f_hr = jax.tree_util.tree_map(
            jax.lax.stop_gradient, self.features(hr))
        total = 0.0
        for name, w in self.layer_weights.items():
            a, b = f_sr[name], f_hr[name]
            if self.style:
                total += w * self._crit(gram_matrix(a), gram_matrix(b)) \
                    * self.style_weight
            else:
                total += w * self._crit(a, b) * self.perceptual_weight
        return total


# ---------------------------------------------------------------------------
# LPIPS-style distance (ref modules/LPIPS/perceptual_loss.py:13)
# ---------------------------------------------------------------------------


@dataclass
class LPIPS:
    """Linear-calibrated perceptual distance.

    Architecture mirrors LPIPS v0.1: backbone feature taps, per-layer unit
    normalization, learned 1x1 linear weights, spatial average. Calibration
    weights load from an npz (converted offline); without them, falls back
    to equal weighting (still a usable validation metric, flagged
    uncalibrated).
    """

    arch: str = "vgg16"
    layers: Tuple[str, ...] = ("relu:conv1_2", "relu:conv2_2", "relu:conv3_3",
                               "relu:conv4_3", "relu:conv5_3")
    weights_path: Optional[str] = None
    lin_weights_path: Optional[str] = None
    dtype: Any = jnp.float32

    def __post_init__(self):
        self.model = VGGFeatures(arch=self.arch, listen=self.layers,
                                 use_input_norm=True, dtype=self.dtype)
        if self.weights_path:
            self.variables = load_vgg_npz(self.weights_path)
        else:
            import jax.random as jr

            self.variables = self.model.init(
                {"params": jr.PRNGKey(11)}, jnp.zeros((1, 64, 64, 3)))
        self.lin = None
        lin_path = self.lin_weights_path
        if lin_path is None and self.arch == "vgg16":
            # calibrated LPIPS-v0.1 vgg lin vectors are bundled in-repo
            from .lpips import bundled_lin_path

            lin_path = bundled_lin_path("vgg")
        if lin_path:
            import numpy as np

            data = np.load(lin_path)
            self.lin = {k: jnp.asarray(data[k]) for k in data.files
                        if k.startswith("lin")}

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        fx = self.model.apply(self.variables, x)
        fy = self.model.apply(self.variables, y)
        total = 0.0
        for i, name in enumerate(self.layers):
            a = fx[name] / (jnp.linalg.norm(fx[name], axis=-1, keepdims=True)
                            + 1e-10)
            b = fy[name] / (jnp.linalg.norm(fy[name], axis=-1, keepdims=True)
                            + 1e-10)
            d = (a - b) ** 2  # (B,H,W,C)
            if self.lin is not None and f"lin{i}" in self.lin:
                w = self.lin[f"lin{i}"].reshape(1, 1, 1, -1)
                d = d * w
                total += jnp.mean(jnp.sum(d, axis=-1))
            else:
                total += jnp.mean(d)
        return total
