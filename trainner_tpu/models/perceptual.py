"""Feature extractors for perceptual / contextual losses (Flax, NHWC).

Equivalent of ref codes/models/modules/architectures/perceptual.py:73
FeatureExtractor (arbitrary listen-layers, input-norm, remove-pooling,
custom weights) — specialized to the VGG family the reference actually uses
(vgg11/13/16/19 feature stacks, ref networks.py define_F:316).

Pretrained weights: torchvision is not bundled; weights load from an .npz
produced by scripts/convert_torch_model.py vgg (torch .pth state_dict ->
npz of HWIO conv kernels). Without weights the extractor runs random-init
(functional but not parity — callers warn).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG feature-stack configs: number of convs per block (torchvision layout)
VGG_CFGS = {
    "vgg11": (1, 1, 2, 2, 2),
    "vgg13": (2, 2, 2, 2, 2),
    "vgg16": (2, 2, 3, 3, 3),
    "vgg19": (2, 2, 4, 4, 4),
}

# ImageNet normalization (ref perceptual.py uses the standard constants)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def vgg_layer_names(arch: str = "vgg19") -> List[str]:
    names = []
    for b, n in enumerate(VGG_CFGS[arch], start=1):
        for c in range(1, n + 1):
            names.append(f"conv{b}_{c}")
        names.append(f"pool{b}")
    return names


def canonical_layer(name: str) -> str:
    """Normalize ref layer keys: 'conv_3_2'/'conv3_2'/'relu3_2' ->
    'conv3_2' (+ relu marker kept as prefix)."""
    n = name.lower().replace("-", "_")
    relu = n.startswith("relu")
    n = n.replace("relu", "conv").replace("conv_", "conv")
    if "_" not in n[4:]:
        # e.g. conv54 -> conv5_4
        digits = [ch for ch in n if ch.isdigit()]
        if len(digits) == 2:
            n = f"conv{digits[0]}_{digits[1]}"
    return ("relu:" if relu else "") + n


class VGGFeatures(nn.Module):
    """VGG feature stack returning activations at requested layers.

    listen: tuple of canonical layer names ('conv5_4' = pre-activation,
    'relu:conv5_4' = post-activation). ESRGAN's classic perceptual feature
    is pre-activation conv5_4 (torchvision features[34]).
    """

    arch: str = "vgg19"
    listen: Tuple[str, ...] = ("conv5_4",)
    use_input_norm: bool = True
    z_norm: bool = False  # input in [-1,1] instead of [0,1]
    remove_pooling: bool = False
    pooling_stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        if self.z_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = x.astype(self.dtype)
        wanted = {canonical_layer(l) for l in self.listen}
        deepest = max(
            (l.split("conv")[-1] for l in wanted), default="5_4")
        out: Dict[str, jnp.ndarray] = {}
        for b, n_convs in enumerate(VGG_CFGS[self.arch], start=1):
            for c in range(1, n_convs + 1):
                name = f"conv{b}_{c}"
                x = nn.Conv(64 * min(2 ** (b - 1), 8), (3, 3), padding=1,
                            dtype=self.dtype, name=name)(x)
                if name in wanted:
                    out[name] = x.astype(jnp.float32)
                x = nn.relu(x)
                if f"relu:{name}" in wanted:
                    out[f"relu:{name}"] = x.astype(jnp.float32)
            if not self.remove_pooling and b < 5:
                x = nn.max_pool(x, (2, 2),
                                strides=(self.pooling_stride,) * 2)
            # early exit: stop once all requested taps are collected
            if len(out) == len(wanted) and f"{b}" >= deepest[0]:
                break
        return out


def load_vgg_npz(path: str) -> dict:
    """Load converted torchvision VGG weights into a flax params dict.

    The npz maps 'conv{b}_{c}/kernel' (HWIO) and 'conv{b}_{c}/bias'.
    Produced by scripts/convert_torch_model.py vgg.
    """
    data = np.load(path)
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for key in data.files:
        layer, leaf = key.split("/")
        params.setdefault(layer, {})[leaf] = data[key]
    return {"params": params}


class ResNet101Features(nn.Module):
    """ResNet-101 conv1-3 feature extractor (ref perceptual.py:220
    ResNet101FeatureExtractor: children[:8] = stem + 3 bottleneck stages,
    with optional input normalization)."""

    use_input_norm: bool = True
    z_norm: bool = False
    dtype: Any = jnp.float32

    def _bottleneck(self, x, mid, out, stride, name, train):
        import flax.linen as fnn

        def bn(v):
            return fnn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype,
                                 param_dtype=jnp.float32)(v)

        h = fnn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                     name=f"{name}_c1")(x)
        h = fnn.relu(bn(h))
        h = fnn.Conv(mid, (3, 3), strides=(stride, stride), padding=1,
                     use_bias=False, dtype=self.dtype,
                     name=f"{name}_c2")(h)
        h = fnn.relu(bn(h))
        h = fnn.Conv(out, (1, 1), use_bias=False, dtype=self.dtype,
                     name=f"{name}_c3")(h)
        h = bn(h)
        if x.shape[-1] != out or stride != 1:
            x = fnn.Conv(out, (1, 1), strides=(stride, stride),
                         use_bias=False, dtype=self.dtype,
                         name=f"{name}_proj")(x)
            x = bn(x)
        return fnn.relu(x + h)

    @nn.compact
    def __call__(self, x, train: bool = False):
        import flax.linen as fnn

        if self.z_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = x.astype(self.dtype)
        x = fnn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                     use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = fnn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                          param_dtype=jnp.float32, name="bn1")(x)
        x = fnn.relu(x)
        x = fnn.max_pool(x, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)))
        plan = [(64, 256, 3, 1), (128, 512, 4, 2), (256, 1024, 23, 2)]
        for si, (mid, out, reps, stride) in enumerate(plan, start=1):
            for r in range(reps):
                x = self._bottleneck(x, mid, out,
                                     stride if r == 0 else 1,
                                     f"layer{si}_{r}", train)
        return x


class MINCFeatures(nn.Module):
    """MINC-VGG16 material-perception features (ref perceptual.py:249
    MINCNet: VGG16 conv stack up to conv5_3, no input norm)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import flax.linen as fnn

        x = x.astype(self.dtype)
        plan = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        for b, (f, n) in enumerate(plan, start=1):
            for c in range(1, n + 1):
                x = fnn.Conv(f, (3, 3), padding=1, dtype=self.dtype,
                             name=f"conv{b}{c}" if b <= 2 else
                             f"conv{b}_{c}")(x)
                if not (b == 5 and c == 3):
                    x = fnn.relu(x)
            if b < 5:
                x = fnn.max_pool(x, (2, 2), strides=(2, 2))
        return x
