"""LPIPS perceptual distance (loss + validation metric).

Equivalent of ref codes/models/modules/LPIPS/perceptual_loss.py:13
(PerceptualLoss), dist_model.py:25, networks_basic.py (PNetLin): deep
features from a fixed backbone (squeeze | alex | vgg), channel-unit
normalization, per-layer 1x1 linear calibration, spatial average, layer
sum. The reference bundles only the linear-calibration weights
(modules/LPIPS/lpips_weights/v0.1/{squeeze,alex,vgg}.pth); backbone
weights come from torchvision.

Weights here: the calibrated lin vectors are BUNDLED in-repo
(trainner_tpu/losses/weights/lpips_lin_{net}.npz, converted from the
reference's v0.1 .pth) and load automatically. Backbone weights cannot be
redistributed offline; convert them once with
`python scripts/convert_torch_model.py lpips-full <torchvision.pth> out.npz
 --net squeeze` and point weights_path (or $TRAINNER_LPIPS_WEIGHTS, or drop
the file at trainner_tpu/losses/weights/lpips_{net}.npz) at the result.
Requesting LPIPS without backbone weights is a HARD ERROR (the reference
would silently download torchvision weights; we cannot) — pass
allow_random=True only for functional-form tests.

TPU-first: NHWC, pure functions; feature stacks are plain conv chains so
the whole distance is one fused XLA graph.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (channels per tap) per backbone, matching the torch LPIPS layouts
LPIPS_TAPS = {
    "squeeze": (64, 128, 256, 384, 384, 512, 512),
    "alex": (64, 192, 384, 256, 256),
    "vgg": (64, 128, 256, 512, 512),
}

# input normalization used by LPIPS (scaling layer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _max_pool_ceil(x, window: int = 3, stride: int = 2):
    """torch MaxPool2d(ceil_mode=True) equivalent: pad right/bottom with
    -inf so partial windows count (torchvision SqueezeNet uses ceil_mode)."""
    h, w = x.shape[1], x.shape[2]
    ph = (-(h - window) % stride) if h > window else 0
    pw = (-(w - window) % stride) if w > window else 0
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class SqueezeFeatures(nn.Module):
    """SqueezeNet1.1 feature taps (7 stages, torch lpips layout)."""

    dtype: Any = jnp.float32

    def _fire(self, x, squeeze, expand, name):
        s = nn.relu(nn.Conv(squeeze, (1, 1), dtype=self.dtype,
                            name=f"{name}_s")(x))
        e1 = nn.relu(nn.Conv(expand, (1, 1), dtype=self.dtype,
                             name=f"{name}_e1")(s))
        e3 = nn.relu(nn.Conv(expand, (3, 3), padding=1, dtype=self.dtype,
                             name=f"{name}_e3")(s))
        return jnp.concatenate([e1, e3], axis=-1)

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv1")(x))
        taps.append(x)
        x = _max_pool_ceil(x)
        x = self._fire(x, 16, 64, "fire1")
        x = self._fire(x, 16, 64, "fire2")
        taps.append(x)
        x = _max_pool_ceil(x)
        x = self._fire(x, 32, 128, "fire3")
        x = self._fire(x, 32, 128, "fire4")
        taps.append(x)
        x = _max_pool_ceil(x)
        x = self._fire(x, 48, 192, "fire5")
        taps.append(x)
        x = self._fire(x, 48, 192, "fire6")
        taps.append(x)
        x = self._fire(x, 64, 256, "fire7")
        taps.append(x)
        x = self._fire(x, 64, 256, "fire8")
        taps.append(x)
        return taps


class AlexFeatures(nn.Module):
    """AlexNet feature taps (5 stages)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        x = nn.relu(nn.Conv(64, (11, 11), strides=(4, 4), padding=2,
                            dtype=self.dtype, name="conv1")(x))
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(192, (5, 5), padding=2, dtype=self.dtype,
                            name="conv2")(x))
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding=1, dtype=self.dtype,
                            name="conv3")(x))
        taps.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="conv4")(x))
        taps.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="conv5")(x))
        taps.append(x)
        return taps


class VGG16Features(nn.Module):
    """VGG16 relu taps (relu1_2..relu5_3)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        plan = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        for b, (f, n) in enumerate(plan, start=1):
            for c in range(1, n + 1):
                x = nn.relu(nn.Conv(f, (3, 3), padding=1,
                                    dtype=self.dtype,
                                    name=f"conv{b}_{c}")(x))
            taps.append(x)
            if b < 5:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


_BACKBONES = {"squeeze": SqueezeFeatures, "alex": AlexFeatures,
              "vgg": VGG16Features}


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Learned perceptual distance d(x, y), inputs NHWC in [0,1] (or
    [-1,1] with z_norm=True). Returns (b,) distances."""

    net: str = "squeeze"
    z_norm: bool = False  # True if inputs are in [-1,1] (lpips convention)
    spatial: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        if not self.z_norm:  # LPIPS nets expect [-1,1]
            x = 2.0 * x - 1.0
            y = 2.0 * y - 1.0
        x = (x - _SHIFT) / _SCALE
        y = (y - _SHIFT) / _SCALE
        backbone = _BACKBONES[self.net](dtype=self.dtype, name="net")
        fx = backbone(x)
        fy = backbone(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (d.shape[-1],), jnp.float32)
            lin = jnp.sum(d * jax.nn.relu(w).astype(d.dtype), axis=-1)
            if self.spatial:
                total = total + lin if i else lin
            else:
                total = total + jnp.mean(lin, axis=(1, 2))
        return total


_WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "weights")


def bundled_lin_path(net: str) -> Optional[str]:
    """Path of the in-repo calibrated lin vectors for a backbone (converted
    from ref modules/LPIPS/lpips_weights/v0.1/{net}.pth), or None."""
    p = os.path.join(_WEIGHTS_DIR, f"lpips_lin_{net}.npz")
    return p if os.path.exists(p) else None


def find_lpips_weights(net: str) -> Optional[str]:
    """Auto-discover full (backbone+lin) LPIPS weights: explicit env var
    $TRAINNER_LPIPS_WEIGHTS, else the conventional in-repo drop point."""
    env = os.environ.get("TRAINNER_LPIPS_WEIGHTS")
    if env and os.path.exists(env):
        return env
    p = os.path.join(_WEIGHTS_DIR, f"lpips_{net}.npz")
    return p if os.path.exists(p) else None


def load_lpips_npz(path: str, net: Optional[str] = None) -> dict:
    """Load converted LPIPS weights (scripts/convert_torch_model.py
    lpips-full output): 'net/<layer>/kernel|bias' (HWIO) + 'lin{i}'
    vectors. Lin vectors missing from the file fall back to the bundled
    calibrated set for `net`."""
    data = np.load(path)
    params: Dict[str, Any] = {"net": {}}
    for key in data.files:
        if key.startswith("net/"):
            _, layer, leaf = key.split("/")
            params["net"].setdefault(layer, {})[leaf] = data[key]
        else:
            params[key] = data[key]
    if net and not any(k.startswith("lin") for k in params):
        lin = bundled_lin_path(net)
        if lin:
            lin_data = np.load(lin)
            for k in lin_data.files:
                params[k] = lin_data[k]
    return {"params": params}


class LPIPSWeightsMissing(RuntimeError):
    pass


def _missing_msg(net: str) -> str:
    return (
        f"LPIPS backbone weights for '{net}' not found. LPIPS needs "
        "pretrained torchvision features which cannot be bundled; convert "
        "them once on any machine with torchvision:\n"
        "  python scripts/convert_torch_model.py lpips-full "
        f"<torchvision_{net}.pth> lpips_{net}.npz --net {net}\n"
        "then either set TRAINNER_LPIPS_WEIGHTS=/path/to/lpips_"
        f"{net}.npz, set path.lpips_weights in the options file, or drop "
        f"the file at trainner_tpu/losses/weights/lpips_{net}.npz. "
        "(The calibrated lin vectors are already bundled in-repo.)")


class LPIPSMetric:
    """Callable metric wrapper used by utils.metrics.MetricsDict: takes
    HWC uint8/float images, returns scalar distance.

    Weights resolve as: explicit weights_path > $TRAINNER_LPIPS_WEIGHTS >
    trainner_tpu/losses/weights/lpips_{net}.npz. Missing backbone weights
    raise LPIPSWeightsMissing at construction (loud, not random-init);
    allow_random=True bypasses for functional-form tests only.
    """

    def __init__(self, net: str = "squeeze",
                 weights_path: Optional[str] = None,
                 allow_random: bool = False):
        self.model = LPIPS(net=net)
        self.net = net
        self._params = None
        self._weights_path = weights_path or find_lpips_weights(net)
        self._allow_random = allow_random
        if self._weights_path is None and not allow_random:
            raise LPIPSWeightsMissing(_missing_msg(net))
        self._fn = None

    def _ensure(self, shape):
        if self._fn is not None:
            return
        if self._weights_path:
            variables = load_lpips_npz(self._weights_path, net=self.net)
        else:  # allow_random: functional form on random features
            rng = jax.random.PRNGKey(0)
            x0 = jnp.zeros((1, *shape), jnp.float32)
            variables = jax.jit(
                lambda r, a: self.model.init(r, a, a))(rng, x0)
        self._params = variables
        self._fn = jax.jit(lambda v, a, b: self.model.apply(v, a, b))

    def __call__(self, sr: np.ndarray, gt: np.ndarray) -> float:
        sr = np.asarray(sr, np.float32)
        gt = np.asarray(gt, np.float32)
        if sr.max() > 1.5:
            sr, gt = sr / 255.0, gt / 255.0
        self._ensure(sr.shape)
        d = self._fn(self._params, jnp.asarray(sr)[None],
                     jnp.asarray(gt)[None])
        return float(d[0])
