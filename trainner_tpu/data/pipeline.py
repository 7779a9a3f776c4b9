"""On-device degradation pipeline assembly.

TPU-native redesign of ref codes/dataops/augmentations.py:
get_unpaired_params:1510 (split dataset options into lr/hr aug configs) and
aug_pipeline:1666-1801 (ordered blur -> resize -> noise -> compression ->
auto_levels -> unsharp -> fringes -> blur2 -> resize2 -> noise2 then
final_compression | final_scale + final_blur).

Where the reference composes per-sample OpenCV transforms inside DataLoader
worker processes, this builds ONE jitted function that degrades the whole
batch on device with per-sample random parameters (ops/degradations.py).
Per-sample *type* choices are branch-free one-hot mixes; per-sample
*pipeline order* shuffle (shuffle_degradations) approximates the reference
by drawing one order per call from a precompiled set of permutations
(cached jit specializations, bounded).

Camera-ISP noise and SLIC superpixels run ON DEVICE too
(ops/degradations.camera_noise, ops/superpixel). Ops with no efficient
device form (CLAHE, real noise patches, SOM quantization) substitute
gaussian noise in the device mixture; exact variants can run in the host
dataset path.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import degradations as D

# ---------------------------------------------------------------------------
# option splitting (ref get_unpaired_params:1510)
# ---------------------------------------------------------------------------

_AUG_KEYS = [
    # (aug_name, enable_key, prob_key, types_key)
    ("auto_levels", "lr_auto_levels", "lr_rand_auto_levels", None),
    ("unsharp", "lr_unsharp_mask", "lr_rand_unsharp", None),
    ("fringes", "lr_fringes", "lr_fringes_chance", None),
    ("blur", "lr_blur", "blur_prob", "lr_blur_types"),
    ("blur2", "lr_blur2", "blur_prob2", "lr_blur_types2"),
    ("final_blur", "final_blur", "final_blur_prob", "final_blur"),
    ("resize", "lr_downscale", None, "lr_downscale_types"),
    ("resize2", "lr_downscale2", None, "lr_downscale_types2"),
    ("final_scale", "final_scale", None, "final_scale_types"),
    ("noise", "lr_noise", None, "lr_noise_types"),
    ("noise2", "lr_noise2", None, "lr_noise_types2"),
    ("compression", "compression", None, "compression"),
    ("final_compression", "final_compression", None, "final_compression"),
]

_HR_AUG_KEYS = [
    ("auto_levels", "hr_auto_levels", "hr_rand_auto_levels", None),
    ("unsharp", "hr_unsharp_mask", "hr_rand_unsharp", None),
    ("noise", "hr_noise", None, "hr_noise_types"),
]


def _collect(opt: dict, keys) -> Dict[str, dict]:
    out: Dict[str, dict] = {}
    for aug, enable_key, prob_key, types_key in keys:
        enabled = opt.get(enable_key)
        types = opt.get(types_key) if types_key else None
        if types_key and types_key == enable_key:
            types = enabled if isinstance(enabled, (list, tuple)) else types
        if not enabled and not types:
            continue
        prob = opt.get(prob_key) if prob_key else None
        if prob is None:
            prob = 1.0
        weights = None
        if isinstance(types, dict):
            # weighted-choice form {type: weight} (ref
            # get_weighted_choice:1417, used by the strategy presets)
            names, ws = zip(*types.items()) if types else ((), ())
            types, weights = list(names), [float(w) for w in ws]
        elif isinstance(types, (list, tuple)):
            types = list(types)
        else:
            types = [types] if types else []
        out[aug] = {"prob": float(prob), "types": types,
                    "weights": weights}
    return out


def get_unpaired_params(opt: dict) -> Tuple[dict, dict]:
    """Split dataset options into lr/hr aug param dicts
    (same surface as ref augmentations.py:1510)."""
    lr_augs = _collect(opt, _AUG_KEYS)
    hr_augs = _collect(opt, _HR_AUG_KEYS)
    if opt.get("shuffle_degradations"):
        lr_augs["random_shuffle"] = True
    if lr_augs:
        lr_augs["kind"] = "lr"
    if hr_augs:
        hr_augs["kind"] = "hr"
    return lr_augs, hr_augs


# ---------------------------------------------------------------------------
# stage builders
# ---------------------------------------------------------------------------

_DEVICE_NOISE = ("gaussian", "jpeg", "webp", "poisson", "speckle", "s&p",
                 "sp", "quantize", "dither", "maxrgb", "camera",
                 "superpixels")


def _with_prob(fn: Callable, prob: float) -> Callable:
    if prob >= 1.0:
        return fn

    def wrapped(rng, x):
        r1, r2 = jax.random.split(rng)
        y = fn(r1, x)
        b = x.shape[0]
        mask = (jax.random.uniform(r2, (b, 1, 1, 1)) < prob)
        return jnp.where(mask, y, x) if y.shape == x.shape else y

    return wrapped


def _blur_stage(types: Sequence[str], cfgs: Dict[str, dict],
                prob: float, weights=None) -> Callable:
    types = [str(t).lower() for t in types] or ["gaussian"]

    def fn(rng, x):
        b = x.shape[0]
        banks = []
        rngs = jax.random.split(rng, len(types) + 1)
        for t, r in zip(types, rngs[:-1]):
            cfg = cfgs.get(t, {}) or cfgs.get(t + "2", {}) or {}
            k = int(cfg.get("kernel_size", 21))
            if t in ("iso", "gaussian"):
                sx = cfg.get("sigmaX") or [0.1, 2.8]
                banks.append(D.gaussian_kernels(
                    r, b, k, tuple(map(float, sx)), iso_prob=1.0))
            elif t in ("aniso", "bilateral"):
                sx = cfg.get("sigmaX") or [0.5, 8.0]
                sy = cfg.get("sigmaY") or sx
                banks.append(D.gaussian_kernels(
                    r, b, k, tuple(map(float, sx)), iso_prob=0.0,
                    sigma_y_range=tuple(map(float, sy))))
            elif t in ("sinc",):
                banks.append(D.sinc_kernels(r, b, k))
            elif t in ("motion", "complexmotion", "complex_motion"):
                banks.append(D.motion_kernels(r, b, k))
            elif t in ("average", "box", "median"):
                banks.append(D.box_kernels(r, b, k))
            else:
                banks.append(D.gaussian_kernels(r, b, k, (0.2, 3.0)))
        # pad kernel banks to one size
        kmax = max(kk.shape[-1] for kk in banks)
        banks = [jnp.pad(kk, [(0, 0),
                              ((kmax - kk.shape[-1]) // 2,) * 2,
                              ((kmax - kk.shape[-1]) // 2,) * 2])
                 for kk in banks]
        kern = D.select_kernels(rngs[-1], banks, weights=weights)
        return D.apply_kernels(x, kern)

    return _with_prob(fn, prob)


def _noise_stage(types: Sequence[str], cfgs: Dict[str, dict],
                 prob: float, weights=None) -> Callable:
    """Per-sample choice among noise types (one-hot mixture, optionally
    weighted — ref get_weighted_choice:1417)."""
    raw = [str(t).lower() for t in types] or ["gaussian"]
    types = [t if (t in _DEVICE_NOISE or "dither" in t or "quantize" in t)
             else "gaussian" for t in raw]

    def make_op(t: str) -> Callable:
        cfg = cfgs.get(t, {}) or {}
        if t == "gaussian":
            var = cfg.get("var_limit") or [1.0, 30.0]
            sig = (math.sqrt(float(var[0])), math.sqrt(float(var[1])))
            return partial(D.gaussian_noise, sigma_range=sig,
                           gray_prob=1.0 - float(cfg.get("prob_color",
                                                         0.6)))
        if t in ("jpeg", "webp"):
            qr = (float(cfg.get("min_quality", 30)),
                  float(cfg.get("max_quality", 95)))
            return partial(D.jpeg_compress, quality_range=qr)
        if t == "poisson":
            sr = cfg.get("scale_range") or [0.5, 3.0]
            return partial(D.poisson_noise,
                           scale_range=tuple(map(float, sr)))
        if t == "speckle":
            var = cfg.get("var_limit") or [0.001, 0.01]
            sig = (math.sqrt(float(var[0])), math.sqrt(float(var[1])))
            return partial(D.speckle_noise, sigma_range=sig)
        if t in ("s&p", "sp"):
            amt = float(cfg.get("amount", 0.01))
            return partial(D.salt_pepper_noise,
                           amount_range=(amt / 10, amt))
        if t in ("simplequantize", "simple_quantize"):
            n = int(cfg.get("num_colors", cfg.get("rgb_range", 32)))
            return lambda rng, x: D.quantize_colors(x, n)
        if "quantize" in t:  # quantize / som_quantize / km_quantize
            n = int(cfg.get("num_colors", 32))
            return partial(D.kmeans_quantize, n_colors=n)
        if "dither" in t:
            # ref augmentations.py :304-318 substring dispatch
            bw = "bw" in t
            if "bayer" in t:
                kind = "bayer"
            elif "avg" in t:
                kind = "avg"
            elif "bin" in t:
                kind = "bin"
            elif "rnd" in t:
                kind = "rnd"
            elif "fs" in t or t == "dither":
                kind = "fs"
            else:
                kind = "bayer"
            bits = int(cfg.get("bits", 1))
            return partial(D.dither_batch, kind=kind, bits=bits, bw=bw)
        if t == "maxrgb":
            return lambda rng, x: jnp.max(
                x, axis=-1, keepdims=True).repeat(x.shape[-1], -1)
        if t == "camera":
            return partial(D.camera_noise)
        if t == "superpixels":
            from ..ops.superpixel import superpixel_structure

            n_seg = int(cfg.get("n_segments", 200))
            return lambda rng, x: superpixel_structure(
                rng, x, n_segments=n_seg)
        return partial(D.gaussian_noise)

    ops = [make_op(t) for t in types]

    def fn(rng, x):
        b = x.shape[0]
        rngs = jax.random.split(rng, len(ops) + 1)
        if len(ops) == 1:
            return ops[0](rngs[0], x)
        cands = jnp.stack([op(r, x) for op, r in zip(ops, rngs[:-1])],
                          axis=1)
        if weights is not None:
            pw = jnp.asarray(weights, jnp.float32)
            pw = pw / pw.sum()
            choice = jax.random.categorical(
                rngs[-1], jnp.log(pw + 1e-12)[None].repeat(b, 0))
        else:
            choice = jax.random.randint(rngs[-1], (b,), 0, len(ops))
        onehot = jax.nn.one_hot(choice, len(ops),
                                dtype=x.dtype)[:, :, None, None, None]
        return jnp.sum(cands * onehot, axis=1)

    return _with_prob(fn, prob)


def _resize_stage(types: Sequence[int], out_hw_fn, prob: float = 1.0
                  ) -> Callable:
    algos = [t for t in types if isinstance(t, int)]
    down_up_mode = any(t == 996 for t in algos)
    aligned = any(t == 995 for t in algos)
    # drop the special-dispatch codes (995 aligned, 996 down_up, 999
    # realistic-kernel pool); keep cv2 codes and matlab codes 100-104/998
    algos = [t for t in algos if t not in (995, 996, 999, 997)] or [2]

    def fn(rng, x):
        out_hw = out_hw_fn(x.shape)
        if down_up_mode and out_hw == x.shape[1:3]:
            return D.down_up(rng, x, algos=algos)
        if aligned:
            s = x.shape[1] // out_hw[0]
            if s > 1 and x.shape[1] % out_hw[0] == 0:
                return D.nearest_aligned_downscale(x, s)
        return D.random_resize(rng, x, out_hw, algos)

    return _with_prob(fn, prob)


# ---------------------------------------------------------------------------
# the batch degrader
# ---------------------------------------------------------------------------


class BatchDegrader:
    """Config -> jitted batched degradation fn (the aug_pipeline:1666
    equivalent). Call with (rng, images NHWC [0,1]) -> degraded images.

    kind='lr': includes the in-pipeline downscale to 1/scale.
    kind='hr': keeps size (auto_levels/unsharp/noise only).
    """

    ORDER = ["blur", "resize", "noise", "compression", "auto_levels",
             "unsharp", "fringes", "blur2", "resize2", "noise2"]

    def __init__(self, dataset_opt: dict, kind: str = "lr",
                 params: Optional[dict] = None):
        self.opt = dataset_opt
        self.kind = kind
        self.scale = int(dataset_opt.get("scale", 1) or 1)
        if params is None:
            lr_p, hr_p = get_unpaired_params(dataset_opt)
            params = lr_p if kind == "lr" else hr_p
        self.params = params or {}
        cfgs = dataset_opt.get("aug_configs") or {}
        self.shuffle = bool(self.params.get("random_shuffle"))

        # realistic assets: KernelGAN kernel pool (resize code 999) and
        # real noise patches ('patches' noise type) — loaded once into
        # device-resident banks (data/kernels.py)
        from .kernels import load_kernel_pool, load_noise_patches

        self.kernel_bank = load_kernel_pool(
            dataset_opt.get("dataroot_kernels") or "") \
            if dataset_opt.get("dataroot_kernels") else None
        noise_types = (self.params.get("noise") or {}).get("types") or []
        self.patch_bank = None
        if any(str(t).lower() == "patches" for t in noise_types) and \
                dataset_opt.get("noise_data"):
            lr_size = int(dataset_opt.get("crop_size", 128) or 128) // \
                max(self.scale, 1)
            self.patch_bank = load_noise_patches(
                dataset_opt["noise_data"], patch_size=max(lr_size, 16))

        p = self.params
        stages: List[Tuple[str, Callable]] = []
        for name in self.ORDER:
            if name not in p:
                continue
            conf = p[name]
            if name in ("blur", "blur2"):
                stages.append((name, _blur_stage(
                    conf["types"], cfgs, conf["prob"],
                    weights=conf.get("weights"))))
            elif name in ("noise", "noise2", "compression"):
                types = conf["types"] or (["jpeg"]
                                          if name == "compression" else [])
                if any(str(t).lower() == "patches" for t in types) and \
                        self.patch_bank is not None:
                    from .kernels import apply_noise_patches

                    bank = self.patch_bank
                    stages.append((name, _with_prob(
                        lambda rng, x, bank=bank:
                        apply_noise_patches(rng, x, bank),
                        conf["prob"])))
                else:
                    stages.append((name, _noise_stage(
                        types, cfgs, conf["prob"],
                        weights=conf.get("weights"))))
            elif name in ("resize", "resize2"):
                if kind != "lr":
                    continue
                if name == "resize":
                    s = self.scale
                    out_fn = (lambda shape, s=s:
                              (shape[1] // s, shape[2] // s))
                else:
                    out_fn = lambda shape: (shape[1], shape[2])
                if name == "resize" and self.kernel_bank is not None and \
                        any(t == 999 for t in conf["types"]):
                    from .kernels import apply_kernel_pool

                    bank = self.kernel_bank
                    sc = self.scale
                    stages.append((name, lambda rng, x, bank=bank, sc=sc:
                                   apply_kernel_pool(rng, x, bank, sc)))
                else:
                    stages.append((name, _resize_stage(
                        conf["types"], out_fn, conf["prob"])))
            elif name == "auto_levels":
                prob = conf["prob"]
                stages.append((name, _with_prob(
                    lambda rng, x: D.auto_levels(x), prob)))
            elif name == "unsharp":
                stages.append((name, _with_prob(D.unsharp_mask,
                                                conf["prob"])))
            elif name == "fringes":
                stages.append((name, _with_prob(D.fringes, conf["prob"])))
        self.stages = stages

        # finals (ref aug_pipeline:1780-1786: compression XOR scale+blur
        # order flipped by coin; we apply in fixed order scale->blur->comp)
        finals: List[Tuple[str, Callable]] = []
        if "final_scale" in p and kind == "lr":
            finals.append(("final_scale", _resize_stage(
                p["final_scale"]["types"],
                lambda shape: (shape[1], shape[2]))))
        if "final_blur" in p:
            fb = p["final_blur"]
            types = [t for t in fb["types"] if isinstance(t, str)] \
                or ["sinc"]
            finals.append(("final_blur", _blur_stage(types, cfgs,
                                                     fb["prob"])))
        if "final_compression" in p:
            finals.append(("final_compression", _noise_stage(
                ["jpeg"], cfgs, p["final_compression"]["prob"])))
        self.finals = finals
        self._jitted: Dict[Any, Callable] = {}

    @property
    def is_noop(self) -> bool:
        return not self.stages and not self.finals

    def _build(self, order: Tuple[int, ...]) -> Callable:
        stages = [self.stages[i] for i in order] + self.finals

        def run(rng, x):
            x = x.astype(jnp.float32)
            for _, fn in stages:
                rng, r = jax.random.split(rng)
                x = fn(r, x)
            return jnp.clip(x, 0.0, 1.0)

        return jax.jit(run)

    def __call__(self, rng: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
        if self.is_noop:
            return images
        n = len(self.stages)
        order = tuple(range(n))
        if self.shuffle and n > 1:
            # one order per call, drawn from a bounded precomputed set so
            # jit specializations stay capped (the reference shuffles
            # per sample; resize stays in place to keep scale consistent)
            if not hasattr(self, "_orders"):
                import random as _pyrandom

                gen = _pyrandom.Random(0)
                self._orders = []
                for _ in range(8):
                    idx = [i for i in range(n)
                           if self.stages[i][0] != "resize"]
                    gen.shuffle(idx)
                    it = iter(idx)
                    self._orders.append(tuple(
                        i if self.stages[i][0] == "resize" else next(it)
                        for i in range(n)))
                self._order_rng = _pyrandom.Random(1)
            order = self._order_rng.choice(self._orders)
        if order not in self._jitted:
            self._jitted[order] = self._build(order)
        return self._jitted[order](rng, images)
