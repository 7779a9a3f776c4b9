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

Static-shape emulation of the reference's dynamic intermediate sizes:
the reference's in-pipeline resize lands at a per-sample random size X
(adj_scale_config) and final_scale snaps to the LR size, so noise /
compression injected after the resize is attenuated by ~LR/X by the
final antialiased downscale. Here the resize goes straight to the LR
size (static shapes for XLA) and noise-stage residuals are scaled per
sample by the equivalent attenuation distribution (_atten_factor,
derived from the resize config + chosen algo class). The final
compression-vs-scale order coin (ref aug_pipeline:1780) is per-sample
and branch-free (both orders computed, one-hot mixed). Gated
statistically against the reference per preset in
tests/test_degradation_stat_parity.py.

Camera-ISP noise, SLIC superpixels, CLAHE, SOM quantization and the
median/bilateral filters all run ON DEVICE with exact cv2-matched
semantics (ops/degradations, ops/superpixel). Real noise patches load
into a device-resident bank (data/kernels.py).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
        # the enable flag alone gates the stage (ref get_aug_confs:1442 /
        # get_res_confs:1478 `if opt.get(aug_name)`): an explicit false
        # disables it even when the preset overlay filled in the types
        if not enabled:
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
    (same surface as ref augmentations.py:1510). In-pipeline resize
    stages only activate when 'in' in resize_strat (ref :1560) — with
    the default 'pre' strategy the downscale happens in the dataset
    (LR generation), not inside the degradation pipeline."""
    lr_augs = _collect(opt, _AUG_KEYS)
    hr_augs = _collect(opt, _HR_AUG_KEYS)
    if "in" not in str(opt.get("resize_strat") or "pre"):
        for k in ("resize", "resize2", "final_scale"):
            lr_augs.pop(k, None)
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
                 "superpixels", "clahe")


def _with_prob(fn: Callable, prob: float) -> Callable:
    if prob >= 1.0:
        return fn

    def wrapped(rng, x, **kw):
        r1, r2 = jax.random.split(rng)
        y = fn(r1, x, **kw)
        b = x.shape[0]
        mask = (jax.random.uniform(r2, (b, 1, 1, 1)) < prob)
        return jnp.where(mask, y, x) if y.shape == x.shape else y

    wrapped._wants_att = getattr(fn, "_wants_att", False)
    return wrapped


def _cfg_for(cfgs: Dict[str, dict], t: str, cycle: int = 1) -> dict:
    """Cycle-aware per-op config lookup (ref get_aug_configs: stage-2
    kinds prefer the '<type>2' preset entry, e.g. aniso2/camera2)."""
    if cycle == 2:
        return cfgs.get(t + "2") or cfgs.get(t) or {}
    return cfgs.get(t) or cfgs.get(t + "2") or {}


def _blur_stage(types: Sequence[str], cfgs: Dict[str, dict],
                prob: float, weights=None, cycle: int = 1) -> Callable:
    """Per-sample weighted blur-type choice -> per-sample kernel. Each
    type applies with its own config `p` (ref transforms default 0.5,
    presets set it explicitly) — misses blend in an identity kernel."""
    types = [str(t).lower() for t in types] or ["gaussian"]

    def fn(rng, x):
        b = x.shape[0]
        banks = []
        probs = []
        rngs = jax.random.split(rng, len(types) + 2)
        for t, r in zip(types, rngs[:-2]):
            cfg = _cfg_for(cfgs, t, cycle)
            k = int(cfg.get("kernel_size", 21))
            mk = int(cfg.get("min_kernel_size", 1) or 1)
            probs.append(float(cfg.get("p", 0.5)))
            if t in ("iso", "gaussian"):
                sx = cfg.get("sigmaX") or [0.1, 2.8]
                banks.append(D.gaussian_kernels(
                    r, b, k, tuple(map(float, sx)), iso_prob=1.0,
                    min_size=mk))
            elif t in ("aniso",):
                sx = cfg.get("sigmaX") or [0.5, 8.0]
                sy = cfg.get("sigmaY") or sx
                ang = cfg.get("angle")
                ang_r = tuple(math.radians(float(a)) for a in ang) \
                    if ang else None
                banks.append(D.gaussian_kernels(
                    r, b, k, tuple(map(float, sx)), iso_prob=0.0,
                    sigma_y_range=tuple(map(float, sy)), min_size=mk,
                    angle_range=ang_r))
            elif t in ("sinc",):
                # min_cutoff set -> FIXED cutoff (ref RandomSincBlur:
                # `if self.cutoff: cutoff = self.cutoff`)
                mc = cfg.get("min_cutoff")
                banks.append(D.sinc_kernels(
                    r, b, k,
                    cutoff_range=(float(mc), float(mc)) if mc else None,
                    min_size=max(mk, 7)))
            elif t in ("motion", "complexmotion", "complex_motion"):
                banks.append(D.motion_kernels(r, b, k))
            elif t in ("average", "box"):
                banks.append(D.box_kernels(r, b, k))
            elif t in ("median", "bilateral"):
                banks.append(None)  # exact nonlinear op, handled below
            else:
                banks.append(D.gaussian_kernels(r, b, k, (0.2, 3.0)))
        # pad kernel banks to one size
        kmax = max((kk.shape[-1] for kk in banks if kk is not None),
                   default=21)
        delta = jnp.zeros((kmax, kmax)).at[kmax // 2, kmax // 2].set(1.0)
        banks = [jnp.broadcast_to(delta[None], (b, kmax, kmax))
                 if kk is None else
                 jnp.pad(kk, [(0, 0),
                              ((kmax - kk.shape[-1]) // 2,) * 2,
                              ((kmax - kk.shape[-1]) // 2,) * 2])
                 for kk in banks]
        # per-type application probability: blend a delta (identity)
        # kernel per sample that skips the blur
        if any(p < 1.0 for p in probs):
            r_p = rngs[-2]
            u = jax.random.uniform(r_p, (b, len(banks), 1, 1))
            pv = jnp.asarray(probs)[None, :, None, None]
            banks = [jnp.where(u[:, i] < pv[:, i], kk, delta[None])
                     for i, kk in enumerate(banks)]
        # choose type per sample, then compute candidates: the linear
        # kernel mixture plus exact nonlinear ops (median/bilateral)
        n = len(types)
        if weights is not None:
            pw = jnp.asarray(weights, jnp.float32)
            pw = pw / pw.sum()
            choice = jax.random.categorical(
                rngs[-1], jnp.log(pw + 1e-12)[None].repeat(b, 0))
        else:
            choice = jax.random.randint(rngs[-1], (b,), 0, n)
        nonlinear = {i: t for i, t in enumerate(types)
                     if t in ("median", "bilateral")}
        onehot_k = jax.nn.one_hot(choice, n)[:, :, None, None]
        stack = jnp.stack(banks, axis=1)
        kern = jnp.sum(stack * onehot_k, axis=1)
        out = D.apply_kernels(x, kern)
        for i, t in nonlinear.items():
            cfg = _cfg_for(cfgs, t, cycle)
            if t == "median":
                ksz = int(cfg.get("kernel_size", 3))
                ksz = ksz if ksz % 2 else ksz + 1
                y = D.median_blur(x, min(ksz, 11))
            else:
                ksz = int(cfg.get("kernel_size", 9))
                y = D.bilateral_blur(
                    x, min(ksz if ksz % 2 else ksz + 1, 11),
                    float(cfg.get("sigmaColor", 75.0) or 75.0),
                    float(cfg.get("sigmaSpace", 75.0) or 75.0))
            if probs[i] < 1.0:
                r_nl = jax.random.fold_in(rngs[-2], i)
                miss = jax.random.uniform(r_nl, (b, 1, 1, 1)) >= probs[i]
                y = jnp.where(miss, x, y)
            sel = (choice == i)[:, None, None, None]
            out = jnp.where(sel, y, out)
        return out

    return _with_prob(fn, prob)


def _atten_factor(rng, b: int, res_cfg: dict, scale: int,
                  res_types: Sequence[int] = (),
                  chain_cfg: Optional[dict] = None):
    """Per-sample residual attenuation v = clip(LR_size / X, 0, 1) for an
    op injected at the reference's intermediate size X (ref
    adj_scale_config:58). The canvas-size ratio r = X / LR depends on the
    resize1 algo the reference drew for that sample:
      plain kernels: branch ~ resize_prob {up, down, keep};
        down: X = H*U(range_down); up: X = H*U(range_up); keep: X = H
      997 nearest_aligned: scale' = choice([ceil(s/2), s]) -> X = H/scale'
      998 down_up: s' ~ U(ceil(s/2), s), a ~ U(du_min, s'), X = H*a/s'
      999 realistic kernel: exact LR size (r = 1)
    chain_cfg: for ops the reference places AFTER resize2 (noise2), the
    canvas is X2 = X1 * f2 with f2 drawn from resize2's own
    resize_prob/ranges relative to the current size (Scale_class:1734) —
    the ratios compose BEFORE the final clip, so a sub-LR X2 correctly
    yields no attenuation rather than double attenuation."""
    rr, r8 = jax.random.split(rng)
    r = _atten_ratio(rr, b, res_cfg, scale, res_types)
    if chain_cfg:
        r = r * _size_ratio(r8, b, chain_cfg, 1.0)
    return jnp.clip(1.0 / jnp.maximum(r, 1e-6), 0.0, 1.0)


def _atten_ratio(rng, b: int, res_cfg: dict, scale: int,
                 res_types: Sequence[int] = ()):
    """The per-sample canvas-size ratio r = X1 / LR (see _atten_factor)."""
    r1, r4, r5, r6, r7 = jax.random.split(rng, 5)
    r_plain = _size_ratio(r1, b, res_cfg, float(scale))
    algos = [t for t in res_types if isinstance(t, int)]
    cands = [r_plain] * max(
        len([t for t in algos if t not in (995, 996, 997, 998, 999)]), 1)
    half = -(-scale // 2)
    if any(t in (995, 997) for t in algos):
        coin = jax.random.uniform(r4, (b,)) < 0.5
        cands.append(jnp.where(coin, jnp.full((b,), scale / half),
                               jnp.ones((b,))))
    if any(t == 998 for t in algos):
        sp = jax.random.uniform(r5, (b,), minval=float(half),
                                maxval=float(scale))
        du_min = float(res_cfg.get("down_up_min", 0.5) or 0.5)
        a = du_min + jax.random.uniform(r7, (b,)) * (sp - du_min)
        cands.append(scale * a / sp)
    if any(t == 999 for t in algos):
        cands.append(jnp.ones((b,)))  # realistic kernel: exact LR size
    if len(cands) == 1:
        r = cands[0]
    else:
        choice = jax.random.randint(r6, (b,), 0, len(cands))
        stack = jnp.stack(cands, axis=1)
        onehot = jax.nn.one_hot(choice, len(cands))
        r = jnp.sum(stack * onehot, axis=1)
    return r


def _draw_att_pair(rng, b: int, att_cfg: dict):
    """ONE shared per-sample attenuation chain for the whole pipeline
    call: in the reference the SAME X1/X2 intermediate sizes apply to
    every op of a sample, so a hard-hit sample is hard-hit across
    blur2, noise and compression together — per-stage independent draws
    would average that out and compress the output diversity. Returns
    (v1, v2) column vectors: v1 = clip(LR/X1) for X1-canvas ops, v2 =
    clip(LR/X2) for post-resize2 ops."""
    r1k, f2k = jax.random.split(rng)
    r = _atten_ratio(r1k, b, att_cfg.get("res_cfg") or {},
                     int(att_cfg.get("scale", 4)),
                     att_cfg.get("res_types") or ())
    v1 = jnp.clip(1.0 / jnp.maximum(r, 1e-6), 0.0, 1.0)
    ch = att_cfg.get("chain_cfg2")
    if ch:
        r2 = r * _size_ratio(f2k, b, ch, 1.0)
        v2 = jnp.clip(1.0 / jnp.maximum(r2, 1e-6), 0.0, 1.0)
    else:
        v2 = v1
    return v1[:, None, None, None], v2[:, None, None, None]


def _att_wrap(fn: Callable, att_cfg: dict, square: bool = False,
              chain: bool = False) -> Callable:
    """Scale a spatial op's residual by the attenuation the reference's
    final LR snap applies when the op ran at an intermediate canvas X
    (_atten_factor). square=True for blur-family ops: a kernel shrunk by
    r = X/LR loses residual energy ~quadratically in its width, unlike
    noise whose amplitude scales ~linearly with the resample ratio.
    Uses the caller-provided shared per-call (v1, v2) pair when given
    (att kwarg, _draw_att_pair); falls back to an independent draw."""
    def wrapped(rng, x, att=None):
        r1, r2 = jax.random.split(rng)
        y = fn(r1, x)
        if att is not None:
            v = att[1] if chain else att[0]
        else:
            v = _atten_factor(r2, x.shape[0],
                              att_cfg.get("res_cfg") or {},
                              int(att_cfg.get("scale", 4)),
                              att_cfg.get("res_types") or (),
                              chain_cfg=att_cfg.get("chain_cfg")
                              if chain else None)[:, None, None, None]
        if square:
            v = v * v
        return x + v.astype(x.dtype) * (y - x)

    wrapped._wants_att = True
    return wrapped


def _blur3(x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 binomial ([1,2,1]/4 separable) low-pass, SAME pad."""
    c = x.shape[-1]
    k1 = jnp.asarray([0.25, 0.5, 0.25], x.dtype)
    kh = jnp.tile(k1.reshape(3, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k1.reshape(1, 3, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, (3, 1, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME", (1, 1),
                                     (1, 1), dn, feature_group_count=c)
    dn2 = jax.lax.conv_dimension_numbers(x.shape, (1, 3, 1, c),
                                         ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(y, kw, (1, 1), "SAME", (1, 1),
                                        (1, 1), dn2,
                                        feature_group_count=c)


def _noise_stage(types: Sequence[str], cfgs: Dict[str, dict],
                 prob: float, weights=None,
                 atten: Optional[dict] = None, cycle: int = 1) -> Callable:
    """Per-sample choice among noise types (one-hot mixture, optionally
    weighted — ref get_weighted_choice:1417). Each type applies with its
    config `p` (ref transforms default 0.5). atten: {res_cfg, scale} —
    scales each op's residual per sample by the attenuation the
    reference's final downscale would apply (see _atten_factor)."""
    raw = [str(t).lower() for t in types] or ["gaussian"]
    types = [t if (t in _DEVICE_NOISE or "dither" in t or "quantize" in t)
             else "gaussian" for t in raw]

    def make_op(t: str) -> Callable:
        cfg = _cfg_for(cfgs, t, cycle)
        if t == "gaussian":
            var = cfg.get("var_limit") or [1.0, 25.0]
            # ref default sigma_calc='sig': var_limit IS the sigma range
            # (0-255 units); 'var' takes sqrt (transforms.py:1589-1596)
            if str(cfg.get("sigma_calc", "sig")) == "var":
                sig = (math.sqrt(float(var[0])), math.sqrt(float(var[1])))
            else:
                sig = (float(var[0]), float(var[1]))
            mc = 0.34 if cfg.get("multi", True) else 0.0
            return partial(D.gaussian_noise, sigma_range=sig,
                           gray_prob=1.0 - float(cfg.get("prob_color",
                                                          0.5)),
                           mc_prob=mc)
        if t in ("jpeg", "webp"):
            qr = (float(cfg.get("min_quality", 30)),
                  float(cfg.get("max_quality", 95)))
            # webp: REAL codec via host callback by default (VP8 4x4
            # transform + loop filter != 8x8 DCT artifacts; the DCT
            # approximation only stands in for jpeg). Opt out with
            # TRAINNER_DEVICE_WEBP=approx (pure-device graph, e.g. on
            # multi-host meshes where the callback gather costs). Falls
            # back to the approximation when the backend cannot run
            # host callbacks at all (the axon PJRT relay).
            import os as _os

            if (t == "webp" and _os.environ.get(
                    "TRAINNER_DEVICE_WEBP", "exact") != "approx"):
                if D.host_callbacks_supported():
                    return partial(D.codec_compress_host, fmt="webp",
                                   quality_range=qr)
                import logging

                logging.getLogger("base").warning(
                    "backend does not support host callbacks; "
                    "`compression: webp` falls back to the DCT "
                    "approximation (real-codec path needs pure_callback)")
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
        if t in ("quantize", "som_quantize"):
            # SOM lattice quantization (ref RandomQuantizeSOM/minisom)
            n = int(cfg.get("num_colors", 32))
            return partial(D.som_quantize, n_colors=n)
        if "quantize" in t:  # km_quantize
            n = int(cfg.get("num_colors", 32))
            return partial(D.kmeans_quantize, n_colors=n)
        if t == "clahe":
            cl = cfg.get("clip_limit", 4.0)
            cl_hi = float(cl[1] if isinstance(cl, (list, tuple)) else cl)
            gs = cfg.get("tile_grid_size") or (8, 8)

            def clahe_op(rng, x, cl_hi=cl_hi, gs=tuple(gs)):
                r1, _ = jax.random.split(rng)
                u = jax.random.uniform(r1, ())
                clip = 1.0 + u * (cl_hi - 1.0)
                if x.shape[1] % gs[0] or x.shape[2] % gs[1]:
                    return x  # grid must divide the image
                return D.clahe_batch(x, clip, grid=gs)

            return clahe_op
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
            return partial(
                D.camera_noise,
                gain_range=tuple(map(float, cfg.get("rg_range")
                                     or (1.2, 2.4))),
                bg_range=tuple(map(float, cfg.get("bg_range")
                                   or (1.2, 2.4))),
                xyz_arr=str(cfg.get("xyz_arr", "D50")))
        if t == "superpixels":
            from ..ops.superpixel import superpixel_structure

            n_seg = int(cfg.get("n_segments", 200))
            return lambda rng, x: superpixel_structure(
                rng, x, n_segments=n_seg)
        return partial(D.gaussian_noise)

    ops = [make_op(t) for t in types]
    # per-op application probability from its config (ref RandomBase
    # default p=0.5; presets set explicit p, e.g. jpeg 0.75, camera 0.25)
    op_ps = [float(_cfg_for(cfgs, t, cycle).get("p", 0.5))
             for t in types]

    def fn(rng, x, att=None):
        b = x.shape[0]
        rngs = jax.random.split(rng, len(ops) + 2)
        v = None
        if atten is not None:
            if att is not None:
                # shared per-call chain (see _draw_att_pair)
                v = att[1] if atten.get("chain_cfg") else att[0]
            else:
                r_v = jax.random.fold_in(rng, 11)
                v = _atten_factor(r_v, b, atten.get("res_cfg") or {},
                                  int(atten.get("scale", 4)),
                                  atten.get("res_types") or (),
                                  chain_cfg=atten.get("chain_cfg"))[
                    :, None, None, None]

        def gated(op, r, p):
            y = op(r, x)
            if y.shape == x.shape and v is not None:
                # amplitude: residual scales by the calibrated v.
                # SHAPE: the reference's final AA downscale also
                # CORRELATES the injected noise (the antialiasing
                # kernel's support is ~4 LR px regardless of the ratio,
                # so white noise at X arrives low-passed on the LR
                # grid); blend toward a 3x3 binomial blur with strength
                # 1-v, renormalized per sample so the calibrated
                # residual power is preserved
                res = (y - x).astype(jnp.float32)
                c = jnp.clip(1.0 - v, 0.0, 1.0)
                res_c = res + c * (_blur3(res) - res)
                s0 = jnp.sqrt(jnp.mean(res * res, axis=(1, 2, 3),
                                       keepdims=True) + 1e-12)
                s1 = jnp.sqrt(jnp.mean(res_c * res_c, axis=(1, 2, 3),
                                       keepdims=True) + 1e-12)
                y = x + (v * res_c * (s0 / s1)).astype(x.dtype)
            if p >= 1.0 or y.shape != x.shape:
                return y
            r_p = jax.random.fold_in(r, 7)
            miss = jax.random.uniform(r_p, (b, 1, 1, 1)) >= p
            return jnp.where(miss, x, y)

        if len(ops) == 1:
            return gated(ops[0], rngs[0], op_ps[0])
        cands = jnp.stack([gated(op, r, p) for op, r, p
                           in zip(ops, rngs[:-2], op_ps)], axis=1)
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

    fn._wants_att = atten is not None
    return _with_prob(fn, prob)


def _size_ratio(rng, b: int, res_cfg: dict, in_over_out: float):
    """Per-sample UNCLIPPED intermediate-size ratio r = X / out_size for
    the plain-kernel branch of adj_scale_config (ref augmentations.py:58):
    branch ~ resize_prob {up, down, keep}; X = in_size * U(range), so
    r = in_over_out * sc_fact. in_over_out: input/output size ratio of
    the stage (scale for the HR->LR stage, 1 for the LR-canvas resize2).
    Unlike _atten_factor (which clips to <=1 for residual attenuation),
    sub-output sizes (r < 1, e.g. Real-ESRGAN's resize_range_down
    reaching 0.15 < 1/scale) keep their true ratio."""
    r1, r2, r3 = jax.random.split(rng, 3)
    probs = dict(res_cfg.get("resize_prob") or {"down": 1.0})
    p_up = float(probs.get("up", 0.0))
    p_down = float(probs.get("down", 1.0))
    p_keep = float(probs.get("keep", 0.0))
    tot = max(p_up + p_down + p_keep, 1e-8)
    rd = res_cfg.get("resize_range_down") or [
        1.0 / max(in_over_out, 2.0), 2.0 / max(in_over_out, 2.0)]
    ru = res_cfg.get("resize_range_up") or [1.0, 1.5]
    sc_d = jax.random.uniform(r1, (b,), minval=float(rd[0]),
                              maxval=float(rd[1]))
    sc_u = jax.random.uniform(r2, (b,), minval=float(ru[0]),
                              maxval=float(ru[1]))
    u = jax.random.uniform(r3, (b,)) * tot
    r = jnp.where(u < p_down, in_over_out * sc_d,
                  jnp.where(u < p_down + p_up, in_over_out * sc_u,
                            jnp.full((b,), in_over_out)))
    return r


def _q8(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 wire between stages: the reference's transform chain passes
    uint8 cv2 images transform-to-transform (augmennt transforms consume
    and emit uint8), so every stage output rounds to 1/255 steps — this
    sets the same ~48 dB PSNR ceiling and noise floor the reference has."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) * (1.0 / 255.0)


def _resize_stage(types: Sequence[int], out_hw_fn, prob: float = 1.0,
                  down_up_types: Optional[Sequence[int]] = None,
                  weights=None, res_cfg: Optional[dict] = None,
                  scale: int = 4, in_over_out: float = None,
                  chain_cfg: Optional[dict] = None,
                  post_cfg: Optional[dict] = None) -> Callable:
    """Per-sample weighted choice among resize types (ref aug_pipeline
    resize via Scale_class/adj_scale_config). Special codes (reference
    ints): 997 nearest_aligned, 998 down_up, 999 realistic kernels
    (handled by the caller via the kernel bank). Candidates are computed
    at the static target size and mixed one-hot.

    res_cfg: when given (plain path), the reference's per-sample random
    INTERMEDIATE size X (adj_scale_config:58 — resize_prob branch +
    resize_range_*) is emulated with bucketed double resampling: X/out
    snaps to the log-nearest of a bucket set spanning BOTH sub-output
    sizes (Real-ESRGAN's range_down reaches 0.15*HR < LR — real
    information loss) and super-output sizes, each bucket resizes
    in -> X -> out with per-sample algos, and the bucket is chosen per
    sample from the reference's own branch distribution — real
    double-resample softness/aliasing diversity within the batch, with
    static shapes. The same machinery applies to the LR-canvas resize2
    stage (in_over_out=1): the reference's second-stage resample
    (Scale_class at 1730) is a genuine down(or up)-then-snap there, not
    a no-op."""
    algos = [t for t in types if isinstance(t, int)]
    down_up_mode = any(t == 998 for t in algos)
    aligned = any(t in (995, 997) for t in algos)
    plain = [t for t in algos if t not in (995, 996, 997, 998, 999)]
    n_special = int(down_up_mode) + int(aligned)
    if not plain and not n_special:
        plain = [777]
    du_algos = [t for t in (down_up_types or (773, 777))
                if isinstance(t, int)] or [773, 777]
    if in_over_out is None:
        in_over_out = float(scale)
    # bucket factors X/out (1.0 = the direct single resample): sub-out
    # buckets model X below the target size, super-out above it.
    # Sizes well above the output (X >= ~0.75*input for the HR stage,
    # X >= output for the LR-canvas stage) lose nothing to the final
    # snap — those draws map to the direct candidate.
    if in_over_out > 1.0:
        # the reference resamples at BOTH stages for any non-keep draw
        # (adj_scale_config only yields scale=1 on the keep branch), so
        # the single-resample direct candidate maps ONLY to r ~ in/out
        # (X ~ input size, i.e. keep); down-draws near the input get a
        # genuine double resample via the 0.75*io bucket and up-draws
        # via the 1.125*io one (X above the input size)
        _BUCKETS = (0.6, 0.8, 1.25, 1.5, 2.0, 0.75 * in_over_out,
                    1.125 * in_over_out)
    else:
        # LR-canvas stage: in the reference the stage-2 resample runs on
        # the HIGH-RES canvas (X1 -> X2, both typically > LR) and only
        # the final X2 -> LR snap loses resolution — so X2 >= LR maps to
        # the direct (single-final-resample) slot; genuine extra loss
        # exists only for sub-LR X2, plus a mild 1.2 softening bucket
        _BUCKETS = (0.5, 0.7, 0.85, 1.2)

    def _plain_cand(rng, x, out_hw):
        rd, rv, rc, *rbs = jax.random.split(rng, 6 + 2 * len(_BUCKETS))
        direct = D.random_resize(rd, x, out_hw, plain)
        if res_cfg is None:
            return direct
        b = x.shape[0]
        ratio = _size_ratio(rv, b, res_cfg, in_over_out)
        if chain_cfg is not None:
            # LR-canvas stage2: the reference's factor applies to the
            # CURRENT (stage-1 intermediate) size X1, not to LR — the
            # effective X2/LR is the product of an X1/LR draw and this
            # stage's factor (ref Scale_class:1734 composing :58)
            ratio = ratio * _size_ratio(
                rc, b, chain_cfg, float(chain_cfg.get("_scale", scale)))
        # slot 0 (the direct single resample) sits at the KEEP factor:
        # X ~ input size, where the reference's stage is a no-op and
        # only the final snap resamples. LR-canvas stage: everything
        # from ~1.35 up folds into direct (see _BUCKETS comment).
        if in_over_out <= 1.0:
            ratio = jnp.where(ratio >= 1.35, jnp.ones_like(ratio), ratio)
        facs = jnp.asarray((max(in_over_out, 1.0),) + _BUCKETS)
        idx = jnp.argmin(
            jnp.abs(jnp.log(ratio[:, None]) - jnp.log(facs[None, :])),
            axis=1)
        if post_cfg is not None and in_over_out > 1.0:
            # resize2's genuine high-canvas downscale (X1 -> X2 with an
            # independent kernel; ~no resolution cost, real kernel
            # mixing) still applies after stage 1 in the reference.
            # With resize2's own down probability: keep-draws (idx 0,
            # which would otherwise be a single clean resample) reroute
            # through the 0.75*io double-resample bucket, and up-draws
            # (last bucket) through the TRIPLE up-mid-down composite
            # (slot len+1) — so a pure single-kernel near-exact chain
            # only survives keep+keep, as in the reference
            pr = dict(post_cfg.get("resize_prob") or {"down": 1.0})
            p_dn = float(pr.get("down", 1.0)) / max(
                sum(float(v) for v in pr.values()), 1e-8)
            coin = jax.random.uniform(rc, (b,)) < p_dn
            idx = jnp.where((idx == 0) & coin, len(_BUCKETS) - 1, idx)
            idx = jnp.where((idx == len(_BUCKETS)) & coin,
                            len(_BUCKETS) + 1, idx)
        def _mid(o, f):
            # off-aligned intermediate: the reference resizes through
            # RANDOM fractional sizes, so integer-ratio phase alignment
            # (mid % out == 0) that makes a double resample artificially
            # clean never happens — nudge such sizes off the lattice
            m = max(min(int(round(o * f)), 8 * o), 4)
            if m % o == 0 or o % max(m, 1) == 0:
                m += max(o // 10, 1)
            return m

        cands_b = [direct]
        for k, f in enumerate(_BUCKETS):
            mid_hw = (_mid(out_hw[0], f), _mid(out_hw[1], f))
            if mid_hw == out_hw:
                mid_hw = (out_hw[0] + (1 if f > 1 else -1),
                          max(out_hw[1] + (1 if f > 1 else -1), 4))
            y = D.random_resize(rbs[2 * k], x, mid_hw, plain)
            cands_b.append(D.random_resize(rbs[2 * k + 1], y, out_hw,
                                           plain))
        if post_cfg is not None and in_over_out > 1.0:
            # triple up-mid-down composite for rerouted up-draws
            up_hw = (_mid(out_hw[0], 1.125 * in_over_out),
                     _mid(out_hw[1], 1.125 * in_over_out))
            dn_hw = (_mid(out_hw[0], 0.75 * in_over_out),
                     _mid(out_hw[1], 0.75 * in_over_out))
            k3 = 2 * len(_BUCKETS)
            y = D.random_resize(rbs[k3], x, up_hw, plain)
            y = D.random_resize(rbs[k3 + 1], y, dn_hw, plain)
            cands_b.append(D.random_resize(rbs[k3 + 2], y, out_hw,
                                           plain))
        stack = jnp.stack(cands_b, axis=1)
        onehot = jax.nn.one_hot(idx, len(cands_b),
                                dtype=x.dtype)[:, :, None, None, None]
        return jnp.sum(stack * onehot, axis=1)

    def fn(rng, x):
        out_hw = out_hw_fn(x.shape)
        r1, r2, r2b, r3 = jax.random.split(rng, 4)
        cands: List[jnp.ndarray] = []
        if plain:
            cands.append(_plain_cand(r1, x, out_hw))
        if aligned:
            s = x.shape[1] // out_hw[0]
            if s > 1 and x.shape[1] % out_hw[0] == 0:
                cands.append(D.nearest_aligned_downscale(x, s))
            else:
                cands.append(D.random_resize(r1, x, out_hw, [0]))
        if down_up_mode:
            if out_hw == x.shape[1:3]:
                cands.append(D.down_up(r2, x, algos=du_algos))
            else:
                # net down_up = milder downscale with a du algo followed
                # by an extra resample (ref adj_scale_config 998 path:
                # scale' = U(s/2, s), then final_scale snaps to target)
                y = D.random_resize(r2, x, out_hw, du_algos)
                cands.append(D.down_up(r2b, y, algos=du_algos,
                                       scale_range=(1.0, 2.0)))
        if len(cands) == 1:
            return cands[0]
        b = x.shape[0]
        # choice weights: plain candidate carries len(plain) slots' worth
        w = [float(len(plain))] if plain else []
        w += [1.0] * (len(cands) - len(w))
        pw = jnp.asarray(w, jnp.float32)
        pw = pw / pw.sum()
        choice = jax.random.categorical(
            r3, jnp.log(pw)[None].repeat(b, 0))
        stack = jnp.stack(cands, axis=1)
        onehot = jax.nn.one_hot(choice, len(cands),
                                dtype=x.dtype)[:, :, None, None, None]
        return jnp.sum(stack * onehot, axis=1)

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
        # shared attenuation config for LR-phase ops in the per-sample
        # shuffle path (see _build_persample.att_blend / _atten_factor)
        self._att_cfg = {"res_cfg": cfgs.get("resize") or {},
                         "scale": self.scale,
                         "res_types": (p.get("resize") or {}
                                       ).get("types") or (),
                         "chain_cfg2": (cfgs.get("resize2")
                                        if "resize2" in p else None)} \
            if "resize" in p else None
        stages: List[Tuple[str, Callable]] = []
        for name in self.ORDER:
            if name not in p:
                continue
            conf = p[name]
            cyc = 2 if name.endswith("2") else 1
            if name in ("blur", "blur2"):
                bfn = _blur_stage(conf["types"], cfgs, conf["prob"],
                                  weights=conf.get("weights"), cycle=cyc)
                if name == "blur2" and self._att_cfg is not None:
                    # blur2 runs at the X1 canvas in the reference
                    # (canonical order: ... blur2 -> resize2 -> noise2);
                    # the final LR snap shrinks its kernel by X1/LR.
                    # linear v calibrated empirically: ref resrgan
                    # blur2-only 33.4 dB sits between our no-att 29.9
                    # and v^2 36.4 (the snap's own kernel re-blurs some
                    # of what the shrink removes)
                    stages.append((name, {
                        "no": bfn,
                        "att": _att_wrap(bfn, self._att_cfg,
                                         square=False)}))
                else:
                    stages.append((name, bfn))
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
                elif name in ("noise", "noise2", "compression") \
                        and "resize" in p:
                    # two variants: when the shuffled order puts this
                    # stage AFTER the in-pipeline resize, the reference
                    # injects noise at an intermediate size in (LR, 2*LR]
                    # and the final downscale attenuates it (~U(0.5, 1));
                    # before the resize, the real downscale does the
                    # attenuation naturally (see _noise_stage)
                    att_cfg = dict(self._att_cfg or {
                        "res_cfg": cfgs.get("resize") or {},
                        "scale": self.scale,
                        "res_types": (p.get("resize") or {}
                                      ).get("types") or ()})
                    if name == "noise2" and "resize2" in p:
                        # noise2 follows resize2 in the canonical order:
                        # its canvas is X2 = X1 * f2 (ratios compose in
                        # _atten_factor before the clip)
                        att_cfg["chain_cfg"] = cfgs.get("resize2") or {}
                    stages.append((name, {
                        "no": _noise_stage(types, cfgs, conf["prob"],
                                           weights=conf.get("weights"),
                                           cycle=cyc),
                        "att": _noise_stage(types, cfgs, conf["prob"],
                                            weights=conf.get("weights"),
                                            atten=att_cfg, cycle=cyc)}))
                else:
                    stages.append((name, _noise_stage(
                        types, cfgs, conf["prob"],
                        weights=conf.get("weights"), cycle=cyc)))
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
                        conf["types"], out_fn, conf["prob"],
                        down_up_types=dataset_opt.get("down_up_types"),
                        weights=conf.get("weights"),
                        # bucketed intermediate-size emulation only when
                        # an aug_config exists for the stage — without
                        # one the reference never calls adj_scale_config
                        # (get_res_confs:1490 add_conf) and the resize
                        # is a plain direct downscale
                        res_cfg=cfgs.get(name),
                        scale=self.scale,
                        in_over_out=(float(self.scale)
                                     if name == "resize" else 1.0),
                        chain_cfg=(dict(cfgs.get("resize") or {},
                                        _scale=self.scale)
                                   if name == "resize2" else None),
                        post_cfg=(cfgs.get("resize2")
                                  if name == "resize" and
                                  "resize2" in p else None))))
            elif name == "auto_levels":
                prob = conf["prob"]
                stages.append((name, _with_prob(
                    lambda rng, x: D.auto_levels(x), prob)))
            elif name == "unsharp":
                ufn = _with_prob(D.unsharp_mask, conf["prob"])
                stages.append((name, ufn if self._att_cfg is None else {
                    "no": ufn,
                    "att": _att_wrap(ufn, self._att_cfg, square=True)}))
            elif name == "fringes":
                ffn = _with_prob(D.fringes, conf["prob"])
                stages.append((name, ffn if self._att_cfg is None else {
                    "no": ffn,
                    "att": _att_wrap(ffn, self._att_cfg, square=True)}))
        self.stages = stages

        # finals (ref aug_pipeline:1780-1786): [final_scale + final_blur]
        # and [final_compression] in per-sample random order (coin flip) —
        # realized branch-free by computing both orders and mixing
        resize_finals: List[Tuple[str, Callable]] = []
        comp_finals: List[Tuple[str, Callable]] = []
        if "final_scale" in p and kind == "lr":
            resize_finals.append(("final_scale", _resize_stage(
                p["final_scale"]["types"],
                lambda shape: (shape[1], shape[2]),
                weights=p["final_scale"].get("weights"))))
            if "final_blur" in p:
                fb = p["final_blur"]
                types = [t for t in fb["types"] if isinstance(t, str)] \
                    or ["sinc"]
                resize_finals.append(("final_blur", _blur_stage(
                    types, cfgs, fb["prob"])))
        if "final_compression" in p:
            fc_types = [t for t in p["final_compression"]["types"]
                        if isinstance(t, str)] or ["jpeg"]
            comp_finals.append(("final_compression", _noise_stage(
                fc_types, cfgs, p["final_compression"]["prob"])))
        self.finals = resize_finals + comp_finals
        self._resize_finals = resize_finals
        self._comp_finals = comp_finals
        self._jitted: Dict[Any, Callable] = {}

    @property
    def is_noop(self) -> bool:
        return not self.stages and not self.finals

    def _build_persample(self) -> Callable:
        """ONE jitted program with TRUE per-sample shuffle semantics
        (ref aug_pipeline:1748 random.shuffle(transform_list) runs per
        sample inside the DataLoader worker).

        A uniform random permutation of [stages..., resize] is drawn per
        sample as iid uniform scores; stages scoring below the resize's
        score form that sample's HR phase (run at HR canvas), the rest
        its LR phase — exactly the uniform-permutation split. Each phase
        executes as `m` slot steps: at slot j every stage's candidate is
        computed and each sample keeps the candidate of ITS stage at
        that slot (identity once its phase is exhausted). Shapes stay
        static, one program compiles (vs the 8 order-specializations of
        the per-batch approximation this replaces).

        Noise-family stages use their attenuated variant in the LR
        phase (post-resize: the reference injects them at an
        intermediate size and the final snap attenuates, _atten_factor)
        and the plain variant in the HR phase (the real downscale
        attenuates naturally).

        Cost note: every slot evaluates every stage's candidate, so the
        per-step device cost grows QUADRATICALLY with the stage count
        (2*m^2 stage executions per batch) versus the per-batch order
        approximation — inherent to the static-shape slot-select
        design. bench.py reports this path separately as
        e2e_shuffled_iters_per_sec.
        """
        boundary = next((i for i, (n, _) in enumerate(self.stages)
                         if n == "resize"), None)
        perm = [(n, fn) for i, (n, fn) in enumerate(self.stages)
                if i != boundary]
        resize_fn = self.stages[boundary][1] if boundary is not None \
            else None
        m = len(perm)
        res_f, comp_f = self._resize_finals, self._comp_finals
        att_cfg = getattr(self, "_att_cfg", None)

        def variant(name, fn, att: bool):
            # blur2/unsharp/fringes/noise-family carry their own
            # {no, att} dicts (built with stage-appropriate attenuation,
            # see __init__); only stage-1 blur needs an ad-hoc wrap when
            # the per-sample shuffle lands it in the LR phase
            if isinstance(fn, dict):
                return fn["att" if att else "no"]
            if att and att_cfg is not None and name == "blur":
                # linear attenuation, matching the blur2 calibration
                # (ref resrgan blur2-only 33.4 dB sits between no-att
                # 29.9 and v^2 36.4 — the snap's own kernel re-blurs
                # part of what the shrink removes; see __init__)
                return _att_wrap(fn, att_cfg, square=False)
            return fn

        def phase_exec(rng, x, order, count, att: bool, att_pair=None):
            # order: (b, m) stage index per slot; count: (b,) phase size
            for j in range(m):
                rngs = jax.random.split(jax.random.fold_in(rng, j),
                                        m)
                cands = [vfn(r, x, att=att_pair)
                         if getattr(vfn, "_wants_att", False)
                         else vfn(r, x)
                         for (n, fn), r in zip(perm, rngs)
                         for vfn in (variant(n, fn, att),)]
                stack = jnp.stack([x] + cands, axis=1)
                idx = jnp.where(j < count, order[:, j] + 1, 0)
                x = _q8(jnp.take_along_axis(
                    stack, idx[:, None, None, None, None], axis=1
                )[:, 0])
            return x

        def seg(fns, rng, x):
            for _, fn in fns:
                rng, r = jax.random.split(rng)
                x = _q8(fn(r, x))
            return x

        def run(rng, x):
            from ..ops.blocks import wire_to_f01

            x = wire_to_f01(x)
            b = x.shape[0]
            r_perm, r_hr, r_res, r_lr, r_att, rng = jax.random.split(
                rng, 6)
            att_pair = _draw_att_pair(r_att, b, att_cfg) \
                if att_cfg is not None else None
            if m and resize_fn is not None:
                scores = jax.random.uniform(r_perm, (b, m + 1))
                hr_mask = scores[:, :m] < scores[:, m:]
                hr_sc = jnp.where(hr_mask, scores[:, :m], jnp.inf)
                lr_sc = jnp.where(hr_mask, jnp.inf, scores[:, :m])
                hr_order = jnp.argsort(hr_sc, axis=1)
                lr_order = jnp.argsort(lr_sc, axis=1)
                hr_count = hr_mask.sum(axis=1)
                lr_count = m - hr_count
                x = phase_exec(r_hr, x, hr_order, hr_count, att=False)
                x = _q8(resize_fn(r_res, x))
                x = phase_exec(r_lr, x, lr_order, lr_count, att=True,
                               att_pair=att_pair)
            elif m:
                # no size boundary: one uniform per-sample permutation
                scores = jax.random.uniform(r_perm, (b, m))
                order = jnp.argsort(scores, axis=1)
                x = phase_exec(r_hr, x, order,
                               jnp.full((b,), m), att=False)
            elif resize_fn is not None:
                x = _q8(resize_fn(r_res, x))
            if res_f and comp_f:
                rng, ra, rb, rc = jax.random.split(rng, 4)
                y_a = seg(res_f, ra, seg(comp_f, rb, x))
                y_b = seg(comp_f, rb, seg(res_f, ra, x))
                coin = jax.random.uniform(
                    rc, (x.shape[0], 1, 1, 1)) < 0.5
                x = jnp.where(coin, y_a, y_b)
            elif res_f or comp_f:
                rng, r = jax.random.split(rng)
                x = seg(res_f or comp_f, r, x)
            return _q8(x)

        return jax.jit(run)

    # ------------------------------------------------------------------
    # balanced-routing per-sample shuffle (round 5): m-fold cheaper than
    # the candidate-select path above
    # ------------------------------------------------------------------
    def _routing_plan(self, seed, b: int):
        """Host-side routing for `_build_routing`: per-sample uniform
        orders realized as rows of random Latin squares so every slot is
        COLUMN-BALANCED (each symbol appears exactly npad/k times per
        slot) — which is what lets the device program run each stage ONCE
        per slot on a static q-slice instead of evaluating every stage as
        a candidate for every slot (the 2*m^2 cost of _build_persample).

        Symbols 0..m-1 are the shuffled stages, symbol m (when a resize
        boundary exists) is the resize. A square's rows are
        sigma∘shift_g∘tau with sigma, tau fresh uniform permutations, so
        each SAMPLE's order is marginally uniform over all k!
        permutations (sigma uniform makes sigma∘anything uniform) —
        identical per-sample semantics to ref aug_pipeline:1748's
        random.shuffle. The deliberate difference is within-batch: the k
        samples sharing a square never collide on a slot (anti-correlated
        orders). Batches are re-randomized every call, so the training
        stream's per-sample degradation distribution is unchanged; the
        distribution gates in tests/test_pipeline.py hold on this path.

        Returns (idx, inv, act_a, act_b, npad):
          idx  (k, npad) int32 — gather order per slot: positions
               [i*q,(i+1)*q) hold the samples whose slot-j symbol is i
          inv  (k, npad) int32 — inverse permutation per slot
          act_a/act_b (k, npad) bool — gathered-order activity masks for
               the pre-resize (HR canvas) / post-resize (LR canvas) pass
        """
        m = len(self.stages) - (1 if any(n == "resize" for n, _ in
                                         self.stages) else 0)
        has_res = any(n == "resize" for n, _ in self.stages)
        k = m + (1 if has_res else 0)
        q = -(-b // k)
        npad = q * k
        rng = seed if isinstance(seed, np.random.Generator) \
            else np.random.default_rng(seed)
        perms = np.empty((npad, k), np.int64)
        for sq in range(q):
            sigma = rng.permutation(k)
            tau = rng.permutation(k)
            g = np.arange(k)
            perms[sq * k:(sq + 1) * k] = sigma[(g[:, None] + tau[None, :])
                                               % k]
        perms = perms[rng.permutation(npad)]
        if has_res:
            resize_pos = np.argmax(perms == m, axis=1)
        else:
            resize_pos = np.full(npad, k, np.int64)  # all pre-"resize"
        idx = np.empty((k, npad), np.int32)
        inv = np.empty((k, npad), np.int32)
        for j in range(k):
            order = np.argsort(perms[:, j], kind="stable")
            idx[j] = order
            inv[j, order] = np.arange(npad, dtype=np.int32)
        js = np.arange(k)[:, None]
        act_a = resize_pos[idx] > js
        act_b = resize_pos[idx] < js
        return idx, inv, act_a, act_b, npad

    def _build_routing(self) -> Callable:
        """Balanced-routing realization of the per-sample shuffle: same
        per-sample order distribution as `_build_persample` (see
        `_routing_plan`), at ~m-fold less device compute — each slot runs
        each stage once on the q samples routed to it instead of running
        every stage on every sample as a discarded candidate.

        Device cost per batch: 2 passes x k slots x m stages on q-slices
        = 2*m full-batch stage executions (vs 2*m^2 for candidate-select;
        m=5 for the bsrgan preset). Gathers/scatters between slots move
        2 batch copies/slot — noise next to any conv stage."""
        boundary = next((i for i, (n, _) in enumerate(self.stages)
                         if n == "resize"), None)
        perm = [(n, fn) for i, (n, fn) in enumerate(self.stages)
                if i != boundary]
        resize_fn = self.stages[boundary][1] if boundary is not None \
            else None
        m = len(perm)
        k = m + (1 if resize_fn is not None else 0)
        res_f, comp_f = self._resize_finals, self._comp_finals
        att_cfg = getattr(self, "_att_cfg", None)

        def variant(name, fn, att: bool):
            if isinstance(fn, dict):
                return fn["att" if att else "no"]
            if att and att_cfg is not None and name == "blur":
                return _att_wrap(fn, att_cfg, square=False)
            return fn

        def run_pass(rng, x, idx, inv, act, att: bool, att_pair):
            q = x.shape[0] // k
            for j in range(k):
                xg = x[idx[j]]
                ag = None if att_pair is None else tuple(
                    a[idx[j]] for a in att_pair)
                rj = jax.random.fold_in(rng, j)
                parts = []
                for i, (n, fn) in enumerate(perm):
                    vfn = variant(n, fn, att)
                    r = jax.random.fold_in(rj, i)
                    seg = xg[i * q:(i + 1) * q]
                    if getattr(vfn, "_wants_att", False):
                        a_seg = None if ag is None else tuple(
                            a[i * q:(i + 1) * q] for a in ag)
                        y = vfn(r, seg, att=a_seg)
                    else:
                        y = vfn(r, seg)
                    keep = act[j, i * q:(i + 1) * q]
                    parts.append(jnp.where(keep[:, None, None, None],
                                           _q8(y), seg))
                if resize_fn is not None:
                    parts.append(xg[m * q:])  # resize-symbol group idles
                x = jnp.concatenate(parts, axis=0)[inv[j]]
            return x

        def run(rng, x, idx, inv, act_a, act_b):
            from ..ops.blocks import wire_to_f01

            x = wire_to_f01(x)
            b = x.shape[0]
            npad = idx.shape[1]
            if npad > b:
                x = jnp.concatenate([x, x[: npad - b]], axis=0)
            x = _q8(x)  # match _build_persample's slot-0 identity q8
            r_a, r_res, r_b, r_att, rng = jax.random.split(rng, 5)
            att_pair = _draw_att_pair(r_att, npad, att_cfg) \
                if att_cfg is not None else None
            x = run_pass(r_a, x, idx, inv, act_a, att=False,
                         att_pair=None)
            if resize_fn is not None:
                x = _q8(resize_fn(r_res, x))
                x = run_pass(r_b, x, idx, inv, act_b, att=True,
                             att_pair=att_pair)
            x = x[:b]

            def seg(fns, r, xx):
                for _, fn in fns:
                    r, rr = jax.random.split(r)
                    xx = _q8(fn(rr, xx))
                return xx

            if res_f and comp_f:
                rng, ra, rb, rc = jax.random.split(rng, 4)
                y_a = seg(res_f, ra, seg(comp_f, rb, x))
                y_b = seg(comp_f, rb, seg(res_f, ra, x))
                coin = jax.random.uniform(
                    rc, (x.shape[0], 1, 1, 1)) < 0.5
                x = jnp.where(coin, y_a, y_b)
            elif res_f or comp_f:
                rng, r = jax.random.split(rng)
                x = seg(res_f or comp_f, r, x)
            return _q8(x)

        return jax.jit(run)

    def _build(self, order: Tuple[int, ...]) -> Callable:
        ordered = [self.stages[i] for i in order]
        names = [n for n, _ in ordered]
        res_idx = names.index("resize") if "resize" in names else -1
        stages = []
        for i, (n, fn) in enumerate(ordered):
            if isinstance(fn, dict):
                fn = fn["att"] if (res_idx >= 0 and i > res_idx) \
                    else fn["no"]
            stages.append((n, fn))
        res_f, comp_f = self._resize_finals, self._comp_finals
        att_cfg = getattr(self, "_att_cfg", None)

        def seg(fns, rng, x):
            for _, fn in fns:
                rng, r = jax.random.split(rng)
                x = _q8(fn(r, x))
            return x

        def run(rng, x):
            from ..ops.blocks import wire_to_f01

            x = wire_to_f01(x)
            att = None
            if att_cfg is not None:
                rng, ra = jax.random.split(rng)
                att = _draw_att_pair(ra, x.shape[0], att_cfg)
            for _, fn in stages:
                rng, r = jax.random.split(rng)
                x = _q8(fn(r, x, att=att)
                        if getattr(fn, "_wants_att", False) else fn(r, x))
            if res_f and comp_f:
                # per-sample coin: comp-then-resize vs resize-then-comp
                rng, ra, rb, rc = jax.random.split(rng, 4)
                y_a = seg(res_f, ra, seg(comp_f, rb, x))
                y_b = seg(comp_f, rb, seg(res_f, ra, x))
                coin = jax.random.uniform(
                    rc, (x.shape[0], 1, 1, 1)) < 0.5
                x = jnp.where(coin, y_a, y_b)
            elif res_f or comp_f:
                rng, r = jax.random.split(rng)
                x = seg(res_f or comp_f, r, x)
            return _q8(x)

        return jax.jit(run)

    def __call__(self, rng: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
        if self.is_noop:
            return images
        n = len(self.stages)
        if self.shuffle and n > 1:
            # TRUE per-sample shuffle (ref aug_pipeline:1748 shuffles per
            # sample). Default: balanced-routing program (~m-fold less
            # device compute, identical per-sample marginals — see
            # _routing_plan); TRAINNER_SHUFFLE_ROUTING=0 selects the
            # candidate-select program (bit-compatible with the round-4
            # graphs; exact iid within-batch joints).
            if os.environ.get("TRAINNER_SHUFFLE_ROUTING", "1") != "0":
                if "routing" not in self._jitted:
                    self._jitted["routing"] = self._build_routing()
                    # host-side plan stream, independent of the device
                    # key: reading the key (key_data) would force a
                    # device->host sync per batch — a full relay
                    # round-trip (~25 ms) on the axon tunnel, measured
                    # to erase the routing win (e2e 5.7 vs 8.0 it/s)
                    self._plan_rng = np.random.default_rng(
                        np.random.SeedSequence(0x5EED_0A71))
                idx, inv, act_a, act_b, _ = self._routing_plan(
                    self._plan_rng, int(images.shape[0]))
                return self._jitted["routing"](rng, images, idx, inv,
                                               act_a, act_b)
            if "persample" not in self._jitted:
                self._jitted["persample"] = self._build_persample()
            return self._jitted["persample"](rng, images)
        order = tuple(range(n))
        if order not in self._jitted:
            self._jitted[order] = self._build(order)
        return self._jitted[order](rng, images)
