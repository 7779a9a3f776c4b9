"""GeneratorLoss: option-driven composable loss stack.

Equivalent of ref codes/models/losses.py get_loss_fn:23 + GeneratorLoss:607:
builds a list of weighted losses from the same train-option keys
(pixel_criterion/pixel_weight, feature_*, cx_*, hfen_*, grad_type, tv_*,
ssim_*, lpips_*, spl_*, of_*, range_weight, fft_*, color_*, avg_*, ms_*,
fdpl_*), with the PPON/WBC selector filtering (ref :819) and
frequency-separation routing of losses to LF/HF components (ref :865).

The reference's AMP-unsafe "precise loss" split (ref :713-817) maps to: all
loss math here runs in f32 on f32 network outputs (bf16 is confined to the
network body), so every loss is "precise"; the flag is kept for parity in
logs only.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import basic, regularizers as reg
from .basic import get_pixel_criterion
from .ssim import ms_ssim_loss, ssim_loss

# selector tags used by PPON phases / WBC representations (ref :819)
_SELECTOR_TAGS = {
    "pix": ("pix",), "pixel": ("pix",),
    "fea": ("fea", "cx", "lpips"), "feature": ("fea", "cx", "lpips"),
    "cx": ("cx",), "contextual": ("cx",),
    "hfen": ("hfen",), "grad": ("grad",), "tv": ("tv",),
    "ssim": ("ssim",), "ms-ssim": ("ssim",),
    "pix-multiscale": ("ms",), "multiscale": ("ms",),
    "spl": ("spl",), "gpl": ("spl",), "cpl": ("spl",),
    "fft": ("fft",), "of": ("of",), "range": ("range",),
    "color": ("color",), "avg": ("avg",), "fdpl": ("fdpl",),
    "lpips": ("lpips",),
}


@dataclass
class LossEntry:
    name: str        # log key, e.g. 'l_g_pix'
    tag: str         # selector tag, e.g. 'pix'
    weight: float
    fn: Callable     # (sr, hr) -> scalar  (unweighted)
    needs_target: bool = True
    precise: bool = False  # ref's f32-outside-autocast set (parity marker)


def _dct_matrix(n: int = 8) -> np.ndarray:
    m = np.zeros((n, n), np.float64)
    for k in range(n):
        for i in range(n):
            m[k, i] = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m.astype(np.float32)


def fdpl_loss(x: jnp.ndarray, y: jnp.ndarray,
              weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Frequency-domain perceptual loss (ref get_loss_fn 'fdpl'): weighted
    squared error of 8x8 blockwise DCT coefficients. `weights` is the
    (8,8) per-frequency weighting (ref loads it from dataset stats; default
    uniform)."""
    d = _dct_matrix(8)
    dj = jnp.asarray(d)

    def block_dct(img):
        b, h, w, c = img.shape
        hh, ww = h // 8 * 8, w // 8 * 8
        img = img[:, :hh, :ww, :]
        img = img.reshape(b, hh // 8, 8, ww // 8, 8, c)
        return jnp.einsum("ku,bhuwvc,lv->bhkwlc", dj, img, dj,
                          preferred_element_type=jnp.float32)

    dx, dy = block_dct(x), block_dct(y)
    err = (dx - dy) ** 2
    if weights is not None:
        err = err * weights.reshape(1, 1, 8, 1, 8, 1)
    return jnp.mean(err)


def build_loss_list(train_opt: dict, allow_featnets: bool = True,
                    vgg_weights_path: Optional[str] = None,
                    device_dtype=jnp.bfloat16) -> List[LossEntry]:
    """Assemble the loss list from train options (ref GeneratorLoss
    __init__:607-817). allow_featnets=False disables VGG-based losses
    (ref PBR 1-channel maps, ref PBR_model.py:62)."""
    t = train_opt
    entries: List[LossEntry] = []

    def w(key, default=0.0):
        v = t.get(key)
        return float(v) if v is not None else default

    if t.get("pixel_weight") and t.get("pixel_criterion"):
        crit = get_pixel_criterion(t["pixel_criterion"])
        entries.append(LossEntry("l_g_pix", "pix", w("pixel_weight"), crit))

    if allow_featnets and t.get("feature_weight") and t.get("feature_criterion"):
        from .perceptual import PerceptualLoss

        layers = t.get("feature_layers") or {"conv5_4": 1.0}
        ploss = PerceptualLoss(
            layer_weights=layers, criterion=t["feature_criterion"],
            arch=str(t.get("feature_network", "vgg19")),
            weights_path=vgg_weights_path, dtype=device_dtype)
        entries.append(LossEntry("l_g_fea", "fea", w("feature_weight"),
                                 ploss, precise=False))

    if allow_featnets and t.get("cx_weight") and t.get("cx_type"):
        from .contextual import ContextualLoss

        layers = t.get("cx_vgg_layers") or {"conv_3_2": 1, "conv_4_2": 1}
        cx = ContextualLoss(layers_weights=dict(layers),
                            weights_path=vgg_weights_path,
                            dtype=device_dtype)
        entries.append(LossEntry("l_g_cx", "cx", w("cx_weight"), cx))

    if allow_featnets and t.get("lpips_weight"):
        from .lpips import LPIPSWeightsMissing, _missing_msg
        from .perceptual import LPIPS

        if vgg_weights_path is None:
            # loud by design: an lpips loss on random-init VGG features is
            # garbage (ref bundles lin weights + downloads the backbone)
            raise LPIPSWeightsMissing(_missing_msg("vgg"))
        lp = LPIPS(weights_path=vgg_weights_path)
        entries.append(LossEntry("l_g_lpips", "lpips", w("lpips_weight"), lp))

    if t.get("hfen_weight") and t.get("hfen_criterion"):
        crit = get_pixel_criterion(t["hfen_criterion"])
        entries.append(LossEntry(
            "l_g_HFEN", "hfen", w("hfen_weight"),
            partial(reg.hfen, criterion=crit), precise=True))

    if t.get("grad_weight") and t.get("grad_type"):
        # 'grad-2d-l1' | 'grad-4d-l2' etc.
        parts = str(t["grad_type"]).split("-")
        four_d = "4d" in parts
        crit_name = parts[-1] if parts[-1] not in ("2d", "4d", "grad") else "l1"
        crit = get_pixel_criterion(crit_name)
        entries.append(LossEntry(
            "l_g_grad", "grad", w("grad_weight"),
            partial(reg.gradient_loss, criterion=crit, four_d=four_d),
            precise=True))

    if t.get("tv_weight") and t.get("tv_type"):
        tv_type = "dtv" if str(t["tv_type"]).lower() in ("4d", "dtv") else "tv"
        p = int(t.get("tv_norm") or 1)
        entries.append(LossEntry(
            "l_g_tv", "tv", w("tv_weight"),
            lambda sr, hr=None, _t=tv_type, _p=p: reg.tv_loss(sr, _t, _p),
            needs_target=False))

    if t.get("ssim_weight") and t.get("ssim_type"):
        fn = ms_ssim_loss if "ms" in str(t["ssim_type"]).lower() else ssim_loss
        entries.append(LossEntry("l_g_ssim", "ssim", w("ssim_weight"), fn,
                                 precise=True))

    if t.get("spl_weight") and t.get("spl_type"):
        st = str(t["spl_type"]).lower()
        fn = {"gpl": reg.gp_loss, "cpl": reg.cp_loss}.get(st, reg.spl_loss)
        entries.append(LossEntry("l_g_spl", "spl", w("spl_weight"), fn))

    if t.get("of_weight") and t.get("of_type"):
        entries.append(LossEntry(
            "l_g_of", "of", w("of_weight"),
            lambda sr, hr=None: reg.overflow_loss(sr), needs_target=False,
            precise=True))

    if t.get("range_weight"):
        entries.append(LossEntry(
            "l_g_range", "range", w("range_weight"),
            lambda sr, hr=None: reg.range_loss(sr), needs_target=False,
            precise=True))

    if t.get("fft_weight") and t.get("fft_type"):
        entries.append(LossEntry("l_g_fft", "fft", w("fft_weight"),
                                 reg.fft_loss, precise=True))

    if t.get("color_weight") and t.get("color_criterion"):
        name = str(t["color_criterion"]).replace("color-", "")
        crit = get_pixel_criterion(name)
        entries.append(LossEntry(
            "l_g_color", "color", w("color_weight"),
            partial(reg.color_loss, criterion=crit), precise=True))

    if t.get("avg_weight") and t.get("avg_criterion"):
        name = str(t["avg_criterion"]).replace("avg-", "")
        crit = get_pixel_criterion(name)
        entries.append(LossEntry(
            "l_g_avg", "avg", w("avg_weight"),
            partial(reg.average_loss, criterion=crit), precise=True))

    if t.get("ms_weight") and t.get("ms_criterion"):
        name = str(t["ms_criterion"]).replace("multiscale-", "")
        base = get_pixel_criterion(name)
        entries.append(LossEntry(
            "l_g_ms", "ms", w("ms_weight"),
            partial(basic.multiscale_pixel, base=base)))

    if t.get("fdpl_weight") and t.get("fdpl_type"):
        weights = None
        if t.get("fdpl_weights_path"):
            weights = jnp.asarray(np.load(t["fdpl_weights_path"]))
        entries.append(LossEntry(
            "l_g_fdpl", "fdpl", w("fdpl_weight"),
            partial(fdpl_loss, weights=weights), precise=True))

    return entries


def filter_selectors(entries: List[LossEntry],
                     selectors: Optional[Sequence[str]]) -> List[LossEntry]:
    """PPON/WBC per-phase loss selection (ref GeneratorLoss:819)."""
    if not selectors:
        return entries
    allowed = set()
    for s in selectors:
        allowed.update(_SELECTOR_TAGS.get(str(s).lower(), (str(s).lower(),)))
    return [e for e in entries if e.tag in allowed]


class GeneratorLoss:
    """Callable loss stack: (sr, hr, selectors=None) -> (total, logs).

    Frequency separation (ref :865): when fs_low/fs_high callables are
    given, pixel-type losses see LF images and feature/gan-type ones the
    originals, mirroring the reference routing.
    """

    def __init__(self, opt: dict, allow_featnets: bool = True,
                 device_dtype=jnp.bfloat16):
        train_opt = opt.get("train") or {}
        vgg_path = (opt.get("path") or {}).get("vgg_weights")
        self.entries = build_loss_list(
            train_opt, allow_featnets=allow_featnets,
            vgg_weights_path=vgg_path, device_dtype=device_dtype)
        self.accumulations = max(
            1, int((train_opt.get("virtual_batch_size") or 1))) \
            if train_opt.get("virtual_batch_size") else 1
        self.fs_types = ("pix", "ms", "avg", "color", "tv")

    def __call__(self, sr: jnp.ndarray, hr: jnp.ndarray,
                 selectors: Optional[Sequence[str]] = None,
                 f_low: Optional[Callable] = None
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        entries = filter_selectors(self.entries, selectors)
        logs: Dict[str, jnp.ndarray] = {}
        total = jnp.zeros((), jnp.float32)
        sr32 = sr.astype(jnp.float32)
        hr32 = hr.astype(jnp.float32) if hr is not None else None
        lf_sr = f_low(sr32) if f_low is not None else sr32
        lf_hr = f_low(hr32) if (f_low is not None and hr32 is not None) else hr32
        for e in entries:
            a = lf_sr if (f_low is not None and e.tag in self.fs_types) else sr32
            b = lf_hr if (f_low is not None and e.tag in self.fs_types) else hr32
            val = e.fn(a) if not e.needs_target else e.fn(a, b)
            weighted = e.weight * val
            logs[e.name] = weighted
            total = total + weighted
        return total, logs
