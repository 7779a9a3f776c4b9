"""Batch augmentations (Mixture of Augmentations) on device tensors.

Equivalent of ref codes/dataops/batchaug.py (BatchAugment:7, BatchAug:46,
blend:111, rgb:133, mixup:145, cutmix:227, cutmixup:265, cutblur:302,
cutout:336). TPU-first: every op is a pure jnp function operating on NHWC
batches inside the jitted train step; the *choice* of augmentation is made
branch-free with ``lax.switch`` on a random index so a single compiled step
covers the whole mixture.

cutblur (ref :302) requires LR resized to HR size first — the trainer does
that (ref models/sr_model.py:213-216). cutout returns a mask that the
trainer re-applies to the output (ref apply_mask:33).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Pair = Tuple[jnp.ndarray, jnp.ndarray]  # (hr/img1, lr/img2) same size


def _rand_box(rng, h: int, w: int, cut_ratio) -> Tuple:
    """Random box (center-uniform) with size ratio ~ N(mu, sigma)."""
    r1, r2, r3 = jax.random.split(rng, 3)
    ratio = jnp.clip(cut_ratio[0] + cut_ratio[1] *
                     jax.random.normal(r1, ()), 0.1, 0.9)
    ch = (ratio * h).astype(jnp.int32)
    cw = (ratio * w).astype(jnp.int32)
    cy = jax.random.randint(r2, (), 0, h)
    cx = jax.random.randint(r3, (), 0, w)
    y0 = jnp.clip(cy - ch // 2, 0, h)
    x0 = jnp.clip(cx - cw // 2, 0, w)
    y1 = jnp.clip(cy + ch // 2, 0, h)
    x1 = jnp.clip(cx + cw // 2, 0, w)
    return y0, y1, x0, x1


def _box_mask(h: int, w: int, y0, y1, x0, x1) -> jnp.ndarray:
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return ((ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1))[None, :, :, None]


def blend(rng, img1, img2, alpha: float = 0.6) -> Pair:
    """Blend with a random solid color (ref :111)."""
    r1, r2 = jax.random.split(rng)
    c = jax.random.uniform(r1, (img1.shape[0], 1, 1, img1.shape[-1]),
                           minval=0.0, maxval=1.0)
    v = alpha + (1 - alpha) * jax.random.uniform(r2, ())
    return v * img1 + (1 - v) * c, v * img2 + (1 - v) * c


def rgb_perm(rng, img1, img2) -> Pair:
    """Random channel permutation, same for both (ref :133)."""
    perm = jax.random.permutation(rng, img1.shape[-1])
    return jnp.take(img1, perm, axis=-1), jnp.take(img2, perm, axis=-1)


def mixup(rng, img1, img2, alpha: float = 1.2) -> Pair:
    """Pairwise convex combination with shuffled batch (ref :145)."""
    r1, r2 = jax.random.split(rng)
    lam = jax.random.beta(r1, alpha, alpha)
    perm = jax.random.permutation(r2, img1.shape[0])
    return (lam * img1 + (1 - lam) * img1[perm],
            lam * img2 + (1 - lam) * img2[perm])


def cutmix(rng, img1, img2, alpha: float = 0.7) -> Pair:
    """Paste a random box from a shuffled sample (ref :227)."""
    r1, r2, r3 = jax.random.split(rng, 3)
    b, h, w, _ = img1.shape
    lam = jax.random.uniform(r1, (), minval=0.0, maxval=alpha)
    cut = jnp.sqrt(lam)
    y0, y1, x0, x1 = _rand_box(r2, h, w, (cut, 0.0))
    mask = _box_mask(h, w, y0, y1, x0, x1)
    perm = jax.random.permutation(r3, b)
    return (jnp.where(mask, img1[perm], img1),
            jnp.where(mask, img2[perm], img2))


def cutmixup(rng, img1, img2, mixup_alpha: float = 1.2,
             cutmix_alpha: float = 0.7) -> Pair:
    """cutmix box filled with mixup content (ref :265)."""
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    b, h, w, _ = img1.shape
    lam = jax.random.beta(r1, mixup_alpha, mixup_alpha)
    cut = jnp.sqrt(jax.random.uniform(r2, (), maxval=cutmix_alpha))
    y0, y1, x0, x1 = _rand_box(r3, h, w, (cut, 0.0))
    mask = _box_mask(h, w, y0, y1, x0, x1)
    perm = jax.random.permutation(r4, b)
    mix1 = lam * img1 + (1 - lam) * img1[perm]
    mix2 = lam * img2 + (1 - lam) * img2[perm]
    return jnp.where(mask, mix1, img1), jnp.where(mask, mix2, img2)


def cutblur(rng, hr, lr_up, alpha: float = 0.7) -> Tuple[jnp.ndarray,
                                                         jnp.ndarray]:
    """Swap a random box between HR and LR↑ (ref :302): the *input* gets HR
    content inside the box (or vice versa), teaching 'do nothing where
    already sharp'. Returns (hr, lr_up_augmented)."""
    r1, r2, r3 = jax.random.split(rng, 3)
    b, h, w, _ = hr.shape
    cut = jnp.sqrt(jax.random.uniform(r1, (), maxval=alpha))
    y0, y1, x0, x1 = _rand_box(r2, h, w, (cut, 0.0))
    mask = _box_mask(h, w, y0, y1, x0, x1)
    inside = jax.random.bernoulli(r3)
    lr_aug = jnp.where(inside, jnp.where(mask, hr, lr_up),
                       jnp.where(mask, lr_up, hr))
    return hr, lr_aug


def cutout(rng, img, alpha: float = 0.001) -> Tuple[jnp.ndarray,
                                                    jnp.ndarray]:
    """Random pixel dropout (ref :336). Returns (img*mask, mask); the
    trainer re-applies mask to SR output and target."""
    keep = 1.0 - alpha
    mask = jax.random.bernoulli(
        rng, keep, (img.shape[0], img.shape[1], img.shape[2], 1)
    ).astype(img.dtype)
    return img * mask, mask


_AUG_FNS = {
    "blend": blend,
    "rgb": rgb_perm,
    "mixup": mixup,
    "cutmix": cutmix,
    "cutmixup": cutmixup,
    "cutblur": cutblur,
    "cutout": None,  # special-cased (mask)
}


class BatchAugment:
    """Random-choice dispatcher (ref BatchAug:46) — branch-free lax.switch.

    opts: {'augs': [...names..., 'none'], 'probs': [...]} (ref mixopts /
    mixprob). Works on (hr, lr) pairs of EQUAL spatial size (trainer
    upsamples LR first when cutblur is in the mix, ref sr_model.py:213).
    """

    def __init__(self, augs: Sequence[str], probs: Optional[Sequence[float]]
                 = None, alphas: Optional[Dict[str, float]] = None):
        self.augs = [a.lower() for a in augs]
        for a in self.augs:
            if a != "none" and a not in _AUG_FNS:
                raise ValueError(f"unknown batch aug [{a}]")
        p = jnp.asarray(probs if probs is not None
                        else [1.0 / len(self.augs)] * len(self.augs),
                        jnp.float32)
        self.probs = p / jnp.sum(p)
        self.alphas = alphas or {}

    def __call__(self, rng, hr: jnp.ndarray, lr: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray]:
        """Returns (hr_aug, lr_aug, mask, aug_index). mask is all-ones
        unless cutout fired."""
        r_choice, r_aug = jax.random.split(rng)
        idx = jax.random.categorical(r_choice, jnp.log(self.probs + 1e-12))
        ones = jnp.ones((hr.shape[0], hr.shape[1], hr.shape[2], 1), hr.dtype)

        branches = []
        for name in self.augs:
            if name == "none":
                branches.append(lambda r, h, l: (h, l, ones))
            elif name == "cutout":
                def f(r, h, l, _a=self.alphas.get("cutout", 0.001)):
                    l2, m = cutout(r, l, _a)
                    return h, l2, m
                branches.append(f)
            elif name == "cutblur":
                def f(r, h, l, _a=self.alphas.get("cutblur", 0.7)):
                    h2, l2 = cutblur(r, h, l, _a)
                    return h2, l2, ones
                branches.append(f)
            else:
                def f(r, h, l, _fn=_AUG_FNS[name], _n=name):
                    kw = {}
                    if _n in self.alphas:
                        kw["alpha"] = self.alphas[_n]
                    h2, l2 = _fn(r, h, l, **kw) if kw else _fn(r, h, l)
                    return h2, l2, ones
                branches.append(f)

        hr_a, lr_a, mask = jax.lax.switch(idx, branches, r_aug, hr, lr)
        return hr_a, lr_a, mask, idx
