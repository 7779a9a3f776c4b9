"""DiffAugment for discriminator inputs (policy string), pure jnp.

Equivalent of ref codes/dataops/diffaug.py:7 (DiffAugment) with the same
policies: 'color' (brightness :41, saturation :45, contrast :49),
'translation' :55, 'cutout' :70, 'flip' :87, 'rotate' (rot90) :120,
'zoom_in'/'zoom_out' :161-227, 'offset'(_h/_v) :228.

All transforms are differentiable (gradients flow to the generator through
the augmented fake), static-shaped, and batched — XLA-friendly by design.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def rand_brightness(rng, x):
    return x + (jax.random.uniform(rng, (x.shape[0], 1, 1, 1)) - 0.5)


def rand_saturation(rng, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    return (x - mean) * jax.random.uniform(
        rng, (x.shape[0], 1, 1, 1)) * 2.0 + mean


def rand_contrast(rng, x):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * (jax.random.uniform(
        rng, (x.shape[0], 1, 1, 1)) + 0.5) + mean


def rand_translation(rng, x, ratio: float = 0.125):
    b, h, w, c = x.shape
    r1, r2 = jax.random.split(rng)
    ty = jax.random.randint(r1, (b,), -int(h * ratio + 0.5),
                            int(h * ratio + 0.5) + 1)
    tx = jax.random.randint(r2, (b,), -int(w * ratio + 0.5),
                            int(w * ratio + 0.5) + 1)
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ys = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    yi = jnp.clip(ys + ty[:, None, None] + 1, 0, h + 1)
    xi = jnp.clip(xs + tx[:, None, None] + 1, 0, w + 1)
    return pad[jnp.arange(b)[:, None, None], yi, xi]


def rand_cutout(rng, x, ratio: float = 0.5):
    b, h, w, _ = x.shape
    ch, cw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    r1, r2 = jax.random.split(rng)
    oy = jax.random.randint(r1, (b,), 0, h + (1 - ch % 2))
    ox = jax.random.randint(r2, (b,), 0, w + (1 - cw % 2))
    ys = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    y0 = oy[:, None, None] - ch // 2
    x0 = ox[:, None, None] - cw // 2
    mask = ~((ys >= y0) & (ys < y0 + ch) & (xs >= x0) & (xs < x0 + cw))
    return x * mask[..., None].astype(x.dtype)


def rand_flip(rng, x, prob: float = 0.5):
    flip = jax.random.bernoulli(rng, prob, (x.shape[0], 1, 1, 1))
    return jnp.where(flip, x[:, :, ::-1, :], x)


def rand_rotate(rng, x, prob: float = 0.5):
    """Random rot90 k∈{0,1,2,3} per batch (applied whole-batch for static
    shapes; square inputs assumed as in D crops)."""
    k = jax.random.randint(rng, (), 0, 4)
    rots = [x, jnp.rot90(x, 1, (1, 2)), jnp.rot90(x, 2, (1, 2)),
            jnp.rot90(x, 3, (1, 2))]
    return jax.lax.switch(k, [lambda i=i: rots[i] for i in range(4)])


def _resize_hw(x, h2: int, w2: int):
    return jax.image.resize(x, (x.shape[0], h2, w2, x.shape[3]), "bilinear")


def rand_zoom_in(rng, x, max_zoom: float = 1.25):
    b, h, w, c = x.shape
    z = float(max_zoom)
    hz, wz = int(h * z), int(w * z)
    big = _resize_hw(x, hz, wz)
    r1, r2 = jax.random.split(rng)
    oy = jax.random.randint(r1, (), 0, hz - h + 1)
    ox = jax.random.randint(r2, (), 0, wz - w + 1)
    return jax.lax.dynamic_slice(big, (0, oy, ox, 0), (b, h, w, c))


def rand_zoom_out(rng, x, min_zoom: float = 0.8):
    b, h, w, c = x.shape
    z = float(min_zoom)
    hz, wz = int(h * z), int(w * z)
    small = _resize_hw(x, hz, wz)
    r1, r2 = jax.random.split(rng)
    oy = jax.random.randint(r1, (), 0, h - hz + 1)
    ox = jax.random.randint(r2, (), 0, w - wz + 1)
    canvas = jnp.full_like(x, 0.5)
    return jax.lax.dynamic_update_slice(canvas, small, (0, oy, ox, 0))


def rand_offset(rng, x, ratio_h: float = 1.0, ratio_v: float = 1.0):
    """Circular shift (ref offset :228)."""
    b, h, w, _ = x.shape
    r1, r2 = jax.random.split(rng)
    sh = jax.random.randint(r1, (), -int(h * ratio_v + 0.5),
                            int(h * ratio_v + 0.5) + 1)
    sw = jax.random.randint(r2, (), -int(w * ratio_h + 0.5),
                            int(w * ratio_h + 0.5) + 1)
    return jnp.roll(jnp.roll(x, sh, axis=1), sw, axis=2)


AUGMENT_FNS = {
    "color": [rand_brightness, rand_saturation, rand_contrast],
    "translation": [rand_translation],
    "cutout": [rand_cutout],
    "flip": [rand_flip],
    "rotate": [rand_rotate],
    "zoom_in": [rand_zoom_in],
    "zoom_out": [rand_zoom_out],
    "offset": [rand_offset],
    "offset_h": [lambda r, x: rand_offset(r, x, ratio_v=0.0)],
    "offset_v": [lambda r, x: rand_offset(r, x, ratio_h=0.0)],
}


def diff_augment(rng, x: jnp.ndarray, policy: str = "") -> jnp.ndarray:
    """Apply the comma-separated policy string (ref DiffAugment:7)."""
    if not policy:
        return x
    for p in policy.split(","):
        p = p.strip()
        if not p:
            continue
        for f in AUGMENT_FNS[p]:
            rng, sub = jax.random.split(rng)
            x = f(sub, x)
    return x
