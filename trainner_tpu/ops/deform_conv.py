"""Modulated deformable convolution (DCNv2) for TPU.

Equivalent of the reference's torchvision-backed modulated deform conv
(ref codes/models/modules/architectures/convolutions/deformconv2d.py:29
ModulatedDeformConv / :127 DCNv2Pack, op call :155) used by EDVR PCD
alignment.

TPU-native design: there is no XLA deform-conv primitive, so we build the
"deformed im2col" tensor with batched bilinear gathers (one static tap
loop, kh*kw iterations) and contract it against the kernel with a single
einsum — the contraction is a large matmul that lands on the MXU; the
gathers vectorize on the VPU. All shapes static; differentiable w.r.t.
input, offsets, mask and weights (pure jnp ops).

Offset/mask layout: offset[..., g, k, 0] = dy, [..., g, k, 1] = dx for
deformable group g and kernel tap k (row-major taps), matching the
(dy, dx) interleaved torchvision convention per (group, tap).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _bilinear_group_sample(x_g: jnp.ndarray, py: jnp.ndarray,
                           px: jnp.ndarray) -> jnp.ndarray:
    """Sample x_g (b, h, w, G, cg) at per-group positions py/px (b, h, w, G).

    Out-of-range samples contribute zero (torchvision zero padding).
    """
    b, h, w, G, cg = x_g.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]

    flat = x_g.reshape(b, h * w, G, cg)

    def gather(yy, xx):
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        idx = (yi * w + xi).reshape(b, -1, G, 1)
        v = jnp.take_along_axis(flat, idx, axis=1)
        v = v.reshape(b, h, w, G, cg)
        ok = ((yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1))
        return v * ok[..., None].astype(v.dtype)

    wx = wx.astype(x_g.dtype)
    wy = wy.astype(x_g.dtype)
    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def modulated_deform_conv2d(
        x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
        weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
        kernel_size: Tuple[int, int] = (3, 3),
        deformable_groups: int = 1) -> jnp.ndarray:
    """DCNv2 with stride 1 / SAME padding (the EDVR configuration).

    x:      (b, h, w, c_in)
    offset: (b, h, w, G * kh * kw * 2)  — (dy, dx) per (group, tap)
    mask:   (b, h, w, G * kh * kw)      — modulation in [0, 1]
    weight: (kh, kw, c_in, c_out)       — HWIO like flax nn.Conv
    """
    b, h, w, c = x.shape
    kh, kw = kernel_size
    G = deformable_groups
    cg = c // G
    n_taps = kh * kw

    off = offset.reshape(b, h, w, G, n_taps, 2)
    msk = mask.reshape(b, h, w, G, n_taps)
    x_g = x.reshape(b, h, w, G, cg)

    ys = jnp.arange(h, dtype=off.dtype)
    xs = jnp.arange(w, dtype=off.dtype)
    base_y = jnp.broadcast_to(ys[None, :, None, None], (b, h, w, G))
    base_x = jnp.broadcast_to(xs[None, None, :, None], (b, h, w, G))

    cols = []
    for k in range(n_taps):
        ky, kx = divmod(k, kw)
        py = base_y + (ky - (kh - 1) // 2) + off[..., k, 0]
        px = base_x + (kx - (kw - 1) // 2) + off[..., k, 1]
        v = _bilinear_group_sample(x_g, py, px)
        v = v * msk[..., k, None].astype(v.dtype)
        cols.append(v.reshape(b, h, w, c))
    col = jnp.stack(cols, axis=3)  # (b, h, w, taps, c)

    w_mat = weight.reshape(n_taps, c, -1)  # (taps, c_in, c_out)
    out = jnp.einsum("bhwtc,tco->bhwo", col, w_mat,
                     preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


class DCNv2Pack(nn.Module):
    """Deformable-alignment DCN: offsets/masks predicted from a separate
    feature map (ref deformconv2d.py:127). conv_offset is zero-initialized
    so training starts as a plain (masked-0.5) conv."""

    features: int
    kernel_size: int = 3
    deformable_groups: int = 8
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, feat):
        k = self.kernel_size
        G = self.deformable_groups
        n = G * k * k
        om = nn.Conv(3 * n, (k, k), padding=(k - 1) // 2,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="conv_offset")(feat)
        o1, o2, m = jnp.split(om, 3, axis=-1)
        # ref DCNv2Pack does offset = cat(o1, o2) and hands it straight to
        # torchvision's op, whose channel layout is ALREADY the
        # ((g*k*k + tap)*2 + {dy,dx}) interleaving — so the concatenation
        # itself is the interleaved offset tensor (deformconv2d.py:140-142)
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = nn.sigmoid(m)
        weight = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return modulated_deform_conv2d(
            x, offset, mask, weight.astype(x.dtype), bias,
            kernel_size=(k, k), deformable_groups=G)
