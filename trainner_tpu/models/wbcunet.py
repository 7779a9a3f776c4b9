"""White-box cartoonization generators.

Behavioral equivalents of ref
codes/models/modules/architectures/WBCNet_arch.py: UnetGeneratorWBC:24
(k7 stem, 2 stride-2 downs, 4 residual blocks, bilinear 2x ups with
additive skips), ResBlock:12, Upsample_2xBil_TF:275 (TF-parity bilinear),
tf_same_padding:~290.

TPU-first: NHWC; TF-parity 2x bilinear implemented as interleave of
neighbor averages via pad+stack+reshape (static shapes, no scatter).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import bilinear_torch, interpolate

Dtype = Any


def _conv(feats, k=3, stride=1, pad="SAME", dtype=jnp.float32, name=None):
    padding = pad if isinstance(pad, str) else pad
    return nn.Conv(feats, (k, k), strides=(stride, stride), padding=padding,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def tf_same_padding(x, k_size: int = 3):
    """TF 'SAME' asymmetric padding for stride-2 convs
    (ref WBCNet_arch.py tf_same_padding)."""
    j = k_size // 2
    return jnp.pad(x, [(0, 0), (j - 1, j), (j - 1, j), (0, 0)])


def tf_2x_bilinear(x):
    """TF-parity 2x bilinear upsample (ref Upsample_2xBil_TF:275):
    out[2i,2j]=x[i,j]; odd positions are neighbor means with edge padding."""
    b, h, w, c = x.shape
    p = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)], mode="edge")
    tl = p[:, :-1, :-1]
    bl = (p[:, :-1, :-1] + p[:, 1:, :-1]) / 2     # down neighbor mean
    tr = (p[:, :-1, :-1] + p[:, :-1, 1:]) / 2     # right neighbor mean
    br = (p[:, :-1, :-1] + p[:, 1:, 1:]) / 2      # diagonal mean
    top = jnp.stack([tl, tr], axis=3).reshape(b, h, 2 * w, c)
    bot = jnp.stack([bl, br], axis=3).reshape(b, h, 2 * w, c)
    return jnp.stack([top, bot], axis=2).reshape(b, 2 * h, 2 * w, c)


class WBCResBlock(nn.Module):
    """conv-lrelu-conv + identity (ref WBCNet_arch.py:12)."""

    nf: int
    slope: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _conv(self.nf, dtype=self.dtype, name="conv1")(x)
        h = nn.leaky_relu(h, self.slope)
        h = _conv(self.nf, dtype=self.dtype, name="conv2")(h)
        return h + x


class UnetGeneratorWBC(nn.Module):
    """WBC U-Net generator (ref WBCNet_arch.py:24). mode='tf' reproduces
    the original TF padding/upsampling exactly for ported weights."""

    nf: int = 32
    mode: str = "pt"
    slope: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        nf = self.nf
        lrelu = lambda v: nn.leaky_relu(v, self.slope)
        tf = self.mode == "tf"
        up = tf_2x_bilinear if tf else \
            (lambda v: bilinear_torch(v, scale=2))

        x0 = lrelu(_conv(nf, 7, dtype=self.dtype, name="conv")(x))

        h = tf_same_padding(x0) if tf else x0
        x1 = lrelu(_conv(nf, 3, 2, "VALID" if tf else 1,
                         dtype=self.dtype, name="conv_1")(h))
        x1 = lrelu(_conv(nf * 2, dtype=self.dtype, name="conv_2")(x1))

        h = tf_same_padding(x1) if tf else x1
        x2 = lrelu(_conv(nf * 2, 3, 2, "VALID" if tf else 1,
                         dtype=self.dtype, name="conv_3")(h))
        x2 = lrelu(_conv(nf * 4, dtype=self.dtype, name="conv_4")(x2))

        for i in range(4):
            x2 = WBCResBlock(nf * 4, self.slope, self.dtype,
                             name=f"block_{i}")(x2)

        x2 = lrelu(_conv(nf * 2, dtype=self.dtype, name="conv_5")(x2))

        x3 = up(x2)
        x3 = lrelu(_conv(nf * 2, dtype=self.dtype, name="conv_6")(x3 + x1))
        x3 = lrelu(_conv(nf, dtype=self.dtype, name="conv_7")(x3))

        x4 = up(x3)
        x4 = lrelu(_conv(nf, dtype=self.dtype, name="conv_8")(x4 + x0))
        return _conv(3, 7, dtype=self.dtype, name="conv_9")(x4)
