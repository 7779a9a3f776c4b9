"""SFTGAN: spatial-feature-transform SR conditioned on segmentation maps.

Behavioral equivalents of ref
codes/models/modules/architectures/sft_arch.py: SFTLayer:8, ResBlock_SFT:23,
SFT_Net:40 (16 SFT residual blocks + pixelshuffle HR branch + 4x-stride
CondNet over 8-class seg probabilities), ACD_VGG_BN_96:87 (auxiliary
classifier discriminator returning [gan_logits, class_logits]).

TPU-first: NHWC; the SFT modulation (x * (scale+1) + shift) is pure
elementwise — XLA fuses it into the adjacent convs.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import depth_to_space

Dtype = Any


def _conv(feats, k=3, stride=1, dtype=jnp.float32, name=None):
    return nn.Conv(feats, (k, k), strides=(stride, stride),
                   padding=(k - 1) // 2, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class SFTLayer(nn.Module):
    """Affine modulation from condition maps (ref sft_arch.py:8)."""

    nf: int = 64
    cond_nf: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fea, cond):
        s = nn.leaky_relu(_conv(self.cond_nf, 1, dtype=self.dtype,
                                name="scale0")(cond), 0.1)
        scale = _conv(self.nf, 1, dtype=self.dtype, name="scale1")(s)
        t = nn.leaky_relu(_conv(self.cond_nf, 1, dtype=self.dtype,
                                name="shift0")(cond), 0.1)
        shift = _conv(self.nf, 1, dtype=self.dtype, name="shift1")(t)
        return fea * (scale + 1.0) + shift


class ResBlockSFT(nn.Module):
    """SFT-conv residual block (ref sft_arch.py:23)."""

    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fea, cond):
        h = SFTLayer(self.nf, dtype=self.dtype, name="sft0")(fea, cond)
        h = nn.relu(_conv(self.nf, dtype=self.dtype, name="conv0")(h))
        h = SFTLayer(self.nf, dtype=self.dtype, name="sft1")(h, cond)
        h = _conv(self.nf, dtype=self.dtype, name="conv1")(h)
        return fea + h


class SFTNet(nn.Module):
    """SFTGAN generator (ref sft_arch.py:40). Call with (img, seg):
    img (b,h,w,3) LR image, seg (b,4h,4w,8) HR segmentation probabilities
    (CondNet's stride-4 4x4 conv brings them to LR resolution)."""

    nf: int = 64
    cond_nf: int = 32
    n_blocks: int = 16
    out_nc: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, seg, train: bool = True):
        # condition network: stride-4 4x4 conv + 1x1 stack (ref :64-74)
        c = nn.Conv(128, (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="cond0")(seg)
        c = nn.leaky_relu(c, 0.1)
        for i in range(1, 4):
            c = nn.leaky_relu(_conv(128, 1, dtype=self.dtype,
                                    name=f"cond{i}")(c), 0.1)
        cond = _conv(self.cond_nf, 1, dtype=self.dtype, name="cond4")(c)

        fea = _conv(self.nf, dtype=self.dtype, name="conv0")(x)
        res = fea
        for i in range(self.n_blocks):
            res = ResBlockSFT(self.nf, dtype=self.dtype,
                              name=f"sft_block{i}")(res, cond)
        res = SFTLayer(self.nf, dtype=self.dtype, name="sft_final")(res, cond)
        res = _conv(self.nf, dtype=self.dtype, name="conv_body")(res)
        fea = fea + res

        # HR branch: 2x pixelshuffle twice + conv head (ref :53-62)
        h = _conv(self.nf * 4, dtype=self.dtype, name="up0")(fea)
        h = nn.relu(depth_to_space(h, 2))
        h = _conv(self.nf * 4, dtype=self.dtype, name="up1")(h)
        h = nn.relu(depth_to_space(h, 2))
        h = nn.relu(_conv(self.nf, dtype=self.dtype, name="hr0")(h))
        return _conv(self.out_nc, dtype=self.dtype, name="hr1")(h)


class ACDVGGBN96(nn.Module):
    """Auxiliary-classifier VGG-BN discriminator for 96px inputs
    (ref sft_arch.py:87). Returns (gan_logits, class_logits[8])."""

    n_classes: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn(v):
            return nn.BatchNorm(use_running_average=not train,
                                dtype=self.dtype,
                                param_dtype=jnp.float32)(v)

        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        plan = [(64, 3, 1, False), (64, 4, 2, True), (128, 3, 1, True),
                (128, 4, 2, True), (256, 3, 1, True), (256, 4, 2, True),
                (512, 3, 1, True), (512, 4, 2, True)]
        h = x
        for i, (f, k, s, use_bn) in enumerate(plan):
            h = nn.Conv(f, (k, k), strides=(s, s), padding=(k - 1) // 2,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}")(h)
            if use_bn:
                h = bn(h)
            h = lrelu(h)
        h = h.reshape(h.shape[0], -1)
        gan = nn.Dense(100, dtype=self.dtype, param_dtype=jnp.float32,
                       name="gan_fc0")(h)
        gan = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                       name="gan_fc1")(lrelu(gan))
        cls = nn.Dense(100, dtype=self.dtype, param_dtype=jnp.float32,
                       name="cls_fc0")(h)
        cls = nn.Dense(self.n_classes, dtype=self.dtype,
                       param_dtype=jnp.float32, name="cls_fc1")(lrelu(cls))
        return gan, cls
