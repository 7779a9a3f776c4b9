"""A-SRResNet family: spectral-norm + self-attention SRGAN variants.

Behavioral equivalents of ref
codes/models/modules/architectures/ASRResNet_arch.py: ASRResNet:228
(9x9 stem, 5 SN residual blocks w/ BN+PReLU, self-attention on the global
skip, upconv tail), ADiscriminator:336 (SN VGG-ish D with self-attention
after the 256 stage, FCN head, returns (logits, feature_maps)).

Note: the reference's registry also points at `ASRCNN`
(ref networks.py:138-140) but that class does not exist in its tree — the
option string would crash upstream. We provide a working lightweight
attentional SRCNN under the same name/signature.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import SelfAttentionBlock, depth_to_space, interpolate

Dtype = Any


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class _SNConv(nn.Module):
    features: int
    k: int = 3
    stride: int = 1
    spectral_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.Conv(self.features, (self.k, self.k),
                       strides=(self.stride, self.stride),
                       padding=(self.k - 1) // 2, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")
        if self.spectral_norm:
            return nn.SpectralNorm(conv)(x, update_stats=train)
        return conv(x)


class _ResBlock(nn.Module):
    """SN conv-BN-PReLU x2 + identity (ref ASRResNet_arch.py:145)."""

    nf: int
    spectral_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn(v):
            return nn.BatchNorm(use_running_average=not train,
                                dtype=self.dtype,
                                param_dtype=jnp.float32)(v)

        h = _SNConv(self.nf, spectral_norm=self.spectral_norm,
                    dtype=self.dtype, name="conv1")(x, train)
        h = PReLU(name="act1")(bn(h))
        h = _SNConv(self.nf, spectral_norm=self.spectral_norm,
                    dtype=self.dtype, name="conv2")(h, train)
        h = PReLU(name="act2")(bn(h))
        return x + h


class ASRResNet(nn.Module):
    """Attentional SRResNet generator (ref ASRResNet_arch.py:228)."""

    scale_factor: int = 4
    in_nc: int = 3
    nf: int = 64
    spectral_norm: bool = True
    self_attention: bool = True
    max_pool: bool = False
    poolsize: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b1 = _SNConv(self.nf, 9, spectral_norm=self.spectral_norm,
                     dtype=self.dtype, name="block1")(x, train)
        b1 = PReLU(name="act1")(b1)
        h = b1
        for i in range(5):
            h = _ResBlock(self.nf, self.spectral_norm, self.dtype,
                          name=f"block{i+2}")(h, train)
        h = _SNConv(self.nf, spectral_norm=self.spectral_norm,
                    dtype=self.dtype, name="block7")(h, train)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn7")(h)
        h = b1 + h
        if self.self_attention:
            h = SelfAttentionBlock(max_pool=self.max_pool,
                                   poolsize=self.poolsize,
                                   spectral_norm=self.spectral_norm,
                                   dtype=self.dtype, name="FSA")(h, train)
        n_up = int(math.log2(self.scale_factor))
        for i in range(n_up):
            h = interpolate(h, scale=2, mode="nearest")
            h = _SNConv(self.nf, spectral_norm=False, dtype=self.dtype,
                        name=f"up{i}")(h, train)
            h = nn.leaky_relu(h, 0.2)
        return _SNConv(self.in_nc, 9, spectral_norm=False,
                       dtype=self.dtype, name="out")(h, train)


class ASRCNN(nn.Module):
    """Lightweight attentional SRCNN (stand-in for the reference's missing
    ASRCNN class; same registry signature)."""

    upscale_factor: int = 4
    in_nc: int = 3
    nf: int = 64
    spectral_norm: bool = True
    self_attention: bool = True
    max_pool: bool = True
    poolsize: int = 4
    finalact: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = _SNConv(self.nf, 5, spectral_norm=self.spectral_norm,
                    dtype=self.dtype, name="feat")(x, train)
        h = PReLU(name="act0")(h)
        h = _SNConv(self.nf // 2, 3, spectral_norm=self.spectral_norm,
                    dtype=self.dtype, name="map")(h, train)
        h = PReLU(name="act1")(h)
        if self.self_attention:
            h = SelfAttentionBlock(max_pool=self.max_pool,
                                   poolsize=self.poolsize,
                                   spectral_norm=self.spectral_norm,
                                   dtype=self.dtype, name="FSA")(h, train)
        r = self.upscale_factor
        h = _SNConv(self.in_nc * r * r, 3, spectral_norm=False,
                    dtype=self.dtype, name="up")(h, train)
        out = depth_to_space(h, r)
        if self.finalact == "tanh":
            out = jnp.tanh(out)
        elif self.finalact == "sigmoid":
            out = nn.sigmoid(out)
        return out


class ADiscriminator(nn.Module):
    """Self-attention SN discriminator (ref ASRResNet_arch.py:336).
    Returns (logits, feature_maps) when return_maps else logits."""

    spectral_norm: bool = True
    self_attention: bool = True
    max_pool: bool = False
    poolsize: int = 4
    return_maps: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        maps = []

        def bn(v):
            return nn.BatchNorm(use_running_average=not train,
                                dtype=self.dtype,
                                param_dtype=jnp.float32)(v)

        plan = [(64, 1), (64, 2), (128, 1), (128, 2), (256, 1), (256, 2)]
        h = x
        for i, (f, s) in enumerate(plan):
            h = _SNConv(f, 3, s, self.spectral_norm, self.dtype,
                        name=f"conv{i+1}")(h, train)
            if i > 0 and not self.spectral_norm:
                h = bn(h)
            h = nn.leaky_relu(h, 0.2)
            maps.append(h)
        if self.self_attention:
            h = SelfAttentionBlock(max_pool=self.max_pool,
                                   poolsize=self.poolsize,
                                   spectral_norm=self.spectral_norm,
                                   dtype=self.dtype, name="FSA")(h, train)
        for i, (f, s) in enumerate([(512, 1), (512, 2)]):
            h = _SNConv(f, 3, s, self.spectral_norm, self.dtype,
                        name=f"conv{i+7}")(h, train)
            if not self.spectral_norm:
                h = bn(h)
            h = nn.leaky_relu(h, 0.2)
            maps.append(h)
        h = _SNConv(1024, 1, 1, self.spectral_norm, self.dtype,
                    name="conv9")(h, train)
        h = nn.leaky_relu(h, 0.2)
        logits = _SNConv(1, 1, 1, self.spectral_norm, self.dtype,
                         name="conv10")(h, train)
        if self.return_maps:
            return logits, maps
        return logits
