"""Discriminator family (TPU-native Flax, NHWC).

Equivalents of ref codes/models/modules/architectures/discriminators.py:
  Discriminator_VGG:16 (size-adaptive power-of-2 depth), fixed-size
  VGG-96/128/192/256 variants (:54-309, expressed here via `size`),
  feature-extracting variants (:310,403 -> `return_feats`),
  NLayerDiscriminator:472 (PatchGAN), MultiscaleDiscriminator:582,
  PixelDiscriminator:652, UNetDiscriminator:686 (Real-ESRGAN).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import ConvBlock, bilinear_torch, interpolate

Dtype = Any


def _lrelu(x):
    return nn.leaky_relu(x, 0.2)


class DiscriminatorVGG(nn.Module):
    """Size-adaptive VGG-style discriminator (ref discriminators.py:16).

    Halves spatial size with k4s2 convs until 4x4 (power-of-2 `size`) or
    3x3 (3 * power-of-2), doubling channels up to 512, then a 2-layer MLP
    head (100 hidden for ESRGAN-style, 128 for PPON). `return_feats` exposes
    the per-block feature maps for D-feature-matching loss (ref :310,403).
    """

    size: int = 128
    in_nc: int = 3
    base_nf: int = 64
    norm_type: Optional[str] = "batch"
    act_type: str = "leakyrelu"
    mode: str = "CNA"
    arch: str = "ESRGAN"
    spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, return_feats: bool = False):
        x = x.astype(self.dtype)
        cb = partial(ConvBlock, norm_type=self.norm_type,
                     act_type=self.act_type, mode=self.mode,
                     spectral_norm=self.spectral_norm, dtype=self.dtype)
        feats = []
        x = ConvBlock(self.base_nf, 3, act_type=self.act_type, norm_type=None,
                      mode=self.mode, spectral_norm=self.spectral_norm,
                      dtype=self.dtype, name="conv0_0")(x, train)
        x = cb(self.base_nf, kernel_size=4, stride=2,
               name="conv0_1")(x, train)
        feats.append(x)
        cur_size, cur_nc, i = self.size // 2, self.base_nf, 1
        while cur_size > 4:
            out_nc = cur_nc * 2 if cur_nc < 512 else cur_nc
            x = cb(out_nc, kernel_size=3, stride=1,
                   name=f"conv{i}_0")(x, train)
            x = cb(out_nc, kernel_size=4, stride=2,
                   name=f"conv{i}_1")(x, train)
            feats.append(x)
            cur_nc, cur_size, i = out_nc, cur_size // 2, i + 1

        x = x.reshape(x.shape[0], -1)
        hidden = 128 if self.arch == "PPON" else 100
        x = nn.Dense(hidden, dtype=self.dtype, name="linear0")(x)
        x = _lrelu(x)
        out = nn.Dense(1, dtype=self.dtype, name="linear1")(x)
        out = out.astype(jnp.float32)
        if return_feats:
            return out, feats
        return out


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (ref discriminators.py:472)."""

    ndf: int = 64
    n_layers: int = 3
    norm_type: Optional[str] = "batch"
    use_sigmoid: bool = False
    patch: bool = True
    use_spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, return_feats: bool = False):
        x = x.astype(self.dtype)
        norm = None if self.use_spectral_norm else self.norm_type
        feats = []
        x = ConvBlock(self.ndf, 4, stride=2, norm_type=None,
                      act_type="leakyrelu",
                      spectral_norm=self.use_spectral_norm,
                      dtype=self.dtype, name="conv0")(x, train)
        feats.append(x)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            x = ConvBlock(self.ndf * nf_mult, 4, stride=2, use_bias=False,
                          norm_type=norm, act_type="leakyrelu",
                          spectral_norm=self.use_spectral_norm,
                          dtype=self.dtype, name=f"conv{n}")(x, train)
            feats.append(x)
        nf_mult = min(2**self.n_layers, 8)
        x = ConvBlock(self.ndf * nf_mult, 4, stride=1, use_bias=False,
                      norm_type=norm, act_type="leakyrelu",
                      spectral_norm=self.use_spectral_norm, dtype=self.dtype,
                      name=f"conv{self.n_layers}")(x, train)
        feats.append(x)
        if self.patch:
            out = ConvBlock(1, 4, stride=1, norm_type=None, act_type=None,
                            spectral_norm=self.use_spectral_norm,
                            dtype=self.dtype, name="conv_out")(x, train)
        else:
            out = nn.Dense(1, dtype=self.dtype, name="linear_out")(
                jnp.mean(x, axis=(1, 2)))
        if self.use_sigmoid:
            out = nn.sigmoid(out)
        out = out.astype(jnp.float32)
        if return_feats:
            return out, feats
        return out


class MultiscaleDiscriminator(nn.Module):
    """Pyramid of PatchGAN discriminators at num_D scales
    (ref discriminators.py:582). Returns a list of per-scale outputs
    (finest scale first, matching the reference ordering)."""

    ndf: int = 64
    n_layers: int = 3
    norm_type: Optional[str] = "batch"
    num_D: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, return_feats: bool = False):
        outs, all_feats = [], []
        cur = x
        for i in range(self.num_D):
            d = NLayerDiscriminator(
                self.ndf, self.n_layers, self.norm_type, dtype=self.dtype,
                name=f"scale{self.num_D - 1 - i}")
            if return_feats:
                o, f = d(cur, train, return_feats=True)
                all_feats.extend(f)
            else:
                o = d(cur, train)
            outs.append(o)
            if i != self.num_D - 1:
                cur = nn.avg_pool(cur, (3, 3), strides=(2, 2),
                                  padding=((1, 1), (1, 1)),
                                  count_include_pad=False)
        if return_feats:
            return outs, all_feats
        return outs


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN (pixelGAN) discriminator (ref discriminators.py:652)."""

    ndf: int = 64
    norm_type: Optional[str] = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(self.ndf, (1, 1), dtype=self.dtype, name="conv0")(x)
        x = _lrelu(x)
        x = ConvBlock(self.ndf * 2, 1, use_bias=False,
                      norm_type=self.norm_type, act_type="leakyrelu",
                      dtype=self.dtype, name="conv1")(x, train)
        x = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        return x.astype(jnp.float32)


class UNetDiscriminator(nn.Module):
    """U-Net discriminator with optional spectral norm, as used by
    Real-ESRGAN (ref discriminators.py:686)."""

    nf: int = 64
    skip_connection: bool = True
    spectral_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        sn = self.spectral_norm

        def conv(feats, k, s, name, bias=True):
            # symmetric (k-1)//2 padding matches torch Conv2d(k, s, pad=1)
            c = nn.Conv(feats, (k, k), strides=(s, s), padding=(k - 1) // 2,
                        use_bias=bias, dtype=self.dtype, name=name)
            if sn:
                c = nn.SpectralNorm(c)
                return lambda y: c(y, update_stats=train)
            return c

        x0 = _lrelu(conv(self.nf, 3, 1, "conv0")(x))
        x1 = _lrelu(conv(self.nf * 2, 4, 2, "conv1", bias=False)(x0))
        x2 = _lrelu(conv(self.nf * 4, 4, 2, "conv2", bias=False)(x1))
        x3 = _lrelu(conv(self.nf * 8, 4, 2, "conv3", bias=False)(x2))

        u = bilinear_torch(x3, scale=2)
        x4 = _lrelu(conv(self.nf * 4, 3, 1, "conv4", bias=False)(u))
        if self.skip_connection:
            x4 = x4 + x2
        u = bilinear_torch(x4, scale=2)
        x5 = _lrelu(conv(self.nf * 2, 3, 1, "conv5", bias=False)(u))
        if self.skip_connection:
            x5 = x5 + x1
        u = bilinear_torch(x5, scale=2)
        x6 = _lrelu(conv(self.nf, 3, 1, "conv6", bias=False)(u))
        if self.skip_connection:
            x6 = x6 + x0

        out = _lrelu(conv(self.nf, 3, 1, "conv7", bias=False)(x6))
        out = _lrelu(conv(self.nf, 3, 1, "conv8", bias=False)(out))
        out = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                      name="conv9")(out)
        return out.astype(jnp.float32)
