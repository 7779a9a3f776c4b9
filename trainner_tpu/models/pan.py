"""PAN (Pixel Attention Network) and A2N (Attention-in-Attention) SR nets.

Behavioral equivalents of ref
codes/models/modules/architectures/PAN_arch.py: PA:22, PACnv:40, SCPA:63,
pa_upconv_block:11, PAN:109, AttentionBranch:271, AAB:303, AAN:323.

TPU-first: NHWC; pixel attention is a 1x1 conv + sigmoid gate (pure
elementwise multiply, fused by XLA into the surrounding convs); the AAB
attention-dropout head is a global-average-pool + 2-layer MLP + softmax.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (SelfAttentionBlock, bilinear_align_corners,
                          interpolate, nearest_up)

Dtype = Any


def _conv(feats, k=3, use_bias=True, dtype=jnp.float32, name=None):
    return nn.Conv(feats, (k, k), padding=(k - 1) // 2, use_bias=use_bias,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class PA(nn.Module):
    """Pixel attention: sigmoid(conv1x1(x)) * x (ref PAN_arch.py:22)."""

    nf: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.sigmoid(_conv(self.nf, 1, dtype=self.dtype, name="conv")(x))
        return x * y


class PACnv(nn.Module):
    """Pixel-attended conv pair (ref PAN_arch.py:40)."""

    nf: int
    k_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.sigmoid(_conv(self.nf, 1, dtype=self.dtype, name="k2")(x))
        out = _conv(self.nf, self.k_size, use_bias=False, dtype=self.dtype,
                    name="k3")(x) * y
        return _conv(self.nf, self.k_size, use_bias=False, dtype=self.dtype,
                     name="k4")(out)


class SCPA(nn.Module):
    """Self-calibrated pixel-attention block (ref PAN_arch.py:63)."""

    nf: int
    reduction: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gw = self.nf // self.reduction
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        a = lrelu(_conv(gw, 1, use_bias=False, dtype=self.dtype,
                        name="conv1_a")(x))
        b = lrelu(_conv(gw, 1, use_bias=False, dtype=self.dtype,
                        name="conv1_b")(x))
        a = lrelu(_conv(gw, 3, use_bias=False, dtype=self.dtype,
                        name="k1")(a))
        b = lrelu(PACnv(gw, dtype=self.dtype, name="pacnv")(b))
        out = _conv(self.nf, 1, use_bias=False, dtype=self.dtype,
                    name="conv3")(jnp.concatenate([a, b], axis=-1))
        return x + out


class PAUpconvBlock(nn.Module):
    """upsample + conv + PA + lrelu + conv (ref pa_upconv_block:11; the
    listed trailing activation is the SAME module instance passed twice,
    which torch's Sequential registration deduplicates — the reference's
    actual forward ends at HRconv, verified against its module children
    and output parity)."""

    unf: int
    upscale_factor: int = 2
    mode: str = "nearest"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.mode == "nearest":
            x = nearest_up(x, self.upscale_factor)
        else:
            x = interpolate(x, scale=self.upscale_factor, mode=self.mode)
        x = _conv(self.unf, dtype=self.dtype, name="upconv")(x)
        x = PA(self.unf, dtype=self.dtype, name="att")(x)
        x = nn.leaky_relu(x, 0.2)
        return _conv(self.unf, dtype=self.dtype, name="hrconv")(x)


class PAN(nn.Module):
    """Efficient SR with pixel attention (ref PAN_arch.py:109)."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 40
    unf: int = 24
    nb: int = 16
    scale: int = 4
    self_attention: bool = False
    double_scpa: bool = False
    ups_inter_mode: str = "nearest"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        unf = self.nf if self.scale == 1 else self.unf
        n_up = 1 if self.scale == 3 else \
            (int(math.log2(self.scale)) if self.scale > 1 else 0)

        fea = _conv(self.nf, dtype=self.dtype, name="conv_first")(x)
        t = fea
        for i in range(self.nb):
            t = SCPA(self.nf, dtype=self.dtype, name=f"scpa{i}")(t)
        t = _conv(self.nf, dtype=self.dtype, name="trunk_conv")(t)
        if self.double_scpa:
            for i in range(self.nb):
                t = SCPA(self.nf, dtype=self.dtype, name=f"scpa2_{i}")(t)
            t = _conv(self.nf, dtype=self.dtype, name="trunk_conv2")(t)

        fea = fea + t
        if self.self_attention:
            fea = SelfAttentionBlock(max_pool=True, poolsize=4,
                                     spectral_norm=False, dtype=self.dtype,
                                     name="fsa")(fea, train)

        for i in range(n_up):
            r = 3 if self.scale == 3 else 2
            f = unf
            fea = PAUpconvBlock(f, upscale_factor=r,
                                mode=self.ups_inter_mode, dtype=self.dtype,
                                name=f"up{i}")(fea)
        out = _conv(self.out_nc, dtype=self.dtype, name="conv_last")(fea)

        if self.scale > 1:
            # ref PAN_arch.py:223 uses align_corners=True for the ILR skip
            ilr = bilinear_align_corners(x, scale=self.scale)
        else:
            ilr = x
        return out + ilr.astype(out.dtype)


class AttentionBranch(nn.Module):
    """A2N attention branch (ref PAN_arch.py:271)."""

    nf: int
    k_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = _conv(self.nf, self.k_size, use_bias=False, dtype=self.dtype,
                  name="k1")(x)
        y = nn.leaky_relu(y, 0.2)
        y = nn.sigmoid(_conv(self.nf, 1, dtype=self.dtype, name="k2")(y))
        out = _conv(self.nf, self.k_size, use_bias=False, dtype=self.dtype,
                    name="k3")(x) * y
        return _conv(self.nf, self.k_size, use_bias=False, dtype=self.dtype,
                     name="k4")(out)


class AAB(nn.Module):
    """Attention-in-attention block (ref PAN_arch.py:303)."""

    nf: int
    reduction: int = 4
    K: int = 2
    t: float = 30.0
    mode: str = "n"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.leaky_relu(_conv(self.nf, 1, use_bias=False, dtype=self.dtype,
                                name="conv_first")(x), 0.2)
        # attention dropout module: GAP -> MLP -> softmax weights over K
        y = jnp.mean(h, axis=(1, 2))
        y = nn.Dense(self.nf // self.reduction, use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="adm1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.K, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="adm2")(y)
        ax = jax.nn.softmax(y.astype(jnp.float32) / self.t, axis=1)
        ax = ax.astype(h.dtype)

        attn = AttentionBranch(self.nf, dtype=self.dtype, name="attention")(h)
        na_k = 1 if self.mode == "m" else 3
        non_attn = _conv(self.nf, na_k, use_bias=False, dtype=self.dtype,
                         name="non_attention")(h)
        h = attn * ax[:, 0, None, None, None] + \
            non_attn * ax[:, 1, None, None, None]
        h = nn.leaky_relu(h, 0.2)
        out = _conv(self.nf, 1, use_bias=False, dtype=self.dtype,
                    name="conv_last")(h)
        return out + residual


class AAN(nn.Module):
    """A2N SR net (ref PAN_arch.py:323)."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 40
    unf: int = 24
    nb: int = 16
    scale: int = 4
    mode: str = "n"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        fea = _conv(self.nf, dtype=self.dtype, name="conv_first")(x)
        t = fea
        for i in range(self.nb):
            t = AAB(self.nf, mode=self.mode, dtype=self.dtype,
                    name=f"aab{i}")(t)
        t = _conv(self.nf, dtype=self.dtype, name="trunk_conv")(t)
        fea = fea + t

        ups = [self.scale] if self.scale in (2, 3) else \
            ([2, 2] if self.scale == 4 else [])
        for i, r in enumerate(ups):
            fea = nearest_up(fea, r)
            fea = _conv(self.unf, dtype=self.dtype, name=f"upconv{i+1}")(fea)
            fea = lrelu(PA(self.unf, dtype=self.dtype, name=f"att{i+1}")(fea))
            fea = lrelu(_conv(self.unf, dtype=self.dtype,
                              name=f"hrconv{i+1}")(fea))
        out = _conv(self.out_nc, dtype=self.dtype, name="conv_last")(fea)
        ilr = interpolate(x, scale=self.scale, mode="bilinear") \
            if self.scale > 1 else x
        return out + ilr.astype(out.dtype)
