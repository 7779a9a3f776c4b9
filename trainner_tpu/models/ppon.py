"""PPON: Progressive Perception-Oriented Network for SISR.

Behavioral equivalent of ref
codes/models/modules/architectures/PPON_arch.py:18 (PPON), RRBlock_32:117,
_ResBlock_32:75. Three progressive branches sharing a trunk:
content (CFEM->CRM), structure (SFEM->SRM, + content output), perceptual
(PFEM->PRM, + structure output). Returns (out_c, out_s, out_p).

TPU-first: NHWC; the 8 dilated 3x3 convs of each _ResBlock are kept as
separate XLA convs (dilation is a free parameter of conv_general_dilated,
so each maps directly onto the MXU); prefix-sums are fused elementwise.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import UpconvBlock, kaiming_init

Dtype = Any


def _conv(feats, k=3, dilation=1, dtype=jnp.float32, name=None):
    pad = (k - 1) // 2 * dilation
    return nn.Conv(feats, (k, k), padding=pad,
                   kernel_dilation=(dilation, dilation),
                   kernel_init=kaiming_init(0.1), dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class ResBlock32(nn.Module):
    """Multi-dilation residual block (ref PPON_arch.py:75): 8 parallel
    3x3 convs with dilation 1..8 (nc -> nc/2), cumulative sums, concat of
    the 8 partials (4nc), 1x1 fuse back to nc, x0.2 residual."""

    nc: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        h = lrelu(_conv(self.nc, dtype=self.dtype, name="c1")(x))
        half = self.nc // 2
        ds = [_conv(half, dilation=r, dtype=self.dtype,
                    name=f"d{r}")(h) for r in range(1, 9)]
        partials = [ds[0]]
        acc = ds[0]
        for d in ds[1:]:
            acc = acc + d
            partials.append(acc)
        combine = jnp.concatenate(partials, axis=-1)
        out = _conv(self.nc, k=1, dtype=self.dtype, name="c2")(lrelu(combine))
        return x + out * 0.2


class RRBlock32(nn.Module):
    """3 stacked ResBlock32 with x0.2 outer residual (ref PPON_arch.py:117)."""

    nc: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ResBlock32(self.nc, self.dtype, name="RB1")(x)
        h = ResBlock32(self.nc, self.dtype, name="RB2")(h)
        h = ResBlock32(self.nc, self.dtype, name="RB3")(h)
        return h * 0.2 + x


class PPON(nn.Module):
    """Progressive 3-branch SR generator (ref PPON_arch.py:18)."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 24
    upscale: int = 4
    act_type: str = "leakyrelu"
    dtype: Dtype = jnp.float32

    def _upsampler(self, x, train, tag: str):
        n_up = 1 if self.upscale == 3 else int(math.log2(self.upscale))
        r = 3 if self.upscale == 3 else 2
        for i in range(n_up):
            x = UpconvBlock(self.nf, upscale=r, act_type=self.act_type,
                            dtype=self.dtype, name=f"up_{tag}{i}")(x, train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        # CFEM: stem conv + residual trunk of nb RRBlocks + LR conv
        fea = _conv(self.nf, dtype=self.dtype, name="fea_conv")(x)
        t = fea
        for i in range(self.nb):
            t = RRBlock32(self.nf, self.dtype, name=f"rb{i}")(t)
        t = _conv(self.nf, dtype=self.dtype, name="lr_conv")(t)
        out_cfem = fea + t

        # content branch
        c = self._upsampler(out_cfem, train, "c")
        c = lrelu(_conv(self.nf, dtype=self.dtype, name="hr0_c")(c))
        out_c = _conv(self.out_nc, dtype=self.dtype, name="hr1_c")(c)

        # structure branch
        out_sfem = out_cfem
        for i in range(2):
            out_sfem = RRBlock32(self.nf, self.dtype,
                                 name=f"ssim{i}")(out_sfem)
        s = self._upsampler(out_sfem, train, "s")
        s = lrelu(_conv(self.nf, dtype=self.dtype, name="hr0_s")(s))
        out_s = _conv(self.out_nc, dtype=self.dtype, name="hr1_s")(s) + out_c

        # perceptual branch
        out_pfem = out_sfem
        for i in range(2):
            out_pfem = RRBlock32(self.nf, self.dtype,
                                 name=f"gan{i}")(out_pfem)
        p = self._upsampler(out_pfem, train, "p")
        p = lrelu(_conv(self.nf, dtype=self.dtype, name="hr0_p")(p))
        out_p = _conv(self.out_nc, dtype=self.dtype, name="hr1_p")(p) + out_s

        return out_c, out_s, out_p
