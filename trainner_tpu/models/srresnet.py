"""SRResNet / SRGAN generator (ref codes/models/modules/architectures/
SRResNet_arch.py:16 SRResNet, :63 ResNetBlock, :101 MSRResNet). NHWC Flax."""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (
    ConvBlock,
    PixelShuffleBlock,
    UpconvBlock,
    finalact,
    kaiming_init,
)

Dtype = Any


class ResNetBlock(nn.Module):
    """3-3 residual block with EDSR residual scaling
    (ref SRResNet_arch.py:63)."""

    nf: int
    norm_type: Optional[str] = None
    act_type: str = "relu"
    mode: str = "CNA"
    res_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        cb = partial(ConvBlock, kernel_size=3, pad_type="zero",
                     norm_type=self.norm_type, mode=self.mode,
                     kernel_init=kaiming_init(0.1), dtype=self.dtype)
        res = cb(self.nf, act_type=self.act_type, name="conv0")(x, train)
        act2 = None if self.mode in ("CNA", "CNAC") else self.act_type
        norm2 = None if self.mode == "CNAC" else self.norm_type
        res = cb(self.nf, act_type=act2, norm_type=norm2,
                 name="conv1")(res, train)
        return x + res * self.res_scale


class SRResNet(nn.Module):
    """Original SRResNet (ref SRResNet_arch.py:16): fea_conv ->
    [nb x ResNetBlock -> LR_conv] + skip -> upsampler -> HR convs."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    upscale: int = 4
    norm_type: Optional[str] = "batch"
    act_type: str = "relu"
    mode: str = "NAC"
    res_scale: float = 1.0
    upsample_mode: str = "pixelshuffle"
    final_act: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, outm: Optional[str] = None):
        x = x.astype(self.dtype)
        fea = ConvBlock(self.nf, 3, act_type=None, norm_type=None,
                        kernel_init=kaiming_init(0.1), dtype=self.dtype,
                        name="fea_conv")(x, train)
        trunk = fea
        for i in range(self.nb):
            trunk = ResNetBlock(self.nf, self.norm_type, self.act_type,
                                self.mode, self.res_scale, self.dtype,
                                name=f"res{i}")(trunk, train)
        trunk = ConvBlock(self.nf, 3, norm_type=self.norm_type, act_type=None,
                          mode=self.mode, kernel_init=kaiming_init(0.1),
                          dtype=self.dtype, name="LR_conv")(trunk, train)
        fea = fea + trunk

        if self.upsample_mode == "upconv":
            up_block = UpconvBlock
        elif self.upsample_mode == "pixelshuffle":
            up_block = PixelShuffleBlock
        else:
            raise NotImplementedError(
                f"upsample mode [{self.upsample_mode}] not found")
        if self.upscale == 3:
            fea = up_block(self.nf, upscale=3, act_type=self.act_type,
                           kernel_init=kaiming_init(0.1), dtype=self.dtype,
                           name="up0")(fea, train)
        else:
            for i in range(int(math.log2(self.upscale))):
                fea = up_block(self.nf, upscale=2, act_type=self.act_type,
                               kernel_init=kaiming_init(0.1),
                               dtype=self.dtype, name=f"up{i}")(fea, train)
        fea = ConvBlock(self.nf, 3, act_type=self.act_type,
                        kernel_init=kaiming_init(0.1), dtype=self.dtype,
                        name="HR_conv0")(fea, train)
        out = ConvBlock(self.out_nc, 3, act_type=None,
                        kernel_init=kaiming_init(0.1), dtype=self.dtype,
                        name="HR_conv1")(fea, train)
        out = finalact(self.final_act)(out)
        if outm:
            out = finalact(outm)(out)
        return out.astype(jnp.float32)
