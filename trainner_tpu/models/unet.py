"""U-Net generator for pix2pix-style image-to-image translation.

Behavioral equivalent of ref
codes/models/modules/architectures/UNet_arch.py:11 (UnetGenerator) /
:75 (UnetSkipConnectionBlock): num_downs encoder/decoder levels with skip
concatenation, LeakyReLU(0.2) down / ReLU up, tanh output, optional
dropout(0.5) on the ngf*8 middle levels, deconv|upconv upsampling.

TPU-first: NHWC, iterative (non-recursive) level construction so the
whole net is one static XLA graph; bf16 compute with f32 params.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import TorchDeconv, interpolate

Dtype = Any


def _norm(norm_type: Optional[str], dtype, train: bool):
    if norm_type in ("BN", "batch"):
        return nn.BatchNorm(use_running_average=not train, dtype=dtype,
                            param_dtype=jnp.float32)
    if norm_type in ("IN", "instance"):
        return lambda x: nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5,
                                use_bias=False,
                                      use_scale=False, dtype=dtype)(x)
    raise NameError(f"Unknown norm layer {norm_type}")


class _Down(nn.Module):
    """stride-2 4x4 conv (+norm) with leading LeakyReLU except outermost."""

    features: int
    norm_type: Optional[str]
    use_act: bool = True
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.use_act:
            x = nn.leaky_relu(x, 0.2)
        use_bias = self.norm_type in ("IN", "instance") or not self.use_norm
        x = nn.Conv(self.features, (4, 4), strides=(2, 2), padding=1,
                    use_bias=use_bias, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        if self.use_norm:
            x = _norm(self.norm_type, self.dtype, train)(x)
        return x


class _Up(nn.Module):
    """ReLU + 2x upsample conv (+norm); deconv or nearest-upconv."""

    features: int
    norm_type: Optional[str]
    upsample_mode: str = "deconv"
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(x)
        use_bias = self.norm_type in ("IN", "instance") or not self.use_norm
        if self.upsample_mode == "deconv":
            # torch-exact ConvTranspose2d(4, s2, p1) for .pth interop
            x = TorchDeconv(self.features, 4, 2, 1, 0, use_bias=use_bias,
                            dtype=self.dtype, name="ConvTranspose_0")(x)
        else:  # upconv: nearest-up + 3x3 conv (ref block.upconv_block)
            x = interpolate(x, scale=2, mode="nearest")
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=use_bias,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.use_norm:
            x = _norm(self.norm_type, self.dtype, train)(x)
        return x


class UnetGenerator(nn.Module):
    """U-Net with num_downs levels (ref UNet_arch.py:11).

    Channel plan mirrors the reference: ngf, 2ngf, 4ngf, then 8ngf for all
    deeper levels; decoder mirrors with skip concat (so decoder convs see
    2x channels except at the innermost level).
    """

    input_nc: int = 3
    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    norm_type: str = "batch"
    use_dropout: bool = False
    upsample_mode: str = "deconv"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        ngf = self.ngf
        mults = [1, 2, 4] + [8] * (self.num_downs - 3)
        feats = [ngf * m for m in mults]

        skips = []
        # encoder: outermost conv has no act/norm; innermost has no norm
        for i, f in enumerate(feats):
            innermost = i == len(feats) - 1
            x = _Down(f, self.norm_type, use_act=i > 0,
                      use_norm=not innermost and i > 0,
                      dtype=self.dtype, name=f"down{i}")(x, train)
            if not innermost:
                # the reference's downrelu is INPLACE (UNet_arch.py:35) and
                # runs before torch.cat reads x, so the skip that actually
                # reaches the decoder is lrelu(x), not x (verified by
                # output parity vs the torch network)
                skips.append(nn.leaky_relu(x, 0.2))

        # decoder
        for i in reversed(range(len(feats))):
            outermost = i == 0
            out_f = self.output_nc if outermost else \
                (feats[i - 1] if i > 0 else ngf)
            x = _Up(out_f, self.norm_type, self.upsample_mode,
                    use_norm=not outermost, dtype=self.dtype,
                    name=f"up{i}")(x, train)
            innermost = i == len(feats) - 1
            if self.use_dropout and not outermost and not innermost \
                    and feats[i] == ngf * 8:
                x = nn.Dropout(0.5, deterministic=not train)(x)
            if not outermost:
                x = jnp.concatenate([skips[i - 1], x], axis=-1)
        return jnp.tanh(x)
