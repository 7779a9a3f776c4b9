"""ResNet generator (CycleGAN / neural-style family).

Behavioral equivalent of ref
codes/models/modules/architectures/ResNet_arch.py:11 (ResnetGenerator) /
:98 (ResnetBlock): 7x7 reflect-pad stem, 2 stride-2 downs, n_blocks
residual blocks, 2 ups (deconv|upconv), 7x7 reflect-pad tail, tanh.

TPU-first: NHWC, reflect padding via jnp.pad, bf16 compute / f32 params.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import TorchDeconv, interpolate

Dtype = Any


def _pad(x, p: int, padding_type: str):
    if p == 0:
        return x
    mode = {"reflect": "reflect", "replicate": "edge",
            "zero": "constant"}[padding_type]
    return jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)], mode=mode)


class _Norm(nn.Module):
    norm_type: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.norm_type in ("BN", "batch"):
            return nn.BatchNorm(use_running_average=not train,
                                dtype=self.dtype,
                                param_dtype=jnp.float32)(x)
        if self.norm_type in ("IN", "instance"):
            return nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5,
                                use_bias=False,
                                use_scale=False, dtype=self.dtype)(x)
        raise NameError(f"Unknown norm layer {self.norm_type}")


class ResnetBlock(nn.Module):
    """conv-norm-relu(-dropout)-conv-norm with identity skip
    (ref ResNet_arch.py:98)."""

    dim: int
    padding_type: str = "reflect"
    norm_type: str = "instance"
    use_dropout: bool = False
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = _pad(x, 1, self.padding_type)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=self.use_bias,
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = _Norm(self.norm_type, self.dtype)(h, train)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = _pad(h, 1, self.padding_type)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=self.use_bias,
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = _Norm(self.norm_type, self.dtype)(h, train)
        return x + h


class ResnetGenerator(nn.Module):
    """Resnet-based i2i generator (ref ResNet_arch.py:11)."""

    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    norm_type: str = "instance"
    use_dropout: bool = False
    n_blocks: int = 9
    padding_type: str = "reflect"
    upsample_mode: str = "deconv"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        use_bias = self.norm_type in ("IN", "instance")
        ngf = self.ngf
        x = _pad(x, 3, "reflect")
        x = nn.Conv(ngf, (7, 7), padding="VALID", use_bias=use_bias,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = _Norm(self.norm_type, self.dtype)(x, train)
        x = nn.relu(x)

        n_down = 2
        for i in range(n_down):
            mult = 2 ** i
            x = nn.Conv(ngf * mult * 2, (3, 3), strides=(2, 2), padding=1,
                        use_bias=use_bias, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
            x = _Norm(self.norm_type, self.dtype)(x, train)
            x = nn.relu(x)

        mult = 2 ** n_down
        for i in range(self.n_blocks):
            x = ResnetBlock(ngf * mult, self.padding_type, self.norm_type,
                            self.use_dropout, use_bias, self.dtype,
                            name=f"block{i}")(x, train)

        for i in range(n_down):
            mult = 2 ** (n_down - i)
            out_f = ngf * mult // 2
            if self.upsample_mode == "deconv":
                # torch-exact deconv so .pth weights interop bit-for-bit
                x = TorchDeconv(out_f, 3, 2, 1, 1, use_bias=use_bias,
                                dtype=self.dtype,
                                name=f"ConvTranspose_{i}")(x)
            else:
                x = interpolate(x, scale=2, mode="nearest")
                x = nn.Conv(out_f, (3, 3), padding=1, use_bias=use_bias,
                            dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = _Norm(self.norm_type, self.dtype)(x, train)
            x = nn.relu(x)

        x = _pad(x, 3, "reflect")
        x = nn.Conv(self.output_nc, (7, 7), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        return jnp.tanh(x)
