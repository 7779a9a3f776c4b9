"""ABPN: attention-based back-projection network for SR (4x).

Behavioral equivalent of ref
codes/models/modules/architectures/ABPN_arch.py:108 (ABPN_v5):
10 up/down back-projection stages with space/time attention blocks
(Space_attention:358, Time_attention:474, UpBlock:300, DownBlock:319),
dense HR/LR feature concat reconstruction, bicubic residual, final LR
back-projection refinement.

TPU-first: NHWC; attention matmuls via einsum with f32 accumulation
(MXU); 4x up/down as ConvTranspose/strided-conv (k6 s4).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import TorchDeconv, bicubic_torch

Dtype = Any


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class ConvB(nn.Module):
    features: int
    k: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.k, self.k),
                    strides=(self.stride, self.stride),
                    padding=(self.k - 1) // 2 if self.stride == 1 else
                    ((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        return PReLU(name="act")(x)


class DeconvB(nn.Module):
    """4x transposed conv (torch k6 s4 p1 equivalent)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch-exact ConvTranspose2d(6, s4, p1) for .pth interop
        x = TorchDeconv(self.features, 6, 4, 1, 0, dtype=self.dtype,
                        name="deconv")(x)
        return PReLU(name="act")(x)


class Conv4x(nn.Module):
    """4x strided conv (torch k6 s4 p1 equivalent)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (6, 6), strides=(4, 4),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        return PReLU(name="act")(x)


class UpBlock(nn.Module):
    """Back-projection up unit (ref ABPN_arch.py:300)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hr = DeconvB(self.dim, self.dtype, name="conv1")(x)
        lr = Conv4x(self.dim, self.dtype, name="conv2")(hr)
        residue = ConvB(self.dim, 1, dtype=self.dtype,
                        name="local_weight1")(x) - lr
        h_residue = DeconvB(self.dim, self.dtype, name="conv3")(residue)
        hr_weight = ConvB(self.dim, 1, dtype=self.dtype,
                          name="local_weight2")(hr)
        return hr_weight + h_residue


class DownBlock(nn.Module):
    """Back-projection down unit (ref ABPN_arch.py:319)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lr = Conv4x(self.dim, self.dtype, name="conv1")(x)
        hr = DeconvB(self.dim, self.dtype, name="conv2")(lr)
        residue = ConvB(self.dim, 1, dtype=self.dtype,
                        name="local_weight1")(x) - hr
        l_residue = Conv4x(self.dim, self.dtype, name="conv3")(residue)
        lr_weight = ConvB(self.dim, 1, dtype=self.dtype,
                          name="local_weight2")(lr)
        return lr_weight + l_residue


def _spatial_attention(k, q, v):
    """softmax(K^T Q) applied to V over flattened spatial positions."""
    b, h, w, c = k.shape
    kf = k.reshape(b, h * w, c)
    qf = q.reshape(b, h * w, c)
    vf = v.reshape(b, h * w, c)
    att = jax.nn.softmax(jnp.einsum(
        "bic,bjc->bij", kf, qf,
        preferred_element_type=jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bij,bjc->bic", att, vf)
    return out.reshape(b, h, w, c)


class SpaceAttention(nn.Module):
    """Self spatial attention with residual (ref ABPN_arch.py:358,
    kernel 1 / stride 1 configuration used by ABPN_v5)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv1 = lambda n: nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                                  param_dtype=jnp.float32, name=n)
        o = _spatial_attention(conv1("K")(x), conv1("Q")(x),
                               conv1("V")(x))
        w = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="local_weight")(o)
        return x + w


class TimeAttention(nn.Module):
    """Cross attention: queries/keys from x, values from y, residual on y
    (ref ABPN_arch.py:474)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        conv1 = lambda n: nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                                  param_dtype=jnp.float32, name=n)
        o = _spatial_attention(conv1("K")(x), conv1("Q")(x),
                               conv1("V")(y))
        w = nn.Conv(y.shape[-1], (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="local_weight")(o)
        return y + w


class ABPN(nn.Module):
    """ABPN_v5 (ref ABPN_arch.py:108). 4x only (like the reference)."""

    input_dim: int = 3
    dim: int = 32
    n_stages: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dim
        bic = bicubic_torch(x, scale=4)
        feat = ConvB(2 * d, dtype=self.dtype, name="feat1")(x)
        feat = SpaceAttention(2 * d, self.dtype, name="SA0")(feat)
        feat = ConvB(d, dtype=self.dtype, name="feat2")(feat)

        ups, downs = [], []
        prev_down = feat
        for i in range(1, self.n_stages + 1):
            inp = prev_down
            up = UpBlock(d, self.dtype, name=f"up{i}")(inp)
            if i >= 3:
                up = up + ConvB(d, 1, dtype=self.dtype,
                                name=f"weight_up{i-2}")(ups[i - 3])
            ups.append(up)
            if i == self.n_stages:
                break
            down = DownBlock(d, self.dtype, name=f"down{i}")(up)
            prev = prev_down if i < 3 else ConvB(
                d, 1, dtype=self.dtype,
                name=f"weight_down{i-2}")(downs[i - 3])
            down = TimeAttention(d, self.dtype, name=f"SA{i}")(prev, down)
            downs.append(down)
            prev_down = down

        hr_feat = jnp.concatenate(ups, axis=-1)
        lr_feat = jnp.concatenate(downs, axis=-1)
        hr_feat = ConvB(d, 1, dtype=self.dtype, name="SR_conv1")(hr_feat)
        hr_feat = ConvB(d, dtype=self.dtype, name="SR_conv2")(hr_feat)
        lr_feat = ConvB(d, 1, dtype=self.dtype, name="LR_conv1")(lr_feat)
        # LR_conv2 is a full back-projection UpBlock (ref :178)
        lr_feat = UpBlock(d, self.dtype, name="LR_conv2")(lr_feat)
        sr_res = nn.Conv(self.input_dim, (3, 3), padding=1,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="SR_conv3")(hr_feat + lr_feat)
        sr = bic.astype(sr_res.dtype) + sr_res

        # final LR back-projection refinement (ref :252-263)
        lr_res = x - bicubic_torch(sr, scale=0.25).astype(x.dtype)
        lr_res = ConvB(2 * d, dtype=self.dtype, name="final_feat1")(lr_res)
        lr_res = SpaceAttention(2 * d, self.dtype,
                                name="final_SA0")(lr_res)
        lr_res = nn.Conv(self.input_dim, (3, 3), padding=1,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="final_feat2")(lr_res)
        return sr + bicubic_torch(lr_res, scale=4).astype(sr.dtype)
