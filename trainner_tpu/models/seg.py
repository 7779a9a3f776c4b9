"""Outdoor-scene segmentation net (SFTGAN's segmentation prior).

Behavioral equivalent of ref
codes/models/modules/architectures/seg_arch.py:29 (OutdoorSceneSeg) /
Res131:8 — dilated-ResNet-101-style 1-3-1 bottleneck stacks with batch
norm, 8-class head, 8x transposed-conv upsample, softmax probabilities.

TPU-first: NHWC; the 8x grouped deconv is a fixed bilinear-style learned
upsample implemented as ConvTranspose with feature groups.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Res131(nn.Module):
    """1-3-1 bottleneck with BN and optional projection
    (ref seg_arch.py:8)."""

    mid_nc: int
    out_nc: int
    dilation: int = 1
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn(v):
            return nn.BatchNorm(use_running_average=not train,
                                dtype=self.dtype,
                                param_dtype=jnp.float32)(v)

        h = nn.Conv(self.mid_nc, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv0")(x)
        h = nn.relu(bn(h))
        h = nn.Conv(self.mid_nc, (3, 3), strides=(self.stride,) * 2,
                    padding=self.dilation,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(h)
        h = nn.relu(bn(h))
        h = nn.Conv(self.out_nc, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        h = bn(h)
        if x.shape[-1] != self.out_nc or self.stride != 1:
            x = nn.Conv(self.out_nc, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj")(x)
            x = bn(x)
        return nn.relu(x + h)


class OutdoorSceneSeg(nn.Module):
    """8-class outdoor scene segmenter (ref seg_arch.py:29)."""

    n_classes: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn(v):
            return nn.BatchNorm(use_running_average=not train,
                                dtype=self.dtype,
                                param_dtype=jnp.float32)(v)

        def conv_bn_relu(v, f, stride, name):
            v = nn.Conv(f, (3, 3), strides=(stride, stride), padding=1,
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=name)(v)
            return nn.relu(bn(v))

        h = conv_bn_relu(x, 64, 2, "conv1_1")
        h = conv_bn_relu(h, 64, 1, "conv1_2")
        h = conv_bn_relu(h, 128, 1, "conv1_3")
        h = jnp.pad(h, [(0, 0), (0, 1), (0, 1), (0, 0)],
                    constant_values=-jnp.inf)  # ceil_mode max pool
        h = nn.max_pool(h, (3, 3), strides=(2, 2))

        h = Res131(64, 256, dtype=self.dtype, name="res2a")(h, train)
        for i in range(2):
            h = Res131(64, 256, dtype=self.dtype, name=f"res2b{i}")(h, train)
        h = Res131(128, 512, stride=2, dtype=self.dtype,
                   name="res3a")(h, train)
        for i in range(3):
            h = Res131(128, 512, dtype=self.dtype, name=f"res3b{i}")(h, train)
        h = Res131(256, 1024, dilation=2, dtype=self.dtype,
                   name="res4a")(h, train)
        for i in range(22):
            h = Res131(256, 1024, dilation=2, dtype=self.dtype,
                       name=f"res4b{i}")(h, train)
        for i in range(3):
            h = Res131(512, 2048, dilation=4, dtype=self.dtype,
                       name=f"res5{i}")(h, train)
        h = conv_bn_relu(h, 512, 1, "conv5_4")
        h = nn.Dropout(0.1, deterministic=not train)(h)
        h = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv6")(h)

        # 8x grouped deconv (torch ConvTranspose2d k16 s8 p4 groups=8),
        # expressed as an lhs-dilated conv: pad = k-1-p = 11
        w = self.param("deconv_kernel", nn.initializers.lecun_normal(),
                       (16, 16, 1, self.n_classes), jnp.float32)
        h = jax.lax.conv_general_dilated(
            h.astype(self.dtype), w.astype(self.dtype)[::-1, ::-1],
            window_strides=(1, 1), padding=[(11, 11), (11, 11)],
            lhs_dilation=(8, 8), feature_group_count=self.n_classes,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.softmax(h, axis=-1)
