"""RIFE: real-time intermediate frame interpolation.

Behavioral equivalent of ref
codes/models/modules/architectures/RIFE_arch.py: RIFE:195 (IFNet coarse-
to-fine flow :110, ContextNet pyramid features :134, FusionNet U-Net
refinement :160, SE-style ResBlock :50). Flow warping uses the
pixel-offset convention (ops/warp.flow_warp_pix).

TPU-first: NHWC; the three IFBlocks run at 1/4, 1/2, 1 of the half-res
input; all resizes are static-shape bilinear.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import depth_to_space, interpolate
from ..ops.warp import flow_warp_pix

Dtype = Any


def _warp(x, flow):
    return flow_warp_pix(x, flow, padding_mode="border")


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class _Conv(nn.Module):
    features: int
    stride: int = 1
    mode: str = "rife"  # rife: bias+PReLU; ifnet: BN+PReLU
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=self.mode == "rife",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        if self.mode == "ifnet":
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="bn")(x)
        if self.act:
            x = PReLU(name="act")(x)
        return x


class ResBlock(nn.Module):
    """Residual block with SE-style channel gating (ref RIFE_arch.py:50)."""

    out_planes: int
    stride: int = 1
    mode: str = "rife"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if x.shape[-1] == self.out_planes and self.stride == 1:
            y = x
        else:
            y = nn.Conv(self.out_planes, (3, 3),
                        strides=(self.stride,) * 2, padding=1,
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv0")(x)
        h = _Conv(self.out_planes, self.stride, self.mode,
                  dtype=self.dtype, name="conv1")(x, train)
        h = _Conv(self.out_planes, 1, self.mode, act=False,
                  dtype=self.dtype, name="conv2")(h, train)
        w = jnp.mean(h, axis=(1, 2), keepdims=True)
        w = PReLU(name="relu1")(nn.Conv(16, (1, 1), use_bias=False,
                                        dtype=self.dtype,
                                        param_dtype=jnp.float32,
                                        name="fc1")(w))
        w = nn.sigmoid(nn.Conv(self.out_planes, (1, 1), use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="fc2")(w))
        return PReLU(name="relu2")(h * w + y)


class IFBlock(nn.Module):
    """One flow-estimation block at a given scale (ref RIFE_arch.py:79)."""

    scale: int = 1
    c: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.scale != 1:
            x = interpolate(x, scale=1.0 / self.scale, mode="bilinear")
        x = _Conv(self.c, 2, "ifnet", dtype=self.dtype,
                  name="conv0")(x, train)
        for i in range(6):
            x = ResBlock(self.c, 1, "ifnet", self.dtype,
                         name=f"res{i}")(x, train)
        x = nn.Conv(8, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        flow = depth_to_space(x, 2)
        if self.scale != 1:
            flow = interpolate(flow, scale=self.scale, mode="bilinear")
        return flow


class IFNet(nn.Module):
    """Coarse-to-fine bidirectional flow (ref RIFE_arch.py:110).

    x: concat(img0, img1) channels; returns (flow, [F1, F2, F3]); flow has
    2 channels (img0->mid; negated for img1)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = interpolate(x, scale=0.5, mode="bilinear")
        img0, img1 = x[..., :3], x[..., 3:]
        f0 = IFBlock(4, 192, self.dtype, name="block0")(x, train)
        w0 = _warp(img0, f0[..., :2])
        w1 = _warp(img1, -f0[..., :2])
        f1 = IFBlock(2, 128, self.dtype, name="block1")(
            jnp.concatenate([w0, w1, f0], axis=-1), train)
        f01 = f0 + f1
        w0 = _warp(img0, f01[..., :2])
        w1 = _warp(img1, -f01[..., :2])
        f2 = IFBlock(1, 64, self.dtype, name="block2")(
            jnp.concatenate([w0, w1, f01], axis=-1), train)
        flow = f0 + f1 + f2
        return flow, [f0, f01, flow]


class ContextNet(nn.Module):
    """Pyramid context features warped by (rescaled) flow
    (ref RIFE_arch.py:134)."""

    c: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, flow, train: bool = True):
        feats = []
        f = flow
        for i, ch in enumerate([self.c, 2 * self.c, 4 * self.c,
                                8 * self.c]):
            x = ResBlock(ch, 2, "rife", self.dtype,
                         name=f"conv{i+1}")(x, train)
            if i > 0:
                f = interpolate(f, scale=0.5, mode="bilinear") * 0.5
            feats.append(_warp(x, f[..., :2]))
        return feats


class FusionNet(nn.Module):
    """U-Net refinement over warped frames + context pyramids
    (ref RIFE_arch.py:160)."""

    c: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img0, img1, flow, c0, c1, train: bool = True):
        w0 = _warp(img0, flow[..., :2])
        w1 = _warp(img1, -flow[..., :2])
        c = self.c
        s0 = ResBlock(2 * c, 2, "rife", self.dtype, name="down0")(
            jnp.concatenate([w0, w1, flow], axis=-1), train)
        s1 = ResBlock(4 * c, 2, "rife", self.dtype, name="down1")(
            jnp.concatenate([s0, c0[0], c1[0]], axis=-1), train)
        s2 = ResBlock(8 * c, 2, "rife", self.dtype, name="down2")(
            jnp.concatenate([s1, c0[1], c1[1]], axis=-1), train)
        s3 = ResBlock(16 * c, 2, "rife", self.dtype, name="down3")(
            jnp.concatenate([s2, c0[2], c1[2]], axis=-1), train)

        def up(v, ch, name):
            v = nn.ConvTranspose(ch, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 param_dtype=jnp.float32, name=name)(v)
            return PReLU(name=name + "_act")(v)

        x = up(jnp.concatenate([s3, c0[3], c1[3]], axis=-1), 8 * c, "up0")
        x = up(jnp.concatenate([x, s2], axis=-1), 4 * c, "up1")
        x = up(jnp.concatenate([x, s1], axis=-1), 2 * c, "up2")
        x = up(jnp.concatenate([x, s0], axis=-1), c, "up3")
        x = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        return x, w0, w1


class RIFE(nn.Module):
    """Frame interpolation net (ref RIFE_arch.py:195). Input
    (b, h, w, 6) = concat(img0, img1); returns the mid frame (+ training
    extras when train=True)."""

    c: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs, train: bool = True):
        flow, flow_list = IFNet(self.dtype, name="flownet")(imgs, train)
        img0, img1 = imgs[..., :3], imgs[..., 3:]
        ctx = ContextNet(self.c, self.dtype, name="contextnet")
        c0 = ctx(img0, flow, train)
        c1 = ctx(img1, -flow, train)
        flow_up = interpolate(flow, scale=2, mode="bilinear") * 2.0
        refine, w0, w1 = FusionNet(self.c, self.dtype, name="fusionnet")(
            img0, img1, flow_up, c0, c1, train)
        res = nn.sigmoid(refine[..., :3]) * 2.0 - 1.0
        mask = nn.sigmoid(refine[..., 3:4])
        merged = w0 * mask + w1 * (1.0 - mask)
        pred = jnp.clip(merged + res, 0.0, 1.0)
        if train:
            return pred, mask, merged, w0, w1
        return pred
