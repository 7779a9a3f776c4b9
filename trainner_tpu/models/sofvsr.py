"""SOF-VSR: video SR with coarse-to-fine HR optical flow.

Behavioral equivalent of ref
codes/models/modules/architectures/SOFVSR_arch.py: SOFVSR:20 (per-pair
OFRnet flows at 3 levels, draft-cube assembly by subsampled HR-flow
warps, SR net over the cube), OFRnet:106, SRnet:186, ResB:229 /
CasResB:246 (half-channel depthwise residual + channel shuffle).

TPU-first: NHWC 5-D batches as (b, t, h, w, c); the per-pair OFR runs
batched over the (n_frames-1) pairs folded into the batch axis; draft
cube built with static python loops over the scale^2 phase offsets
(all static shapes).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import bilinear_torch, depth_to_space, interpolate
from ..ops.warp import flow_warp_vsr
from .rrdb import RRDBNet

Dtype = Any


def _conv(feats, k=3, use_bias=False, dtype=jnp.float32, name=None):
    return nn.Conv(feats, (k, k), padding=(k - 1) // 2, use_bias=use_bias,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def channel_shuffle(x, groups: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    return jnp.swapaxes(x, 3, 4).reshape(b, h, w, c)


class ResB(nn.Module):
    """Half-split residual: 1x1 -> depthwise 3x3 -> 1x1 on one half,
    concat, channel shuffle (ref SOFVSR_arch.py:229)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.channels // 2
        keep, body = x[..., :half], x[..., half:]
        h = _conv(half, 1, dtype=self.dtype, name="c1")(body)
        h = nn.leaky_relu(h, 0.1)
        h = nn.Conv(half, (3, 3), padding=1, feature_group_count=half,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="dw")(h)
        h = _conv(half, 1, dtype=self.dtype, name="c2")(h)
        h = nn.leaky_relu(h, 0.1)
        return channel_shuffle(jnp.concatenate([keep, h], axis=-1), 2)


class CasResB(nn.Module):
    n_blocks: int
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            x = ResB(self.channels, self.dtype, name=f"resb{i}")(x)
        return x


class _UpHead(nn.Module):
    """1x1 conv + pixelshuffle ladder to `scale` then 3x3 to out_ch
    (shared tail shape of OFRnet.SR and SRnet, ref SOFVSR_arch.py:127-147)."""

    scale: int
    out_ch: int
    final_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        steps = {4: [2, 2], 3: [3], 2: [2], 1: []}[self.scale]
        for i, r in enumerate(steps):
            x = _conv(64 * r * r, 1, dtype=self.dtype, name=f"ps{i}")(x)
            x = depth_to_space(x, r)
            x = nn.leaky_relu(x, 0.1)
        if not steps:
            x = _conv(64, 1, dtype=self.dtype, name="ps0")(x)
            x = nn.leaky_relu(x, 0.1)
        return _conv(self.out_ch, 3, use_bias=self.final_bias,
                     dtype=self.dtype, name="out")(x)


class OFRnet(nn.Module):
    """Coarse-to-fine optical flow: L1 (half-res), L2 (full-res), L3
    (HR, scale x) (ref SOFVSR_arch.py:106)."""

    scale: int
    channels: int
    img_ch: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.rnn1_conv = _conv(self.channels, 3, dtype=self.dtype)
        self.rnn1_body = CasResB(3, self.channels, self.dtype)
        # flow is always 2-channel (x, y); the reference's 2*img_ch only
        # holds in its Y-channel (img_ch=1) mode (ref SOFVSR_arch.py:121)
        self.rnn2 = _conv(2, 3, dtype=self.dtype)
        self.sr_body = CasResB(3, self.channels, self.dtype)
        self.sr_head = _UpHead(self.scale, 2, dtype=self.dtype)

    def _rnn1(self, x):
        return self.rnn1_body(nn.leaky_relu(self.rnn1_conv(x), 0.1))

    def __call__(self, x):
        """x: (b, h, w, 2*img_ch) frame pair (moving, reference)."""
        b, h, w, _ = x.shape
        ic = self.img_ch

        # L1: half resolution
        x_l1 = nn.avg_pool(x, (2, 2), strides=(2, 2))
        zeros = jnp.zeros((b, h // 2, w // 2, 2), x.dtype)
        flow_l1 = self.rnn2(self._rnn1(
            jnp.concatenate([x_l1, zeros], axis=-1)))
        flow_l1_up = bilinear_torch(flow_l1, size=(h, w)) * 2.0

        # L2: full resolution, residual on upsampled L1
        frame_a = x[..., :ic]
        frame_b = x[..., ic:]
        x_l2 = flow_warp_vsr(frame_a, flow_l1_up)
        inp_l2 = jnp.concatenate([x_l2, frame_b, flow_l1_up], axis=-1)
        flow_l2 = self.rnn2(self._rnn1(inp_l2)) + flow_l1_up

        # L3: HR flow, residual on upsampled L2
        x_l3 = flow_warp_vsr(frame_a, flow_l2)
        inp_l3 = jnp.concatenate([x_l3, frame_b, flow_l2], axis=-1)
        flow_l3 = self.sr_head(self.sr_body(self._rnn1(inp_l3))) + \
            bilinear_torch(flow_l2, scale=self.scale) * self.scale
        return flow_l1, flow_l2, flow_l3


class SRnet(nn.Module):
    """Draft-cube SR net (ref SOFVSR_arch.py:186)."""

    in_nc: int
    scale: int
    channels: int
    img_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.leaky_relu(_conv(self.channels, 3, dtype=self.dtype,
                                name="head")(x), 0.1)
        x = CasResB(8, self.channels, self.dtype, name="body")(x)
        return _UpHead(self.scale, self.img_ch, final_bias=True,
                       dtype=self.dtype, name="tail")(x)


class SOFVSR(nn.Module):
    """Super-resolving optical flow VSR (ref SOFVSR_arch.py:20).

    Input x: (b, n_frames, h, w, img_ch). Returns
    (flows_l1, flows_l2, flows_l3, SR-center-frame) where flows_l* are
    (n_frames-1)-length lists of (b, h', w', 2) arrays.
    """

    scale: int = 4
    n_frames: int = 3
    channels: int = 320
    img_ch: int = 3
    sr_net: str = "sofvsr"
    sr_nf: int = 64
    sr_nb: int = 23
    sr_gc: int = 32
    sr_gaussian_noise: bool = True
    sr_plus: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, n, h, w, c = x.shape
        center = (n - 1) // 2
        ofr = OFRnet(self.scale, self.channels, self.img_ch,
                     dtype=self.dtype, name="OFR")

        # batch all non-center pairs through OFR at once (fold into batch)
        others = [i for i in range(n) if i != center]
        pairs = jnp.concatenate(
            [jnp.concatenate([x[:, i], x[:, center]], axis=-1)
             for i in others], axis=0)
        fl1, fl2, fl3 = ofr(pairs)

        flows_l1 = [fl1[k * b:(k + 1) * b] for k in range(len(others))]
        flows_l2 = [fl2[k * b:(k + 1) * b] for k in range(len(others))]
        flows_l3 = [fl3[k * b:(k + 1) * b] for k in range(len(others))]

        # draft cube: center frame + scale^2 phase-shifted warps per frame
        s = self.scale
        cube = [x[:, center]]
        for k, i in enumerate(others):
            hr_flow = flows_l3[k]
            for di in range(s):
                for dj in range(s):
                    sub = hr_flow[:, di::s, dj::s, :] / s
                    cube.append(flow_warp_vsr(x[:, i], sub))
        draft = jnp.concatenate(cube, axis=-1)

        sr_in_nc = self.img_ch * (s * s * (n - 1) + 1)
        if self.sr_net == "rrdb":
            sr = RRDBNet(in_nc=sr_in_nc, out_nc=self.img_ch, nf=self.sr_nf,
                         nb=self.sr_nb, gc=self.sr_gc, upscale=s,
                         gaussian_noise=self.sr_gaussian_noise,
                         plus=self.sr_plus, dtype=self.dtype,
                         name="SR")(draft, train)
        else:
            sr = SRnet(sr_in_nc, s, self.channels, self.img_ch,
                       dtype=self.dtype, name="SR")(draft, train)
        return flows_l1, flows_l2, flows_l3, sr
