"""EDVR: video restoration with enhanced deformable convolutions.

Behavioral equivalent of ref
codes/models/modules/architectures/EDVR_arch.py: EDVR:340,
PCDAlignment:77 (3-level pyramid cascading deformable alignment),
TSAFusion:188 (temporal correlation + spatial pyramid attention),
PredeblurModule:285, ResidualBlockNoBN:46.

TPU-first: NHWC, (b, t, h, w, c) clips; the per-frame feature extractor
runs with t folded into batch; deformable conv is the gather+MXU-einsum
op in ops/deform_conv.py; the per-frame PCD alignment also folds the
frame axis into batch (reference features broadcast per frame).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (bilinear_torch, depth_to_space, interpolate,
                          kaiming_init)
from ..ops.deform_conv import DCNv2Pack

Dtype = Any


def _conv(feats, k=3, stride=1, scale=1.0, dtype=jnp.float32, name=None):
    init = kaiming_init(scale) if scale != 1.0 \
        else nn.initializers.lecun_normal()
    return nn.Conv(feats, (k, k), strides=(stride, stride),
                   padding=(k - 1) // 2, kernel_init=init, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


def _up2(x):
    return bilinear_torch(x, scale=2)


class ResidualBlockNoBN(nn.Module):
    """conv-relu-conv + identity (ref EDVR_arch.py:46, init x0.1)."""

    num_feat: int = 64
    res_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(_conv(self.num_feat, scale=0.1, dtype=self.dtype,
                          name="conv1")(x))
        h = _conv(self.num_feat, scale=0.1, dtype=self.dtype,
                  name="conv2")(h)
        return x + h * self.res_scale


class PCDAlignment(nn.Module):
    """Pyramid cascading deformable alignment (ref EDVR_arch.py:77).

    Called with pyramid lists nbr[0..2], ref[0..2] (L1 full res .. L3
    quarter res), each (b, h_l, w_l, c). Returns aligned L1 features.
    """

    num_feat: int = 64
    deformable_groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, nbr, ref):
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        nf = self.num_feat
        up_offset, up_feat = None, None
        feat = None
        for i in range(3, 0, -1):
            lv = f"l{i}"
            offset = jnp.concatenate([nbr[i - 1], ref[i - 1]], axis=-1)
            offset = lrelu(_conv(nf, dtype=self.dtype,
                                 name=f"offset_conv1_{lv}")(offset))
            if i == 3:
                offset = lrelu(_conv(nf, dtype=self.dtype,
                                     name=f"offset_conv2_{lv}")(offset))
            else:
                offset = lrelu(_conv(nf, dtype=self.dtype,
                                     name=f"offset_conv2_{lv}")(
                    jnp.concatenate([offset, up_offset], axis=-1)))
                offset = lrelu(_conv(nf, dtype=self.dtype,
                                     name=f"offset_conv3_{lv}")(offset))

            feat = DCNv2Pack(nf, 3, self.deformable_groups,
                             name=f"dcn_{lv}")(nbr[i - 1], offset)
            if i < 3:
                feat = _conv(nf, dtype=self.dtype, name=f"feat_conv_{lv}")(
                    jnp.concatenate([feat, up_feat], axis=-1))
            if i > 1:
                feat = lrelu(feat)
                up_offset = _up2(offset) * 2.0
                up_feat = _up2(feat)

        # cascading refinement at L1
        offset = jnp.concatenate([feat, ref[0]], axis=-1)
        offset = lrelu(_conv(nf, dtype=self.dtype,
                             name="cas_offset_conv1")(offset))
        offset = lrelu(_conv(nf, dtype=self.dtype,
                             name="cas_offset_conv2")(offset))
        return nn.leaky_relu(
            DCNv2Pack(nf, 3, self.deformable_groups,
                      name="cas_dcn")(feat, offset), 0.1)


class TSAFusion(nn.Module):
    """Temporal-spatial attention fusion (ref EDVR_arch.py:188).

    aligned: (b, t, h, w, c) -> (b, h, w, c).
    """

    num_feat: int = 64
    num_frame: int = 5
    center_frame_idx: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, aligned):
        b, t, h, w, c = aligned.shape
        nf = self.num_feat
        lrelu = lambda v: nn.leaky_relu(v, 0.1)

        # temporal attention: correlation with center-frame embedding
        emb_ref = _conv(nf, dtype=self.dtype, name="temporal_attn1")(
            aligned[:, self.center_frame_idx])
        emb = _conv(nf, dtype=self.dtype, name="temporal_attn2")(
            aligned.reshape(b * t, h, w, c)).reshape(b, t, h, w, -1)
        corr = jnp.sum(emb * emb_ref[:, None], axis=-1)  # (b, t, h, w)
        prob = nn.sigmoid(corr)[..., None]               # (b, t, h, w, 1)
        weighted = (aligned * prob.astype(aligned.dtype)) \
            .transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)

        feat = lrelu(_conv(nf, 1, dtype=self.dtype,
                           name="feat_fusion")(weighted))

        # spatial attention pyramid
        maxp = lambda v: nn.max_pool(v, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        avgp = lambda v: nn.avg_pool(v, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        attn = lrelu(_conv(nf, 1, dtype=self.dtype,
                           name="spatial_attn1")(weighted))
        attn = lrelu(_conv(nf, 1, dtype=self.dtype, name="spatial_attn2")(
            jnp.concatenate([maxp(attn), avgp(attn)], axis=-1)))
        lvl = lrelu(_conv(nf, 1, dtype=self.dtype,
                          name="spatial_attn_l1")(attn))
        lvl = lrelu(_conv(nf, dtype=self.dtype, name="spatial_attn_l2")(
            jnp.concatenate([maxp(lvl), avgp(lvl)], axis=-1)))
        lvl = lrelu(_conv(nf, dtype=self.dtype, name="spatial_attn_l3")(lvl))
        lvl = _up2(lvl)
        attn = lrelu(_conv(nf, dtype=self.dtype,
                           name="spatial_attn3")(attn)) + lvl
        attn = lrelu(_conv(nf, 1, dtype=self.dtype, name="spatial_attn4")(attn))
        attn = _up2(attn)
        attn = _conv(nf, dtype=self.dtype, name="spatial_attn5")(attn)
        attn_add = _conv(nf, 1, dtype=self.dtype, name="spatial_attn_add2")(
            lrelu(_conv(nf, 1, dtype=self.dtype,
                        name="spatial_attn_add1")(attn)))
        attn = nn.sigmoid(attn)
        return feat * attn * 2.0 + attn_add


class PredeblurModule(nn.Module):
    """Pyramid pre-deblur head (ref EDVR_arch.py:285)."""

    num_feat: int = 64
    hr_in: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        nf = self.num_feat
        l1 = lrelu(_conv(nf, dtype=self.dtype, name="conv_first")(x))
        if self.hr_in:
            l1 = lrelu(_conv(nf, stride=2, dtype=self.dtype,
                             name="stride_conv_hr1")(l1))
            l1 = lrelu(_conv(nf, stride=2, dtype=self.dtype,
                             name="stride_conv_hr2")(l1))
        l2 = lrelu(_conv(nf, stride=2, dtype=self.dtype,
                         name="stride_conv_l2")(l1))
        l3 = lrelu(_conv(nf, stride=2, dtype=self.dtype,
                         name="stride_conv_l3")(l2))
        l3 = _up2(ResidualBlockNoBN(nf, dtype=self.dtype,
                                    name="resblock_l3")(l3))
        l2 = ResidualBlockNoBN(nf, dtype=self.dtype,
                               name="resblock_l2_1")(l2) + l3
        l2 = _up2(ResidualBlockNoBN(nf, dtype=self.dtype,
                                    name="resblock_l2_2")(l2))
        for i in range(2):
            l1 = ResidualBlockNoBN(nf, dtype=self.dtype,
                                   name=f"resblock_l1_{i}")(l1)
        l1 = l1 + l2
        for i in range(2, 5):
            l1 = ResidualBlockNoBN(nf, dtype=self.dtype,
                                   name=f"resblock_l1_{i}")(l1)
        return l1


class EDVR(nn.Module):
    """EDVR video SR/restoration net (ref EDVR_arch.py:340).

    Input (b, t, h, w, c) clip -> (b, h*scale, w*scale, out_ch) center
    frame.
    """

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_frame: int = 5
    deformable_groups: int = 8
    num_extract_block: int = 5
    num_reconstruct_block: int = 10
    center_frame_idx: Optional[int] = None
    hr_in: bool = False
    with_predeblur: bool = False
    with_tsa: bool = True
    upscale: int = 4
    # 'pixelshuffle' = conv(4f) + depth_to_space (the reference's INTENT;
    # its actual pixelshuffle path double-shuffles and crashes upstream,
    # EDVR_arch.py:449+485). 'upconv' = nearest-up + conv, the reference
    # mode that runs — use it for .pth output-parity.
    upsample_mode: str = "pixelshuffle"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, t, h, w, c = x.shape
        center = self.center_frame_idx if self.center_frame_idx is not None \
            else self.num_frame // 2
        nf = self.num_feat
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        x_center = x[:, center]

        flat = x.reshape(b * t, h, w, c)
        if self.with_predeblur:
            l1 = _conv(nf, 1, dtype=self.dtype, name="conv_1x1")(
                PredeblurModule(nf, self.hr_in, self.dtype,
                                name="predeblur")(flat))
            if self.hr_in:
                h, w = h // self.upscale, w // self.upscale
        else:
            l1 = lrelu(_conv(nf, dtype=self.dtype, name="conv_first")(flat))
        for i in range(self.num_extract_block):
            l1 = ResidualBlockNoBN(nf, dtype=self.dtype,
                                   name=f"extract{i}")(l1)
        l2 = lrelu(_conv(nf, stride=2, dtype=self.dtype, name="conv_l2_1")(l1))
        l2 = lrelu(_conv(nf, dtype=self.dtype, name="conv_l2_2")(l2))
        l3 = lrelu(_conv(nf, stride=2, dtype=self.dtype, name="conv_l3_1")(l2))
        l3 = lrelu(_conv(nf, dtype=self.dtype, name="conv_l3_2")(l3))

        l1 = l1.reshape(b, t, h, w, nf)
        l2 = l2.reshape(b, t, h // 2, w // 2, nf)
        l3 = l3.reshape(b, t, h // 4, w // 4, nf)

        # PCD alignment: fold the frame axis into batch, broadcasting the
        # reference pyramid to every frame (one deform-conv pass for all t)
        ref = [l1[:, center], l2[:, center], l3[:, center]]
        nbr = [l1.reshape(b * t, h, w, nf),
               l2.reshape(b * t, h // 2, w // 2, nf),
               l3.reshape(b * t, h // 4, w // 4, nf)]
        ref_b = [jnp.repeat(r[:, None], t, axis=1).reshape(
            b * t, *r.shape[1:]) for r in ref]
        aligned = PCDAlignment(nf, self.deformable_groups, self.dtype,
                               name="pcd_align")(nbr, ref_b)
        aligned = aligned.reshape(b, t, h, w, nf)

        if self.with_tsa:
            feat = TSAFusion(nf, self.num_frame, center, self.dtype,
                             name="fusion")(aligned)
        else:
            feat = _conv(nf, 1, dtype=self.dtype, name="fusion")(
                aligned.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * nf))

        out = feat
        for i in range(self.num_reconstruct_block):
            out = ResidualBlockNoBN(nf, dtype=self.dtype,
                                    name=f"recon{i}")(out)

        n_up = int(math.log2(self.upscale))
        for i in range(n_up):
            f = nf if i < n_up - 1 else 64
            if self.upsample_mode == "upconv":
                from ..ops.blocks import nearest_up

                out = nearest_up(out, 2)
                out = lrelu(_conv(f, dtype=self.dtype,
                                  name=f"upconv{i+1}")(out))
            else:
                out = _conv(f * 4, dtype=self.dtype,
                            name=f"upconv{i+1}")(out)
                out = lrelu(depth_to_space(out, 2))
        out = lrelu(_conv(64, dtype=self.dtype, name="conv_hr")(out))
        out = _conv(self.num_out_ch, dtype=self.dtype, name="conv_last")(out)

        base = x_center if self.hr_in else interpolate(
            x_center, scale=self.upscale, mode="bilinear")
        return out + base.astype(out.dtype)
