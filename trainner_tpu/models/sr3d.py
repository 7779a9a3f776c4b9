"""SR3DNet: 3D-conv video SR (3DSRnet-style).

Behavioral equivalent of ref
codes/models/modules/architectures/SR3DNet_arch.py:8 — dense residually
connected 3D convs over (t, h, w), temporal 'VALID' padding in the last
convs to collapse the frame axis, + bicubic-upscaled center frame via
space_to_depth, then depth_to_space to HR.

TPU-first: NDHWC layout (b, t, h, w, c); Conv3D via flax nn.Conv with
3-tuple kernels (XLA maps to MXU-backed conv_general_dilated).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (bicubic_torch, depth_to_space,
                          space_to_depth)

Dtype = Any


class SR3DNet(nn.Module):
    """3D conv SR net (ref SR3DNet_arch.py:8).

    Input x: (b, n_frames, h, w, in_nc); output: (b, h*scale, w*scale,
    out_nc) for the center frame.
    """

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 3
    scale: int = 4
    n_frames: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, n, h, w, c = x.shape
        center = (n - 1) // 2
        feats = self.nf * self.in_nc
        lrelu = lambda v: nn.leaky_relu(v, 0.2)

        def conv3d(f, pad, name):
            return nn.Conv(f, (3, 3, 3), padding=pad, dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)

        # dense residual 3D conv stack; conv_c is ONE conv applied three
        # times with tied weights (ref SR3DNet_arch.py:44-47)
        conv_c = conv3d(feats, 1, "conv_c")
        conv1 = lrelu(conv3d(feats, 1, "conv_input")(x))
        conv2 = lrelu(conv_c(conv1)) + conv1
        conv3 = lrelu(conv_c(conv2)) + conv1 + conv2
        conv4 = lrelu(conv_c(conv3)) + conv1 + conv2 + conv3

        # temporal-VALID convs collapse the frame axis: conv_c2 (tied,
        # applied as needed: n=5 once, n=7 twice, ...) then scalec
        # (ref pads [0,1,1] on both, :30-31)
        tpad = [(0, 0), (1, 1), (1, 1)]
        h4 = conv4
        conv_c2 = conv3d(feats, tpad, "conv_c2")
        while h4.shape[1] > 3:
            h4 = lrelu(conv_c2(h4))
        out = lrelu(conv3d(self.out_nc * self.scale ** 2, tpad,
                           "scalec")(h4))
        out = out[:, out.shape[1] // 2]  # (b, h, w, out_nc*scale^2)

        # bicubic center frame, folded to LR grid via space_to_depth
        # torch-convention bicubic (a=-0.75), ref :60 align_corners=False
        bic = bicubic_torch(x[:, center], scale=self.scale)
        bic = space_to_depth(bic, self.scale)

        return depth_to_space(out + bic.astype(out.dtype), self.scale)
