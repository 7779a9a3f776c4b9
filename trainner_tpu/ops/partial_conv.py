"""Partial convolution (mask-normalized conv, Liu et al. 2018).

Behavioral equivalent of ref
codes/models/modules/architectures/convolutions/partialconv2d.py:16
(PartialConv2d): convolve the masked input, renormalize each output
position by slide_winsize / (valid taps under the window), and zero
positions whose window saw no valid pixels. Selected in the reference's
conv_block via convtype='PartialConv2D' (ref block.py:214).

TPU-first notes: the mask path is a single-channel ones-kernel
convolution — a static, gradient-free companion conv that XLA folds into
the same fusion cluster; with mask_in=None the mask depends only on the
spatial shape, so under jit it constant-folds to a precomputed border
renormalization map.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class PartialConv(nn.Module):
    """NHWC partial convolution.

    When `mask_in` is None an all-ones mask is assumed, so the zero
    padding itself is the only invalid region — the layer then acts as a
    border-renormalized conv (the reference uses exactly this to avoid
    padding artifacts).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    pad: int = 0  # explicit zero pad applied to x AND the mask
    kernel_init: Any = nn.initializers.lecun_normal()
    return_mask: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask_in: Optional[jnp.ndarray] = None):
        k, s, d, p = self.kernel_size, self.stride, self.dilation, self.pad
        b, h, w, _ = x.shape
        if mask_in is None:
            mask = jnp.ones((1, h, w, 1), jnp.float32)
        else:
            mask = mask_in.astype(jnp.float32)
        x = x * mask.astype(x.dtype)
        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (p, p), (p, p), (0, 0)))

        conv = nn.Conv(self.features, (k, k), strides=(s, s),
                       padding="VALID", kernel_dilation=(d, d),
                       use_bias=False, kernel_init=self.kernel_init,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")
        raw = conv(x)

        # valid-tap count per output position (no params, no gradient)
        ones_k = jnp.ones((k, k, 1, 1), jnp.float32)
        mask_sum = jax.lax.stop_gradient(jax.lax.conv_general_dilated(
            mask, ones_k, window_strides=(s, s), padding="VALID",
            rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        slide_winsize = float(k * k)
        update_mask = jnp.clip(mask_sum, 0.0, 1.0)
        ratio = (slide_winsize / jnp.maximum(mask_sum, 1e-8)) * update_mask

        out = raw * ratio.astype(raw.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = (out + bias.astype(out.dtype)) \
                * update_mask.astype(out.dtype)
        if self.return_mask:
            return out, update_mask
        return out
