"""DVDNet: real-time deep video deinterlacing.

Behavioral equivalent of ref
codes/models/modules/architectures/DVDNet_arch.py:37 (DVDNet),
vertical_upscale:4, replace_field:17 — shared feature trunk, two branches
predicting the missing field (vertical stride-2 conv), then field
re-interleaving with the known input field.

TPU-first: NHWC; field interleave as stack+reshape (static, fusible).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def vertical_upscale(x: jnp.ndarray, upfield: bool = True) -> jnp.ndarray:
    """Insert zero rows: x (b,h,w,c) -> (b,2h,w,c), data on even rows if
    upfield else odd rows (ref DVDNet_arch.py:4)."""
    z = jnp.zeros_like(x)
    pair = (x, z) if upfield else (z, x)
    b, h, w, c = x.shape
    return jnp.stack(pair, axis=2).reshape(b, 2 * h, w, c)


def replace_field(x: jnp.ndarray, input_image: jnp.ndarray,
                  upfield: bool = True) -> jnp.ndarray:
    """Combine predicted half-height field with the retained input field
    (ref DVDNet_arch.py:17)."""
    upper = input_image[:, 0::2]
    lower = input_image[:, 1::2]
    if upfield:
        return vertical_upscale(x, upfield=False) + \
            vertical_upscale(upper, upfield=True)
    return vertical_upscale(x, upfield=True) + \
        vertical_upscale(lower, upfield=False)


class DVDNet(nn.Module):
    """Deinterlacer predicting both output fields (ref DVDNet_arch.py:37).

    Returns (top_frame, bottom_frame), each full-height.
    """

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        def conv(f, k, name, stride=(1, 1)):
            return nn.Conv(f, (k, k), strides=stride,
                           padding=(k - 1) // 2, dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)

        h = nn.relu(conv(self.nf, 3, "fea1")(x))
        h = nn.relu(conv(self.nf, 3, "fea2")(h))
        h = conv(self.nf // 2, 1, "fea3")(h)

        y = conv(self.nf // 2, 3, "branch_top")(h)
        y = conv(self.out_nc, 3, "final_top", stride=(2, 1))(y)
        z = conv(self.nf // 2, 3, "branch_bottom")(h)
        z = conv(self.out_nc, 3, "final_bottom", stride=(2, 1))(z)

        return replace_field(y, x, upfield=True), \
            replace_field(z, x, upfield=False)
