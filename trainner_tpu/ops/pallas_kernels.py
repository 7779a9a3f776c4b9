"""Pallas TPU kernels for the framework's hot custom ops.

Currently: per-sample spatially-invariant blur (the degradation
pipeline's `apply_kernels`, ops/degradations.py). The XLA lowering of
that op is a grouped convolution with batch*channels feature groups —
group counts in the hundreds fragment the MXU tiling. This kernel keeps
the whole padded image tile in VMEM and accumulates the k*k taps as
shifted slice FMAs on the VPU (one grid step per batch element, channels
vectorized on the lane dimension).

Falls back to the XLA path automatically off-TPU (pallas interpret mode
is used in tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blur_kernel_body(img_ref, kern_ref, out_ref, *, k: int, h: int,
                      w: int):
    """img_ref: (h+k-1, w+k-1, c) padded sample; kern_ref: (k, k);
    out_ref: (h, w, c).

    Taps accumulate in a fori_loop with pl.ds dynamic slices (an unrolled
    k*k tap loop would blow up Mosaic compile time for k=21)."""
    kern = kern_ref[...]

    def body(t, acc):
        dy = t // k
        dx = t % k
        tap = img_ref[pl.ds(dy, h), pl.ds(dx, w), :].astype(jnp.float32)
        return acc + tap * kern[dy, dx]

    acc = jax.lax.fori_loop(0, k * k, body,
                            jnp.zeros(out_ref.shape, jnp.float32))
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blur_per_sample_pallas(x: jnp.ndarray, kernels: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Per-sample blur: x (b, h, w, c), kernels (b, k, k) -> (b, h, w, c).

    Matches ops/degradations.apply_kernels (reflect padding).
    """
    b, h, w, c = x.shape
    k = kernels.shape[-1]
    pad = k // 2
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)],
                 mode="reflect")

    kernel = functools.partial(_blur_kernel_body, k=k, h=h, w=w)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, h + k - 1, w + k - 1, c),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((None, k, k), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(xp, kernels)
