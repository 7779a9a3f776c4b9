"""Pallas TPU kernels (EXPERIMENTAL).

Per-sample spatially-invariant blur (the degradation pipeline's
`apply_kernels`, ops/degradations.py): one grid step per batch element,
channels folded into the lane dim, k*k taps accumulated as dynamic
rolls + static-slice FMAs on the VPU.

Status (measured on TPU v5e, b=32 128px k=21): the XLA grouped-conv
lowering of apply_kernels runs 3.6 ms vs 4.8 ms for this kernel, so the
XLA path stays the production default; additionally the pltpu.roll
lowering disagrees numerically with interpret mode on-device (under
investigation) — use interpret=True (fully verified against XLA) or the
default apply_kernels. Kept as the scaffold for future degradation-op
fusion (blur+noise+quantize in one VMEM pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blur_kernel_body(kern_ref, img_ref, out_ref, *, k: int, h: int,
                      w: int, c: int):
    """kern_ref: (b, k*k) kernel table in SMEM (dynamic scalar reads);
    img_ref: (h+k-1, (w+k-1)*c) padded sample in VMEM with channels
    FOLDED INTO THE LANE DIM — a bare c=3 channel axis would pad to 128
    lanes and blow VMEM 42x; folded, a dx shift is a contiguous
    dx*c-offset lane slice. out_ref: (h, w*c).

    Taps accumulate in a fori_loop with pl.ds dynamic slices (an unrolled
    k*k tap loop would blow up Mosaic compile time for k=21)."""

    i = pl.program_id(0)

    img = img_ref[...].astype(jnp.float32)

    def body(t, acc):
        dy = t // k
        dx = t % k
        # dynamic shifts via roll (Mosaic rejects unaligned dynamic
        # slice starts in tiled dims); static [0:h, 0:w*c] slice after
        rolled = pltpu.roll(pltpu.roll(img, -dy, 0), -dx * c, 1)
        return acc + rolled[:h, :w * c] * kern_ref[i, t]

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

    kernel = functools.partial(_blur_kernel_body, k=k, h=h, w=w, c=c)
    kern_flat = kernels.reshape(b, k * k).astype(jnp.float32)
    xp_folded = xp.reshape(b, h + k - 1, (w + k - 1) * c)
    # align to (8, 128) tiles for Mosaic; the roll windows never read the
    # zero padding (dy+h <= hp, dx*c + w*c <= wpc by construction)
    hp = -(-(h + k - 1) // 8) * 8
    wpc = -(-((w + k - 1) * c) // 128) * 128
    xp_folded = jnp.pad(xp_folded, [(0, 0), (0, hp - xp_folded.shape[1]),
                                    (0, wpc - xp_folded.shape[2])])
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            # whole (b, k*k) kernel table in SMEM (indexed by program_id;
            # SMEM blocks must equal the full array dims)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, xp_folded.shape[1], xp_folded.shape[2]),
                         lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, h, w * c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), x.dtype),
        interpret=interpret,
    )(kern_flat, xp_folded)
    return out.reshape(b, h, w, c)
