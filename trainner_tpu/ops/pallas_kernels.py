"""Pallas TPU kernels (EXPERIMENTAL).

Per-sample spatially-invariant blur (the degradation pipeline's
`apply_kernels`, ops/degradations.py): one grid step per batch element,
channels folded into the lane dim, k*k taps accumulated as dynamic
rolls + FMAs on the VPU.

Status (measured on TPU v5e, b=32 128px k=21): the XLA grouped-conv
lowering of apply_kernels runs 3.6 ms vs 4.8 ms for this kernel, so the
XLA path stays the production default. The on-device numerical
discrepancy was bisected on hardware (2026-08-17): pltpu.roll alone,
fori-varying roll shifts, and 2-index SMEM scalar reads are each EXACT;
a roll feeding a non-128-aligned static slice corrupts (err ~3.0) and
was eliminated (every block is now tile-aligned, the valid window
slices on the host) — yet the composite kernel still diverges on
hardware (err ~0.3 vs interpret/XLA), pointing at the remaining
combination: SMEM-scalar multiply x dynamic roll inside one fori body
under a batch grid. Use interpret=True (verified ==XLA) or the default
apply_kernels; kept as a documented Mosaic-repro scaffold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blur_kernel_body(kern_ref, img_ref, out_ref, *, k: int, c: int):
    """kern_ref: (b, k*k) kernel table in SMEM (dynamic scalar reads);
    img_ref: padded sample in VMEM with channels FOLDED INTO THE LANE
    DIM — a bare c=3 channel axis would pad to 128 lanes and blow VMEM
    42x; folded, a dx shift is a contiguous dx*c-offset lane slice.
    out_ref: the SAME aligned canvas — the valid (h, w*c) window is
    sliced on the host (rolls feeding non-128-aligned slices corrupt on
    hardware; everything here stays tile-aligned).

    Taps accumulate in a fori_loop with rolls (Mosaic rejects unaligned
    dynamic slice starts in tiled dims; an unrolled k*k tap loop would
    blow up Mosaic compile time for k=21)."""

    i = pl.program_id(0)

    img = img_ref[...].astype(jnp.float32)

    def body(t, acc):
        dy = t // k
        dx = t % k
        rolled = pltpu.roll(pltpu.roll(img, -dy, 0), -dx * c, 1)
        return acc + rolled * kern_ref[i, t]

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

    kernel = functools.partial(_blur_kernel_body, k=k, c=c)
    kern_flat = kernels.reshape(b, k * k).astype(jnp.float32)
    xp_folded = xp.reshape(b, h + k - 1, (w + k - 1) * c)
    # align to (8, 128) tiles for Mosaic; the roll windows never read the
    # zero padding within the valid (h, w*c) output region (dy+h <= hp,
    # dx*c + w*c <= wpc by construction). The kernel emits the FULL
    # aligned canvas; the valid window slices off on the host (rolls
    # feeding unaligned slices corrupt on hardware — see module docs).
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
            pl.BlockSpec((None, hp, wpc), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, hp, wpc), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, wpc), x.dtype),
        interpret=interpret,
    )(kern_flat, xp_folded)
    return out[:, :h, :w * c].reshape(b, h, w, c)
