"""Pallas TPU kernels.

1) rdb5c_canvas — the north-star fused ESRGAN residual-dense-block
   kernel (ref RRDBNet_arch.py:98): the whole packed 5C chain
   (conv+bias+LeakyReLU x4 + residual) runs VMEM-resident per sample as
   five implicit-GEMM stages. See the function docstring for the design.
   HARDWARE-VERIFIED (v5e, 2026-08-17): f32 bit-exact vs the XLA packed
   forward; bf16 within rounding (2.9e-3). Chained timing at b=32 32px:
   pallas 0.62 ms vs XLA 0.56 ms per RDB-5C (both ~14% MFU) — XLA stays
   the production forward; the canvas formulation exists for the fused
   BACKWARD (rdb5c_canvas_bwd), where XLA's sliced transposed-conv
   lowering is the actual bottleneck.

2) blur_per_sample_pallas — per-sample spatially-invariant blur (the
   degradation pipeline's `apply_kernels`, ops/degradations.py): one grid
   step per batch element, channels folded into the lane dim, k*k taps
   accumulated as dynamic rolls + FMAs on the VPU.

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Fused residual-dense-block (5C) kernel — the RRDB hot path
# ---------------------------------------------------------------------------


def _rdb5c_kernel_body(mask_ref, x_ref, wx_ref, w1_ref, w2_ref, w3_ref,
                       w4_ref, b1_ref, b2_ref, b3_ref, b4_ref, b5_ref,
                       out_ref, c1_ref, c2_ref, c3_ref, c4_ref,
                       *, wc: int, nf: int, gc: int):
    """One batch sample per grid step; the full packed 5C chain stays in
    VMEM between stages.

    Layout: activations live on a flat zero-ring CANVAS of
    R=(H+2)(W+2) rows (sublanes) x channels (lanes). A 3x3 conv then
    becomes an implicit GEMM: the im2col operand is built as a VALUE by
    concatenating nine sublane-rolls of the plane along lanes (one roll
    per tap; interior rows never wrap), and contracted in ONE MXU matmul
    of depth 9*Cin (=576/288 — full 128-deep MXU passes, vs the
    gc=32-deep contractions XLA emits for the naive chain) with the
    packed "scatter-to-future" weights (models/rrdb._rdb_pack_kernels),
    so outputs are 192/160/128/96/64 wide.

    The ring rows compute garbage (rolled wrap) and are re-zeroed with
    `mask` after each stage — a zero ring IS the next stage's zero
    padding, which keeps the canvas chainable with no memory slicing
    (non-128-aligned memory slices miscompute on this hardware; value
    ops — rolls, concats, column splits — are used instead).
    """
    f32 = jnp.float32
    mask = mask_ref[...]                       # (R, 1) f32 interior mask
    x = x_ref[...]                             # (R, nf) bf16/f32

    def im2col(plane, c):
        # tap t=(dy,dx): out[p] = plane[p + (dy-1)*wc + (dx-1)];
        # pltpu.roll needs a non-negative shift, so roll cyclically by
        # (-s) mod R — interior rows never read wrapped data, and ring
        # rows are re-masked after every stage. Mosaic's rotate only
        # handles 32-bit lanes, so bf16 planes roll as f32 and cast back
        # for the MXU contraction.
        rows = plane.shape[0]
        p32 = plane.astype(jnp.float32)
        cols = []
        for t in range(9):
            s = (t // 3 - 1) * wc + (t % 3 - 1)
            # cast each column back BEFORE the concat: the concatenated
            # im2col value is the largest live buffer (rows x 9*Cin) and
            # must stay in the compute dtype to fit VMEM at ns>1
            cols.append(pltpu.roll(p32, (-s) % rows, 0
                                   ).astype(plane.dtype))
        return jnp.concatenate(cols, axis=-1)

    def lrelu(v):
        return jnp.where(v >= 0, v, v * 0.2)

    dt = x.dtype
    p = jnp.dot(im2col(x, nf), wx_ref[...], preferred_element_type=f32)
    p1 = p[:, :gc]
    p2 = p[:, gc:2 * gc]
    p3 = p[:, 2 * gc:3 * gc]
    p4 = p[:, 3 * gc:4 * gc]
    p5 = p[:, 4 * gc:]
    c1 = (lrelu(p1 + b1_ref[...]) * mask).astype(dt)
    c1_ref[...] = c1
    q = jnp.dot(im2col(c1, gc), w1_ref[...], preferred_element_type=f32)
    c2 = (lrelu(p2 + q[:, :gc] + b2_ref[...]) * mask).astype(dt)
    c2_ref[...] = c2
    q13, q14, q15 = q[:, gc:2 * gc], q[:, 2 * gc:3 * gc], q[:, 3 * gc:]
    q = jnp.dot(im2col(c2, gc), w2_ref[...], preferred_element_type=f32)
    c3 = (lrelu(p3 + q13 + q[:, :gc] + b3_ref[...]) * mask).astype(dt)
    c3_ref[...] = c3
    q24, q25 = q[:, gc:2 * gc], q[:, 2 * gc:]
    q = jnp.dot(im2col(c3, gc), w3_ref[...], preferred_element_type=f32)
    c4 = (lrelu(p4 + q14 + q24 + q[:, :gc] + b4_ref[...]) * mask
          ).astype(dt)
    c4_ref[...] = c4
    q35 = q[:, gc:]
    q45 = jnp.dot(im2col(c4, gc), w4_ref[...], preferred_element_type=f32)
    c5 = p5 + q15 + q25 + q35 + q45 + b5_ref[...]
    # masked residual: x's ring/pad rows are already zero, so the output
    # canvas keeps a zero ring and chains into the next 5C directly
    out_ref[...] = (c5 * mask * 0.2 + x.astype(f32)).astype(dt)


def _canvas_geometry(h: int, w: int, dtype) -> tuple:
    r = (h + 2) * (w + 2)
    sub = 16 if dtype == jnp.bfloat16 else 8
    rp = -(-r // sub) * sub
    return r, rp


def canvas_mask(h: int, w: int, rp: int) -> jnp.ndarray:
    """(rp, 1) f32 mask of interior canvas rows."""
    idx = np.arange(rp)
    i, j = idx // (w + 2), idx % (w + 2)
    m = ((i >= 1) & (i <= h) & (j >= 1) & (j <= w)
         & (idx < (h + 2) * (w + 2)))
    return jnp.asarray(m.astype(np.float32)[:, None])


def to_canvas(x: jnp.ndarray, rp: int) -> jnp.ndarray:
    """(b, h, w, c) -> flat zero-ring canvas (b, rp, c)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    xf = xp.reshape(b, (h + 2) * (w + 2), c)
    return jnp.pad(xf, [(0, 0), (0, rp - xf.shape[1]), (0, 0)])


def from_canvas(xc: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of to_canvas: (b, rp, c) -> (b, h, w, c)."""
    b, _, c = xc.shape
    xp = xc[:, :(h + 2) * (w + 2)].reshape(b, h + 2, w + 2, c)
    return xp[:, 1:h + 1, 1:w + 1]


def _pack9(w: jnp.ndarray, dt) -> jnp.ndarray:
    """HWIO (3,3,ci,co) -> im2col weight (9*ci, co), tap-major (matches
    the kernel's concat order)."""
    return w.reshape(9 * w.shape[2], w.shape[3]).astype(dt)


def _auto_ns(b: int, rp: int, dt) -> int:
    """Samples fused per grid step: pack ns canvases into one (ns*rp)-row
    block so each stage's implicit GEMM has ns x the rows (M=1168 alone
    underfeeds the MXU pipeline). Rolls wrap across sample boundaries
    only inside ring rows, which are re-masked after every stage, so the
    kernel body is unchanged. Cap: the largest im2col value
    (ns*rp, 9*nf) must stay well inside ~16 MB VMEM."""
    itemsize = 2 if dt == jnp.bfloat16 else 4
    cap = 4 if itemsize == 2 else 2
    ns = 1
    for c in (2, 4, 8):
        if c <= cap and b % c == 0:
            ns = c
    return ns


@functools.partial(jax.jit, static_argnames=("h", "w", "nf", "gc",
                                             "interpret", "ns"))
def rdb5c_canvas(xc: jnp.ndarray, packed: tuple, biases: tuple,
                 h: int, w: int, nf: int = 64, gc: int = 32,
                 interpret: bool = None, ns: int = 0) -> tuple:
    """Run the fused 5C chain on canvases.

    xc: (b, rp, nf) canvas (to_canvas). packed: the five packed kernels
    from models/rrdb._rdb_pack_kernels, HWIO. biases: (b1..b5).
    Returns (out_canvas, c1_canvas, .., c4_canvas) — out chains directly
    into the next 5C; c1..c4 are the VJP residuals (interior-masked).
    ns: samples packed per grid step (0 = auto, see _auto_ns).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, rp, _ = xc.shape
    dt = xc.dtype
    if not ns:
        ns = _auto_ns(b, rp, dt)
    if b % ns:
        ns = 1
    bg, rg = b // ns, ns * rp   # grid steps x rows per step
    wx, w1p, w2p, w3p, w4p = (_pack9(p, dt) for p in packed)
    b1, b2, b3, b4, b5 = (jnp.asarray(v, jnp.float32)[None, :]
                          for v in biases)
    # per-sample-periodic interior mask (ring rows of EVERY packed
    # sample re-zero each stage; cross-sample roll wrap lands only there)
    mask = jnp.tile(canvas_mask(h, w, rp), (ns, 1))
    kern = functools.partial(_rdb5c_kernel_body, wc=w + 2, nf=nf, gc=gc)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    per_b = lambda c: pl.BlockSpec((None, rg, c), lambda i: (i, 0, 0))
    flops = 2 * b * rp * 9 * (nf * (4 * gc + nf) + gc * (3 * gc + nf)
                              + gc * (2 * gc + nf) + gc * (gc + nf)
                              + gc * nf)
    out, c1, c2, c3, c4 = pl.pallas_call(
        kern,
        grid=(bg,),
        in_specs=[
            const(mask.shape),
            per_b(nf),
            const(wx.shape), const(w1p.shape), const(w2p.shape),
            const(w3p.shape), const(w4p.shape),
            const(b1.shape), const(b2.shape), const(b3.shape),
            const(b4.shape), const(b5.shape),
        ],
        out_specs=[per_b(nf), per_b(gc), per_b(gc), per_b(gc),
                   per_b(gc)],
        out_shape=[
            jax.ShapeDtypeStruct((bg, rg, nf), dt),
            jax.ShapeDtypeStruct((bg, rg, gc), dt),
            jax.ShapeDtypeStruct((bg, rg, gc), dt),
            jax.ShapeDtypeStruct((bg, rg, gc), dt),
            jax.ShapeDtypeStruct((bg, rg, gc), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * b * rp * (2 * nf + 4 * gc),
            transcendentals=0),
        # default scoped-vmem limit is 16 MB; v5e has 128 MB physical —
        # raise it so ns>1 packing fits (measured: ns=4 bf16 needs ~35 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(mask, xc.reshape(bg, rg, -1), wx, w1p, w2p, w3p, w4p,
      b1, b2, b3, b4, b5)
    return tuple(v.reshape(b, rp, -1) for v in (out, c1, c2, c3, c4))


def _rdb5c_bwd_kernel_body(mask_ref, g_ref, x_ref, c1_ref, c2_ref, c3_ref,
                           c4_ref, wx_ref, w1_ref, w2_ref, w3_ref, w4_ref,
                           vx_ref, v1_ref, v2_ref, v3_ref, v4_ref,
                           dx_ref, dwx_ref, dw1_ref, dw2_ref, dw3_ref,
                           dw4_ref, db1_ref, db2_ref, db3_ref, db4_ref,
                           db5_ref, *, wc: int, nf: int, gc: int):
    """Fused backward of the packed 5C chain, one sample per grid step.

    Mirrors models/rrdb._rdb5c_fused_bwd but stays VMEM-resident:
    each stage's input-gradient is a transposed conv realized as a
    reverse-im2col GEMM (im2col with +s_t shifts against the
    host-pre-transposed weight table V[t] = W[t]^T), and each stage's
    weight gradient is a row-contraction GEMM im2col(act)^T @ dY.
    Weight/bias grads accumulate across the (sequential) batch grid into
    constant-index output blocks; dx is per-sample.
    """
    f32 = jnp.float32
    mask = mask_ref[...]                      # (R, 1) f32
    x = x_ref[...]
    dt = x.dtype
    rows = x.shape[0]

    def imc(plane, sign):
        # sign=-1: forward im2col (col_t[p] = plane[p + s_t]);
        # sign=+1: reverse (col_t[p] = plane[p - s_t]) for the adjoint.
        # Columns cast back to dt individually (VMEM, see fwd body).
        p32 = plane.astype(f32)
        cols = []
        for t in range(9):
            s = (t // 3 - 1) * wc + (t % 3 - 1)
            cols.append(pltpu.roll(p32, (sign * s) % rows, 0
                                   ).astype(dt))
        return jnp.concatenate(cols, axis=-1)

    def dmask(c):  # lrelu' from the post-activation sign
        return jnp.where(c >= 0, jnp.asarray(1.0, f32),
                         jnp.asarray(0.2, f32))

    def rowsum(v):
        return jnp.sum(v.astype(f32), axis=0, keepdims=True)

    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _init():
        for ref in (dwx_ref, dw1_ref, dw2_ref, dw3_ref, dw4_ref,
                    db1_ref, db2_ref, db3_ref, db4_ref, db5_ref):
            ref[...] = jnp.zeros_like(ref)

    g = g_ref[...].astype(f32)
    dc5 = (g * mask) * 0.2                               # (R, nf) f32
    db5_ref[...] += rowsum(dc5)
    dc5 = dc5.astype(dt)

    c4 = c4_ref[...]
    dw4_ref[...] += jnp.dot(imc(c4, -1).T, dc5,
                            preferred_element_type=f32)
    dc4 = jnp.dot(imc(dc5, +1), v4_ref[...],
                  preferred_element_type=f32)
    da4 = (dc4 * dmask(c4.astype(f32)) * mask).astype(dt)
    db4_ref[...] += rowsum(da4)

    c3 = c3_ref[...]
    dy3 = jnp.concatenate([da4, dc5], axis=-1)           # (R, gc+nf)
    dw3_ref[...] += jnp.dot(imc(c3, -1).T, dy3,
                            preferred_element_type=f32)
    dc3 = jnp.dot(imc(dy3, +1), v3_ref[...],
                  preferred_element_type=f32)
    da3 = (dc3 * dmask(c3.astype(f32)) * mask).astype(dt)
    db3_ref[...] += rowsum(da3)

    c2 = c2_ref[...]
    dy2 = jnp.concatenate([da3, da4, dc5], axis=-1)
    dw2_ref[...] += jnp.dot(imc(c2, -1).T, dy2,
                            preferred_element_type=f32)
    dc2 = jnp.dot(imc(dy2, +1), v2_ref[...],
                  preferred_element_type=f32)
    da2 = (dc2 * dmask(c2.astype(f32)) * mask).astype(dt)
    db2_ref[...] += rowsum(da2)

    c1 = c1_ref[...]
    dy1 = jnp.concatenate([da2, da3, da4, dc5], axis=-1)
    dw1_ref[...] += jnp.dot(imc(c1, -1).T, dy1,
                            preferred_element_type=f32)
    dc1 = jnp.dot(imc(dy1, +1), v1_ref[...],
                  preferred_element_type=f32)
    da1 = (dc1 * dmask(c1.astype(f32)) * mask).astype(dt)
    db1_ref[...] += rowsum(da1)

    dy0 = jnp.concatenate([da1, da2, da3, da4, dc5], axis=-1)
    dwx_ref[...] += jnp.dot(imc(x, -1).T, dy0,
                            preferred_element_type=f32)
    dxc = jnp.dot(imc(dy0, +1), vx_ref[...],
                  preferred_element_type=f32)
    # identity path of out = c5*mask*0.2 + x; ring rows of dx carry g's
    # ring garbage, which chained bwd calls re-mask at entry and
    # from_canvas's VJP drops at the chain end
    dx_ref[...] = (dxc + g).astype(dt)


def _vtab(w: jnp.ndarray, dt) -> jnp.ndarray:
    """Packed HWIO (3,3,ci,co) -> reverse-GEMM table (9*co, ci) with
    V[t] = W[t]^T (tap-major, matching imc(+1)'s concat order)."""
    w9 = w.reshape(9, w.shape[2], w.shape[3])
    return w9.transpose(0, 2, 1).reshape(-1, w.shape[2]).astype(dt)


@functools.partial(jax.jit, static_argnames=("h", "w", "nf", "gc",
                                             "interpret", "ns"))
def rdb5c_canvas_bwd(g: jnp.ndarray, xc: jnp.ndarray, c1: jnp.ndarray,
                     c2: jnp.ndarray, c3: jnp.ndarray, c4: jnp.ndarray,
                     packed: tuple, h: int, w: int, nf: int = 64,
                     gc: int = 32, interpret: bool = None,
                     ns: int = 0) -> tuple:
    """Fused backward pass on canvases.

    g: (b, rp, nf) cotangent canvas; xc/c1..c4: the forward residuals
    (rdb5c_canvas outputs). packed: the five packed HWIO kernels.
    Returns (dx_canvas, dwx, dw1p, dw2p, dw3p, dw4p, db1..db5) with
    weight grads in PACKED layout (f32) — unpack with
    models/rrdb unpacking or rdb5c_unpack_wgrads.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, rp, _ = xc.shape
    dt = xc.dtype
    if not ns:
        # bwd keeps ~2x the live buffers of fwd; halve the packing
        ns = max(_auto_ns(b, rp, dt) // 2, 1)
    if b % ns:
        ns = 1
    bg, rg = b // ns, ns * rp
    g, xc, c1, c2, c3, c4 = (v.reshape(bg, rg, -1)
                             for v in (g, xc, c1, c2, c3, c4))
    wx, w1p, w2p, w3p, w4p = (_pack9(p, dt) for p in packed)
    vx, v1, v2, v3, v4 = (_vtab(p, dt) for p in packed)
    mask = jnp.tile(canvas_mask(h, w, rp), (ns, 1))
    kern = functools.partial(_rdb5c_bwd_kernel_body, wc=w + 2, nf=nf,
                            gc=gc)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    per_b = lambda c: pl.BlockSpec((None, rg, c), lambda i: (i, 0, 0))
    n_q = (nf * (4 * gc + nf) + gc * (3 * gc + nf) + gc * (2 * gc + nf)
           + gc * (gc + nf) + gc * nf)
    res = pl.pallas_call(
        kern,
        grid=(bg,),
        in_specs=[
            const(mask.shape),
            per_b(nf), per_b(nf), per_b(gc), per_b(gc), per_b(gc),
            per_b(gc),
            const(wx.shape), const(w1p.shape), const(w2p.shape),
            const(w3p.shape), const(w4p.shape),
            const(vx.shape), const(v1.shape), const(v2.shape),
            const(v3.shape), const(v4.shape),
        ],
        out_specs=[
            per_b(nf),
            const(wx.shape), const(w1p.shape), const(w2p.shape),
            const(w3p.shape), const(w4p.shape),
            const((1, gc)), const((1, gc)), const((1, gc)),
            const((1, gc)), const((1, nf)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bg, rg, nf), dt),
            jax.ShapeDtypeStruct(wx.shape, jnp.float32),
            jax.ShapeDtypeStruct(w1p.shape, jnp.float32),
            jax.ShapeDtypeStruct(w2p.shape, jnp.float32),
            jax.ShapeDtypeStruct(w3p.shape, jnp.float32),
            jax.ShapeDtypeStruct(w4p.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, gc), jnp.float32),
            jax.ShapeDtypeStruct((1, gc), jnp.float32),
            jax.ShapeDtypeStruct((1, gc), jnp.float32),
            jax.ShapeDtypeStruct((1, gc), jnp.float32),
            jax.ShapeDtypeStruct((1, nf), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * rp * 9 * n_q,
            bytes_accessed=2 * b * rp * (3 * nf + 8 * gc),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(mask, g, xc, c1, c2, c3, c4, wx, w1p, w2p, w3p, w4p,
      vx, v1, v2, v3, v4)
    dx = res[0].reshape(b, rp, -1)
    dws = res[1:6]
    dbs = tuple(v[0] for v in res[6:])
    return (dx,) + tuple(dws) + dbs


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

    GUARDED on TPU: the compiled kernel is KNOWN-WRONG on real hardware
    (err ~0.3 vs interpret/XLA; Mosaic bisection in the module
    docstring) and the XLA grouped-conv path is faster anyway — so
    compiling it onto a chip raises unless
    TRAINNER_PALLAS_BLUR_UNSAFE=1 (Mosaic-debugging escape hatch).
    interpret=True (verified == XLA) is always allowed.
    """
    import os

    if (not interpret and jax.default_backend() == "tpu"
            and os.environ.get("TRAINNER_PALLAS_BLUR_UNSAFE") != "1"):
        raise RuntimeError(
            "blur_per_sample_pallas miscomputes when COMPILED on TPU "
            "(known Mosaic issue, see ops/pallas_kernels.py docstring). "
            "Use ops.degradations.apply_kernels (the faster production "
            "path), interpret=True, or set TRAINNER_PALLAS_BLUR_UNSAFE=1 "
            "to debug the Mosaic repro.")
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
