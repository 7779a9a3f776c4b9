"""RRDB / ESRGAN generator family (TPU-native Flax, NHWC).

Behavioral equivalents of ref
codes/models/modules/architectures/RRDBNet_arch.py:
  RRDBNet:14 (original ESRGAN arch), RRDB:62, ResidualDenseBlock_5C:98
  (residual x0.2, ESRGAN+ conv1x1 plus-path :153-158, latent GaussianNoise
  :126), MRRDBNet:171 (modified/"new" arch).

TPU-first notes: NHWC layout, channel concat on the last axis, nearest
upsampling as broadcast-reshape (exact + cheap), mixed-precision `dtype`
on all convs with f32 params. Module names are stable so the .pth interop
loader (utils/torch_interop.py) can map reference checkpoints 1:1.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (
    ConvBlock,
    GaussianNoise,
    PixelShuffleBlock,
    UpconvBlock,
    finalact,
    kaiming_init,
)

Dtype = Any
_cat = partial(jnp.concatenate, axis=-1)


class _ConvP(nn.Module):
    """Declares nn.Conv-compatible params (kernel HWIO + bias) WITHOUT
    running a convolution — same names/shapes/init as ConvBlock's inner
    nn.Conv so the .pth interop tree and fresh-init draws are identical.
    Used by the fused RDB fast path, which consumes the raw weights."""

    features: int
    in_features: int
    k: int = 3

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", kaiming_init(0.1),
                            (self.k, self.k, self.in_features,
                             self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _NamedConvP(nn.Module):
    """Scope shim: child named 'Conv_0' so the param path matches
    ConvBlock(name=X) -> auto-named nn.Conv = X/Conv_0/{kernel,bias}."""

    features: int
    in_features: int
    k: int = 3

    @nn.compact
    def __call__(self):
        return _ConvP(self.features, self.in_features, self.k,
                      name="Conv_0")()


def _conv3(x, kernel, dtype):
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    return jax.lax.conv_general_dilated(
        xp, kernel.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)


# ---------------------------------------------------------------------------
# packed 5C chain with a hand-packed VJP
#
# XLA's autodiff of the packed forward fragments the backward into narrow
# slice/pad chains (measured 47 ms bwd vs 21 ms fwd at b=32/nb=23 on v5e,
# erasing the packing win). The custom VJP below drives the SAME five
# packed convs through their conv-vjps in reverse, so the backward's
# dx transposed-convs contract over the packed-wide axis and the dW
# contractions emit packed-wide outputs — the backward inherits the
# forward's MXU utilization instead of XLA's sliced transpose.
# ---------------------------------------------------------------------------


def _rdb_pack_kernels(w1, w2, w3, w4, w5, nf, gc):
    """The five packed kernels of the scatter-to-future rewrite: per
    stage, every downstream conv's input-channel slice for that stage's
    features, concatenated along the output axis."""
    def sl(w, a, b):
        return w[:, :, a:b]

    wx = _cat([w1, sl(w2, 0, nf), sl(w3, 0, nf), sl(w4, 0, nf),
               sl(w5, 0, nf)])
    a1 = nf
    w1p = _cat([sl(w2, a1, a1 + gc), sl(w3, a1, a1 + gc),
                sl(w4, a1, a1 + gc), sl(w5, a1, a1 + gc)])
    a2 = nf + gc
    w2p = _cat([sl(w3, a2, a2 + gc), sl(w4, a2, a2 + gc),
                sl(w5, a2, a2 + gc)])
    a3 = nf + 2 * gc
    w3p = _cat([sl(w4, a3, a3 + gc), sl(w5, a3, a3 + gc)])
    a4 = nf + 3 * gc
    w4p = sl(w5, a4, a4 + gc)
    return wx, w1p, w2p, w3p, w4p


def _rdb5c_fwd_impl(dt, nf, gc, x, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5):
    # max(v, 0.2v) == leaky_relu(v, 0.2): a single select-free VPU op the
    # TPU backend fuses into the conv output (nn.leaky_relu's where+ge
    # lowered to standalone 769 GB/s elementwise loops, ~2.3 ms/step on
    # the nb=23 bench — see docs/performance.md round-3 trace).
    # Default ON; TRAINNER_FUSED_LRELU=0 restores nn.leaky_relu
    # (compile-cache knob for the remote relay; bit-identical math
    # either way).
    import os

    if os.environ.get("TRAINNER_FUSED_LRELU", "1") != "0":
        lrelu = lambda v: jnp.maximum(v, v * jnp.asarray(0.2, v.dtype))
    else:
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
    x = x.astype(dt)
    wx, w1p, w2p, w3p, w4p = _rdb_pack_kernels(w1, w2, w3, w4, w5, nf, gc)
    # TRAINNER_RDB_FWD: "packed" leaves fusion to XLA; "bar5" pins the
    # c5 sum as elementwise work. Without the barrier, XLA's algebraic
    # simplifier recognizes p5+q15+q25+q35+q45 as conv([x|c1..c4], w5)
    # (the packed kernels are slices of w5) and REBUILDS the dense
    # K=1728/N=64 conv5, re-reading all four wide stage tensors to
    # recompute c1..c4 in its prologue — measured 0.92 ms/RDB in the
    # r5 infer trace (b=16 128px, v5e).
    mode = os.environ.get("TRAINNER_RDB_FWD", "packed")
    if mode in ("barw", "barcw"):
        wx, w1p, w2p, w3p, w4p = jax.lax.optimization_barrier(
            (wx, w1p, w2p, w3p, w4p))
    barc = (lambda v: jax.lax.optimization_barrier(v)) \
        if mode in ("barc", "barcw") else (lambda v: v)
    p = _conv3(x, wx, dt)
    p1, p2, p3, p4, p5 = jnp.split(p, [gc, 2 * gc, 3 * gc, 4 * gc], -1)
    c1 = barc(lrelu(p1 + b1.astype(dt)))
    q = _conv3(c1, w1p, dt)
    q12, q13, q14, q15 = jnp.split(q, [gc, 2 * gc, 3 * gc], -1)
    c2 = barc(lrelu(p2 + q12 + b2.astype(dt)))
    q = _conv3(c2, w2p, dt)
    q23, q24, q25 = jnp.split(q, [gc, 2 * gc], -1)
    c3 = barc(lrelu(p3 + q13 + q23 + b3.astype(dt)))
    q = _conv3(c3, w3p, dt)
    q34, q35 = jnp.split(q, [gc], -1)
    c4 = barc(lrelu(p4 + q14 + q24 + q34 + b4.astype(dt)))
    q45 = _conv3(c4, w4p, dt)
    if mode == "bar5":
        p5, q15, q25, q35, q45 = jax.lax.optimization_barrier(
            (p5, q15, q25, q35, q45))
    c5 = p5 + q15 + q25 + q35 + q45 + b5.astype(dt)
    out = c5 * 0.2 + x
    return out, (x, c1, c2, c3, c4)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def rdb5c_fused(dt, nf, gc, x, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5):
    return _rdb5c_fwd_impl(dt, nf, gc, x, w1, b1, w2, b2, w3, b3,
                           w4, b4, w5, b5)[0]


def _rdb5c_fused_fwd(dt, nf, gc, x, w1, b1, w2, b2, w3, b3, w4, b4,
                     w5, b5):
    out, res = _rdb5c_fwd_impl(dt, nf, gc, x, w1, b1, w2, b2, w3, b3,
                               w4, b4, w5, b5)
    # zero-size dtype token: residuals must be JAX types (nn.scan
    # threads them through lax.scan)
    return out, (jnp.zeros((0,), x.dtype), *res, w1, w2, w3, w4, w5)


def _dmask(c, dt):  # lrelu' from the activation sign (lrelu preserves it)
    return jnp.where(c >= 0, jnp.asarray(1.0, dt), jnp.asarray(0.2, dt))


def _dbias(da):
    return jnp.sum(da.astype(jnp.float32), axis=(0, 1, 2))


def _conv3_t(dy, w, dt):
    """vjp of the stride-1 SAME 3x3 conv wrt its input: correlate the
    cotangent with the spatially-flipped, IO-swapped kernel."""
    return _conv3(dy, jnp.flip(w, (0, 1)).swapaxes(2, 3).astype(dt), dt)


def _conv3_dw(xin, dy, w_shape, dt):
    """vjp of the SAME 3x3 conv wrt its kernel (the conv is linear in the
    kernel, so a zeros primal is fine; XLA DCEs the unused primal)."""
    _, vjp = jax.vjp(lambda ww: _conv3(xin, ww, dt),
                     jnp.zeros(w_shape, jnp.float32))
    return vjp(dy.astype(dt))[0]


def _bwd_packed(dt, nf, gc, res, g):
    """Round-2 backward: per-stage joint conv-vjps against the packed
    kernels. The cotangent concats ([da4|dc5], [da3|da4|dc5], ...) cost
    ~36 MB of pure copies per RDB (563 GB/s elementwise in the round-3
    trace) and the dx transposed-convs emit gc(=32)-wide outputs — a
    quarter of the MXU's output lanes. Kept as the compat graph."""
    x_tok, x, c1, c2, c3, c4, w1, w2, w3, w4, w5 = res
    x_dtype = x_tok.dtype
    wx, w1p, w2p, w3p, w4p = _rdb_pack_kernels(w1, w2, w3, w4, w5, nf, gc)

    def conv_vjp(c, w, dy):
        # vjp of the packed conv; the unused primal conv is DCE'd, only
        # the wide dx transposed-conv and wide dW contraction remain
        _, vjp = jax.vjp(lambda cc, ww: _conv3(cc, ww, dt), c, w)
        return vjp(dy.astype(dt))

    g = g.astype(dt)
    dc5 = g * 0.2
    db5 = _dbias(dc5)
    # stage 4: q45 = conv(c4, w4p); preact4 grad needs dq45 = dc5
    dc4, dw4p = conv_vjp(c4, w4p, dc5)
    da4 = dc4 * _dmask(c4, dt)
    db4 = _dbias(da4)
    # stage 3: q3 outputs [q34 (->c4 preact) | q35 (->c5)]
    dc3, dw3p = conv_vjp(c3, w3p, _cat([da4, dc5]))
    da3 = dc3 * _dmask(c3, dt)
    db3 = _dbias(da3)
    dc2, dw2p = conv_vjp(c2, w2p, _cat([da3, da4, dc5]))
    da2 = dc2 * _dmask(c2, dt)
    db2 = _dbias(da2)
    dc1, dw1p = conv_vjp(c1, w1p, _cat([da2, da3, da4, dc5]))
    da1 = dc1 * _dmask(c1, dt)
    db1 = _dbias(da1)
    dxc, dwx = conv_vjp(x, wx, _cat([da1, da2, da3, da4, dc5]))
    dx = (dxc + g).astype(x_dtype)

    # reassemble per-conv kernel grads from the packed-output slices:
    # each original W_k's input segments live in successive packs
    def seg(dwp, i):  # output-axis slice i of a gc-wide pack
        return dwp[..., i * gc:(i + 1) * gc]

    dw1 = dwx[..., 0:gc]
    dw2 = _cat([dwx[..., gc:2 * gc], seg(dw1p, 0)], axis=2)
    dw3 = _cat([dwx[..., 2 * gc:3 * gc], seg(dw1p, 1), seg(dw2p, 0)],
               axis=2)
    dw4 = _cat([dwx[..., 3 * gc:4 * gc], seg(dw1p, 2), seg(dw2p, 1),
                seg(dw3p, 0)], axis=2)
    dw5 = _cat([dwx[..., 4 * gc:], dw1p[..., 3 * gc:], dw2p[..., 2 * gc:],
                dw3p[..., gc:], dw4p], axis=2)
    return (dx, dw1, db1, dw2, db2, dw3, db3, dw4, db4, dw5, db5)


def _bwd_dual(dt, nf, gc, res, g, square_dw: bool,
              dus_canvas: bool = False):
    """Round-4 backward, the dual ("scatter to past") form.

    The forward packs per-stage so every conv output is wide; the dx
    backward has the SAME structure run in reverse with the ORIGINAL
    (unpacked) kernels: conv_t(da_k, W_k) emits every contribution of
    cotangent k to ALL earlier stages at once —

        T5 = conv_t(dc5, W5)   (nf+4gc wide = [dx|dc1|dc2|dc3|dc4])
        T4 = conv_t(da4, W4)   (nf+3gc)
        ... T1 = conv_t(da1, W1)  (nf)

    so the dx transposed-convs emit 192/160/128/96/64-wide outputs
    (vs 32-wide in the packed form) and need NO cotangent concats —
    the per-stage sums are contiguous last-axis slices that fuse into
    the following mask-multiply. This removes the ~4 ms/step repack the
    round-3 trace measured AND lifts the dx GEMMs off the quarter-lane
    MXU shapes.

    dW: one cotangent canvas G = [da1|..|da4|dc5] is materialized; with
    square_dw=False each packed per-stage dW correlates its activation
    against a contiguous suffix slice of G (exact FLOPs); with
    square_dw=True ONE full-square correlation corr([x|c1..c4], G)
    computes all pairs in a single MXU-saturating contraction (~38%
    discarded FLOPs, zero slice copies) — measured on hardware, see
    scripts/bench_rdb_bwd.py."""
    x_tok, x, c1, c2, c3, c4, w1, w2, w3, w4, w5 = res
    x_dtype = x_tok.dtype

    g = g.astype(dt)
    dc5 = g * 0.2
    db5 = _dbias(dc5)
    t5 = _conv3_t(dc5, w5, dt)  # [dx | dc1 | dc2 | dc3 | dc4]
    o1, o2, o3, o4 = nf, nf + gc, nf + 2 * gc, nf + 3 * gc
    da4 = t5[..., o4:] * _dmask(c4, dt)
    db4 = _dbias(da4)
    t4 = _conv3_t(da4, w4, dt)  # [dx | dc1 | dc2 | dc3]
    da3 = (t5[..., o3:o4] + t4[..., o3:]) * _dmask(c3, dt)
    db3 = _dbias(da3)
    t3 = _conv3_t(da3, w3, dt)
    da2 = (t5[..., o2:o3] + t4[..., o2:o3] + t3[..., o2:]) \
        * _dmask(c2, dt)
    db2 = _dbias(da2)
    t2 = _conv3_t(da2, w2, dt)
    da1 = (t5[..., o1:o2] + t4[..., o1:o2] + t3[..., o1:o2]
           + t2[..., o1:]) * _dmask(c1, dt)
    db1 = _dbias(da1)
    t1 = _conv3_t(da1, w1, dt)
    dx = (t5[..., :nf] + t4[..., :nf] + t3[..., :nf] + t2[..., :nf]
          + t1 + g).astype(x_dtype)

    # NOTE (round 4, measured): folding the five bias-grad sums into
    # the dW GEMM (ones-channel input) or one fused reduction over G
    # looks like it should save their ~4 ms of standalone reduce
    # fusions, but full-step traces show XLA already absorbs that cost
    # (89.7 / 89.6 / 90.4 ms for per-stage / ones-trick / G-reduce) —
    # per-op accounting misleads here; keep the simplest form.
    gw = 4 * gc + nf
    if dus_canvas:
        # round-5 attempt at the ~3.6 ms canvas concatenate: emit each
        # cotangent into the canvas via dynamic_update_slice so the
        # producing elementwise fusions write G's slices directly
        # (in-place DUS chain) instead of materializing five standalone
        # tensors and copying them into a concat. The t_i conv operands
        # are unchanged (XLA remats the cheap elementwise da_i there).
        G = jnp.zeros(dc5.shape[:-1] + (gw,), dt)
        for off, v in ((0, da1), (gc, da2), (2 * gc, da3),
                       (3 * gc, da4), (4 * gc, dc5)):
            G = jax.lax.dynamic_update_slice_in_dim(G, v, off, -1)
    else:
        G = _cat([da1, da2, da3, da4, dc5])
    if square_dw:
        P = _cat([x, c1, c2, c3, c4])
        dwf = _conv3_dw(P, G, (3, 3, nf + 4 * gc, gw), dt)
        dw1 = dwf[:, :, :nf, 0:gc]
        dw2 = dwf[:, :, :nf + gc, gc:2 * gc]
        dw3 = dwf[:, :, :nf + 2 * gc, 2 * gc:3 * gc]
        dw4 = dwf[:, :, :nf + 3 * gc, 3 * gc:4 * gc]
        dw5 = dwf[:, :, :, 4 * gc:]
        return (dx, dw1, db1, dw2, db2, dw3, db3, dw4, db4, dw5, db5)
    # exact-FLOPs path: packed per-stage dW against suffix slices of G
    dwx = _conv3_dw(x, G, (3, 3, nf, gw), dt)
    dw1p = _conv3_dw(c1, G[..., gc:], (3, 3, gc, gw - gc), dt)
    dw2p = _conv3_dw(c2, G[..., 2 * gc:], (3, 3, gc, gw - 2 * gc), dt)
    dw3p = _conv3_dw(c3, G[..., 3 * gc:], (3, 3, gc, gw - 3 * gc), dt)
    dw4p = _conv3_dw(c4, dc5, (3, 3, gc, nf), dt)

    def seg(dwp, i):
        return dwp[..., i * gc:(i + 1) * gc]

    dw1 = dwx[..., 0:gc]
    dw2 = _cat([dwx[..., gc:2 * gc], seg(dw1p, 0)], axis=2)
    dw3 = _cat([dwx[..., 2 * gc:3 * gc], seg(dw1p, 1), seg(dw2p, 0)],
               axis=2)
    dw4 = _cat([dwx[..., 3 * gc:4 * gc], seg(dw1p, 2), seg(dw2p, 1),
                seg(dw3p, 0)], axis=2)
    dw5 = _cat([dwx[..., 4 * gc:], dw1p[..., 3 * gc:], dw2p[..., 2 * gc:],
                dw3p[..., gc:], dw4p], axis=2)
    return (dx, dw1, db1, dw2, db2, dw3, db3, dw4, db4, dw5, db5)


def _rdb5c_fused_bwd(dt, nf, gc, res, g):
    # TRAINNER_RDB_BWD selects the backward graph: "dual" (default,
    # round-4 scatter-to-past), "dualsq" (dual dx + full-square dW),
    # "dualdus" (dual with DUS-emitted cotangent canvas, round 5),
    # "packed" (round-2/3 graph). All are exact rearrangements of
    # the same math (tests/test_rdb_custom_vjp.py gates each).
    import os

    mode = os.environ.get("TRAINNER_RDB_BWD", "dual")
    if mode == "packed":
        return _bwd_packed(dt, nf, gc, res, g)
    return _bwd_dual(dt, nf, gc, res, g, square_dw=(mode == "dualsq"),
                     dus_canvas=(mode == "dualdus"))


rdb5c_fused.defvjp(_rdb5c_fused_fwd, _rdb5c_fused_bwd)


# ---------------------------------------------------------------------------
# canvas-resident 5C with fully-fused Pallas forward AND backward
# (ops/pallas_kernels.rdb5c_canvas / rdb5c_canvas_bwd): activations stay
# on the flat zero-ring canvas across chained blocks, each direction is
# ONE kernel per batch sample, hardware-verified vs the XLA packed path.
# ---------------------------------------------------------------------------


def _unpack_wgrads(dwx, dw1p, dw2p, dw3p, dw4p, nf, gc):
    """Packed flat (9*ci, co) f32 weight grads -> per-conv HWIO grads
    (the inverse of _rdb_pack_kernels on the output axis)."""
    dwx_h = dwx.reshape(3, 3, nf, -1)
    dw1p_h = dw1p.reshape(3, 3, gc, -1)
    dw2p_h = dw2p.reshape(3, 3, gc, -1)
    dw3p_h = dw3p.reshape(3, 3, gc, -1)
    dw4p_h = dw4p.reshape(3, 3, gc, -1)
    dw1 = dwx_h[..., 0:gc]
    dw2 = _cat([dwx_h[..., gc:2 * gc], dw1p_h[..., 0:gc]], axis=2)
    dw3 = _cat([dwx_h[..., 2 * gc:3 * gc], dw1p_h[..., gc:2 * gc],
                dw2p_h[..., 0:gc]], axis=2)
    dw4 = _cat([dwx_h[..., 3 * gc:4 * gc], dw1p_h[..., 2 * gc:3 * gc],
                dw2p_h[..., gc:2 * gc], dw3p_h[..., 0:gc]], axis=2)
    dw5 = _cat([dwx_h[..., 4 * gc:], dw1p_h[..., 3 * gc:],
                dw2p_h[..., 2 * gc:], dw3p_h[..., gc:], dw4p_h], axis=2)
    return dw1, dw2, dw3, dw4, dw5


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def rdb5c_fused_canvas(dt, nf, gc, h, w, xc, w1, b1, w2, b2, w3, b3,
                       w4, b4, w5, b5):
    """5C chain on a zero-ring canvas (b, rp, nf): Pallas fused forward
    + Pallas fused backward. Convert with ops.pallas_kernels.to_canvas /
    from_canvas; chains directly block-to-block."""
    from ..ops.pallas_kernels import rdb5c_canvas

    packed = _rdb_pack_kernels(w1.astype(dt), w2.astype(dt),
                               w3.astype(dt), w4.astype(dt),
                               w5.astype(dt), nf, gc)
    out, *_ = rdb5c_canvas(xc.astype(dt), packed,
                           (b1, b2, b3, b4, b5), h, w, nf, gc)
    return out


def _rdb5c_canvas_fwd(dt, nf, gc, h, w, xc, w1, b1, w2, b2, w3, b3,
                      w4, b4, w5, b5):
    from ..ops.pallas_kernels import rdb5c_canvas

    xc = xc.astype(dt)
    packed = _rdb_pack_kernels(w1.astype(dt), w2.astype(dt),
                               w3.astype(dt), w4.astype(dt),
                               w5.astype(dt), nf, gc)
    out, c1, c2, c3, c4 = rdb5c_canvas(xc, packed, (b1, b2, b3, b4, b5),
                                       h, w, nf, gc)
    return out, (jnp.zeros((0,), xc.dtype), xc, c1, c2, c3, c4,
                 w1, w2, w3, w4, w5)


def _rdb5c_canvas_bwd(dt, nf, gc, h, w, res, g):
    from ..ops.pallas_kernels import rdb5c_canvas_bwd

    tok, xc, c1, c2, c3, c4, w1, w2, w3, w4, w5 = res
    packed = _rdb_pack_kernels(w1.astype(dt), w2.astype(dt),
                               w3.astype(dt), w4.astype(dt),
                               w5.astype(dt), nf, gc)
    out = rdb5c_canvas_bwd(g.astype(dt), xc, c1, c2, c3, c4, packed,
                           h, w, nf, gc)
    dxc = out[0].astype(tok.dtype)
    dw1, dw2, dw3, dw4, dw5 = _unpack_wgrads(*out[1:6], nf, gc)
    db1, db2, db3, db4, db5 = out[6:]
    return (dxc, dw1, db1, dw2, db2, dw3, db3, dw4, db4, dw5, db5)


rdb5c_fused_canvas.defvjp(_rdb5c_canvas_fwd, _rdb5c_canvas_bwd)


class ResidualDenseBlock5C(nn.Module):
    """5-conv residual dense block (ref RRDBNet_arch.py:98)."""

    nf: int = 64
    gc: int = 32
    kernel_size: int = 3
    act_type: str = "leakyrelu"
    norm_type: Optional[str] = None
    mode: str = "CNA"
    plus: bool = False
    gaussian_noise: bool = False
    spectral_norm: bool = False
    conv_dims: int = 2  # 3 = Conv3D trunk (EVSRGAN, ref convtype Conv3D)
    convtype: str = "Conv2D"  # PartialConv2D supported (ref block.py:214)
    dtype: Dtype = jnp.float32

    def _fused_fast_path(self, x):
        """MXU-packed exact rewrite of the 5C chain ("scatter to future").

        The naive chain runs four gc(=32)-wide conv outputs — each uses a
        quarter of the MXU's 128 output lanes. Rearranged, every computed
        feature immediately emits ALL its future contributions in ONE
        wide conv (concatenating the input-channel slices of the
        downstream kernels along the output axis):

          P              = conv(x;  [W1 | W2_x | W3_x | W4_x | W5_x])  192-wide
          c1 = lrelu(P1+b1);   Q1 = conv(c1; [W2_1|W3_1|W4_1|W5_1])    160
          c2 = lrelu(P2+Q1a+b2); Q2 = conv(c2; [W3_2|W4_2|W5_2])       128
          c3 = ...;            Q3 = conv(c3; [W4_3|W5_3])               96
          c4 = ...;            Q4 = conv(c4; [W5_4])                    64
          c5 = P5 + Q1d + Q2c + Q3b + Q4 + b5

        Identical FLOPs and results (same weights, bilinear rearrangement)
        but conv outputs are 192/160/128/96/64 wide instead of
        32/32/32/32/64 — measured ~1.8x faster G forward on v5e.
        """
        nf, gc = self.nf, self.gc
        w1, b1 = _NamedConvP(gc, nf, name="conv1")()
        w2, b2 = _NamedConvP(gc, nf + gc, name="conv2")()
        w3, b3 = _NamedConvP(gc, nf + 2 * gc, name="conv3")()
        w4, b4 = _NamedConvP(gc, nf + 3 * gc, name="conv4")()
        w5, b5 = _NamedConvP(nf, nf + 4 * gc, name="conv5")()
        return rdb5c_fused(self.dtype, nf, gc, x, w1, b1, w2, b2,
                           w3, b3, w4, b4, w5, b5)

    @nn.compact
    def __call__(self, x, train: bool = True):
        fast = (self.mode == "CNA" and self.kernel_size == 3
                and self.act_type in ("leakyrelu", "lrelu")
                and not self.norm_type and not self.plus
                and not self.spectral_norm and self.conv_dims == 2
                and self.convtype == "Conv2D")
        if fast:
            out = self._fused_fast_path(x)
            if self.gaussian_noise:
                out = GaussianNoise(0.1, True, name="noise")(out, train)
            return out
        cb = partial(
            ConvBlock, kernel_size=self.kernel_size, norm_type=self.norm_type,
            act_type=self.act_type, mode=self.mode,
            spectral_norm=self.spectral_norm, kernel_init=kaiming_init(0.1),
            conv_dims=self.conv_dims, convtype=self.convtype,
            dtype=self.dtype)
        x1 = cb(self.gc, name="conv1")(x, train)
        x2 = cb(self.gc, name="conv2")(_cat([x, x1]), train)
        if self.plus:
            x2 = x2 + nn.Conv(self.gc, (1,) * self.conv_dims,
                              use_bias=False,
                              kernel_init=kaiming_init(0.1), dtype=self.dtype,
                              name="conv1x1")(x)
        x3 = cb(self.gc, name="conv3")(_cat([x, x1, x2]), train)
        x4 = cb(self.gc, name="conv4")(_cat([x, x1, x2, x3]), train)
        if self.plus:
            x4 = x4 + x2
        last_act = None if self.mode == "CNA" else self.act_type
        x5 = cb(self.nf, kernel_size=3, act_type=last_act,
                name="conv5")(_cat([x, x1, x2, x3, x4]), train)
        out = x5 * 0.2 + x
        if self.gaussian_noise:
            out = GaussianNoise(0.1, True, name="noise")(out, train)
        return out


class RRDB(nn.Module):
    """Residual-in-residual dense block: nr RDBs + x0.2 skip
    (ref RRDBNet_arch.py:62)."""

    nf: int = 64
    nr: int = 3
    gc: int = 32
    kernel_size: int = 3
    act_type: str = "leakyrelu"
    norm_type: Optional[str] = None
    mode: str = "CNA"
    plus: bool = False
    gaussian_noise: bool = False
    spectral_norm: bool = False
    conv_dims: int = 2
    convtype: str = "Conv2D"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = x
        for i in range(self.nr):
            out = ResidualDenseBlock5C(
                self.nf, self.gc, self.kernel_size, self.act_type,
                self.norm_type, self.mode, self.plus, self.gaussian_noise,
                self.spectral_norm, self.conv_dims, self.convtype, self.dtype,
                name=f"RDB{i + 1}")(out, train)
        return out * 0.2 + x


class _ScanRRDBBody(nn.Module):
    """nn.scan body: one RRDB as a (carry, _) -> (carry, None) step so the
    whole trunk compiles ONCE with params stacked on a leading (nb, ...)
    axis. ~14x faster XLA compile of the ESRGAN trunk (measured 190s ->
    14s for grad-of-forward at nb=23) with identical math per block."""

    nf: int
    nr: int
    gc: int
    act_type: str
    norm_type: Optional[str]
    mode: str
    plus: bool
    gaussian_noise: bool
    convtype: str
    dtype: Dtype
    train: bool

    @nn.compact
    def __call__(self, carry, _):
        y = RRDB(self.nf, self.nr, self.gc, 3, self.act_type,
                 self.norm_type, self.mode, self.plus, self.gaussian_noise,
                 convtype=self.convtype, dtype=self.dtype,
                 name="block")(carry, self.train)
        return y, None


class RRDBNet(nn.Module):
    """Original ESRGAN generator (ref RRDBNet_arch.py:14).

    Structure: fea_conv -> [nb x RRDB -> LR_conv] + skip -> upsampler
    (upconv | pixelshuffle) -> HR_conv0 -> HR_conv1 -> finalact.

    `scan_blocks` runs the trunk as lax.scan over stacked per-block
    params ("RRDBs" subtree, leaves (nb, ...)) instead of nb unrolled
    modules ("RRDB{i}") — same math, ~14x faster compile. Convert
    between layouts with stack_rrdb_params / unstack_rrdb_params.
    """

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    nr: int = 3
    gc: int = 32
    upscale: int = 4
    norm_type: Optional[str] = None
    act_type: str = "leakyrelu"
    mode: str = "CNA"
    upsample_mode: str = "upconv"
    final_act: Optional[str] = None
    gaussian_noise: bool = True
    plus: bool = False
    conv3d: bool = False  # EVSRGAN: Conv3D trunk over (b, t, h, w, c)
    convtype: str = "Conv2D"  # trunk conv variant, e.g. PartialConv2D
    scan_blocks: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, outm: Optional[str] = None):
        x = x.astype(self.dtype)
        dims = 3 if self.conv3d else 2
        fea = ConvBlock(self.nf, 3, act_type=None, norm_type=None,
                        kernel_init=kaiming_init(0.1), conv_dims=dims,
                        dtype=self.dtype,
                        name="fea_conv")(x, train)
        if self.scan_blocks and not self.conv3d:
            scan = nn.scan(
                _ScanRRDBBody, variable_axes={"params": 0},
                split_rngs={"params": True, "noise": True},
                length=self.nb)
            trunk, _ = scan(self.nf, self.nr, self.gc, self.act_type,
                            self.norm_type, self.mode, self.plus,
                            self.gaussian_noise, self.convtype,
                            self.dtype, train, name="RRDBs")(fea, None)
        else:
            trunk = fea
            for i in range(self.nb):
                trunk = RRDB(self.nf, self.nr, self.gc, 3, self.act_type,
                             self.norm_type, self.mode, self.plus,
                             self.gaussian_noise, conv_dims=dims,
                             convtype=self.convtype, dtype=self.dtype,
                             name=f"RRDB{i}")(trunk, train)
        trunk = ConvBlock(self.nf, 3, norm_type=self.norm_type, act_type=None,
                          mode=self.mode, kernel_init=kaiming_init(0.1),
                          conv_dims=dims, dtype=self.dtype,
                          name="LR_conv")(trunk, train)
        fea = fea + trunk
        if self.conv3d:
            # collapse the frame axis (center frame) before 2D upsampling
            fea = fea[:, fea.shape[1] // 2]

        up_block = UpconvBlock if self.upsample_mode == "upconv" else \
            PixelShuffleBlock
        if self.upsample_mode not in ("upconv", "pixelshuffle"):
            raise NotImplementedError(
                f"upsample mode [{self.upsample_mode}] not found")
        if self.upscale == 3:
            fea = up_block(self.nf, upscale=3, act_type=self.act_type,
                           kernel_init=kaiming_init(0.1), dtype=self.dtype,
                           name="up0")(fea, train)
        else:
            for i in range(int(math.log2(self.upscale))):
                fea = up_block(self.nf, upscale=2, act_type=self.act_type,
                               kernel_init=kaiming_init(0.1), dtype=self.dtype,
                               name=f"up{i}")(fea, train)
        fea = ConvBlock(self.nf, 3, act_type=self.act_type,
                        kernel_init=kaiming_init(0.1), dtype=self.dtype,
                        name="HR_conv0")(fea, train)
        out = ConvBlock(self.out_nc, 3, act_type=None,
                        kernel_init=kaiming_init(0.1), dtype=self.dtype,
                        name="HR_conv1")(fea, train)
        out = finalact(self.final_act)(out)
        if outm:
            out = finalact(outm)(out)
        return out.astype(jnp.float32)


def stack_rrdb_params(params: dict, trunk_key: str = "RRDBs") -> dict:
    """Convert an unrolled param tree ({RRDB0..RRDBn-1: subtree}) to the
    scan layout ({RRDBs: {block: stacked subtree (nb, ...)}}). Use when
    loading interop/per-block checkpoints into a scan_blocks=True net."""
    import numpy as _np

    blocks = sorted((k for k in params if k.startswith("RRDB")
                     and k[4:].isdigit()), key=lambda k: int(k[4:]))
    if not blocks:
        return params
    stacked = jax.tree.map(lambda *xs: _np.stack(
        [_np.asarray(x) for x in xs]), *[params[k] for k in blocks])
    out = {k: v for k, v in params.items() if k not in blocks}
    out[trunk_key] = {"block": stacked}
    return out


def unstack_rrdb_params(params: dict, trunk_key: str = "RRDBs") -> dict:
    """Inverse of stack_rrdb_params (for exporting a scan-trained net to
    the per-block layout the .pth export tools consume)."""
    import numpy as _np

    if trunk_key not in params:
        return params
    stacked = params[trunk_key]["block"]
    nb = jax.tree.leaves(stacked)[0].shape[0]
    out = {k: v for k, v in params.items() if k != trunk_key}
    for i in range(nb):
        out[f"RRDB{i}"] = jax.tree.map(
            lambda x, i=i: _np.asarray(x)[i], stacked)
    return out


class MRRDBNet(nn.Module):
    """Modified/"new" ESRGAN arch (ref RRDBNet_arch.py:171): fixed
    nearest-interpolate 2x-2x upsampling, lrelu activations."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    upscale: int = 4
    scan_blocks: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        cb = partial(ConvBlock, kernel_size=3, norm_type=None,
                     kernel_init=kaiming_init(0.1), dtype=self.dtype)
        fea = cb(self.nf, act_type=None, name="conv_first")(x, train)
        if self.scan_blocks:
            scan = nn.scan(
                _ScanRRDBBody, variable_axes={"params": 0},
                split_rngs={"params": True, "noise": True},
                length=self.nb)
            trunk, _ = scan(self.nf, 3, self.gc, "leakyrelu", None, "CNA",
                            False, False, "Conv2D", self.dtype, train,
                            name="RRDBs")(fea, None)
        else:
            trunk = fea
            for i in range(self.nb):
                trunk = RRDB(self.nf, 3, self.gc, dtype=self.dtype,
                             gaussian_noise=False,
                             name=f"RRDB{i}")(trunk, train)
        trunk = cb(self.nf, act_type=None, name="trunk_conv")(trunk, train)
        fea = fea + trunk
        n_up = 1 if self.upscale == 3 else int(math.log2(self.upscale))
        for i in range(n_up):
            r = 3 if self.upscale == 3 else 2
            fea = UpconvBlock(self.nf, upscale=r, act_type="leakyrelu",
                              kernel_init=kaiming_init(0.1), dtype=self.dtype,
                              name=f"upconv{i + 1}")(fea, train)
        fea = cb(self.nf, act_type="leakyrelu", name="HRconv")(fea, train)
        out = cb(self.out_nc, act_type=None, name="conv_last")(fea, train)
        return out.astype(jnp.float32)
