"""Pallas TPU kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from trainner_tpu.models.rrdb import _rdb5c_fwd_impl, _rdb_pack_kernels
from trainner_tpu.ops.degradations import apply_kernels, gaussian_kernels
from trainner_tpu.ops.pallas_kernels import (
    _canvas_geometry, blur_per_sample_pallas, from_canvas, rdb5c_canvas,
    to_canvas)

RNG = jax.random.PRNGKey(0)


def _rdb5c_weights(nf=64, gc=32, seed=0):
    rng = np.random.RandomState(seed)
    ws, bs = [], []
    cins = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
    couts = [gc, gc, gc, gc, nf]
    for ci, co in zip(cins, couts):
        ws.append(jnp.asarray(
            rng.randn(3, 3, ci, co).astype(np.float32)) * 0.05)
        bs.append(jnp.asarray(rng.randn(co).astype(np.float32)) * 0.05)
    return ws, bs


def test_rdb5c_canvas_matches_packed_xla_forward():
    """The fused 5C Pallas kernel (interpret mode) vs the XLA packed
    forward — outputs AND the four VJP residuals, plus a clean zero ring
    (the chaining invariant)."""
    nf, gc = 64, 32
    b, h, w = 2, 24, 40
    ws, bs = _rdb5c_weights(nf, gc)
    x = jax.random.normal(RNG, (b, h, w, nf)) * 0.1
    ref_out, (_, c1r, c2r, c3r, c4r) = _rdb5c_fwd_impl(
        jnp.float32, nf, gc, x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
        ws[3], bs[3], ws[4], bs[4])
    packed = _rdb_pack_kernels(*ws, nf, gc)
    _, rp = _canvas_geometry(h, w, x.dtype)
    out_c, c1, c2, c3, c4 = rdb5c_canvas(
        to_canvas(x, rp), packed, tuple(bs), h, w, nf, gc, interpret=True)
    out = from_canvas(out_c, h, w)
    assert float(jnp.abs(out - ref_out).max()) < 1e-5
    for got, want in [(c1, c1r), (c2, c2r), (c3, c3r), (c4, c4r)]:
        assert float(jnp.abs(from_canvas(got, h, w) - want).max()) < 1e-5
    # zero-ring invariant: out_c must chain directly into the next 5C
    ring = out_c - to_canvas(out, rp)
    assert float(jnp.abs(ring).max()) == 0.0


def test_rdb5c_canvas_vjp_matches_xla_grads():
    """Grad through the canvas custom-VJP (Pallas fused fwd+bwd,
    interpret on CPU) vs grad through the XLA packed custom-VJP: dx and
    every per-conv dW/db agree."""
    from trainner_tpu.models.rrdb import rdb5c_fused, rdb5c_fused_canvas

    nf, gc = 64, 32
    b, h, w = 1, 8, 10
    ws, bs = _rdb5c_weights(nf, gc, seed=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, nf)) * 0.1
    fw = [v for pair in zip(ws, bs) for v in pair]

    def loss_xla(x, fw):
        return jnp.sum(rdb5c_fused(jnp.float32, nf, gc, x, *fw) ** 2)

    _, rp = _canvas_geometry(h, w, x.dtype)

    def loss_pallas(x, fw):
        yc = rdb5c_fused_canvas(jnp.float32, nf, gc, h, w,
                                to_canvas(x, rp), *fw)
        return jnp.sum(from_canvas(yc, h, w) ** 2)

    ga = jax.grad(loss_xla, argnums=(0, 1))(x, fw)
    gp = jax.grad(loss_pallas, argnums=(0, 1))(x, fw)
    assert float(jnp.abs(ga[0] - gp[0]).max()) < 1e-4
    for a, p in zip(jax.tree.leaves(ga[1]), jax.tree.leaves(gp[1])):
        assert float(jnp.abs(a - p).max()) < 1e-3


def test_pallas_blur_matches_xla_grouped_conv():
    x = jax.random.uniform(RNG, (4, 32, 32, 3))
    kerns = gaussian_kernels(RNG, 4, 9, (0.5, 2.0))
    ref = apply_kernels(x, kerns)
    out = blur_per_sample_pallas(x, kerns, interpret=True)
    assert out.shape == ref.shape
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_pallas_blur_identity_kernel():
    x = jax.random.uniform(RNG, (2, 16, 16, 3))
    ident = jnp.zeros((2, 5, 5)).at[:, 2, 2].set(1.0)
    out = blur_per_sample_pallas(x, ident, interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_pallas_blur_guarded_on_tpu(monkeypatch):
    """The compiled blur kernel is known-wrong on real TPUs (Mosaic
    miscompute, module docstring): compiling it for a TPU backend must
    hard-error unless the debug escape hatch is set."""
    import pytest

    monkeypatch.delenv("TRAINNER_PALLAS_BLUR_UNSAFE", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    x = jax.random.uniform(RNG, (2, 16, 16, 3))
    ident = jnp.zeros((2, 5, 5)).at[:, 2, 2].set(1.0)
    with pytest.raises(RuntimeError, match="miscomputes"):
        blur_per_sample_pallas(x, ident, interpret=False)
    # interpret mode stays allowed (verified == XLA)
    out = blur_per_sample_pallas(x, ident, interpret=True)
    assert out.shape == x.shape
