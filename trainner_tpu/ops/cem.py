"""CEM: Consistency-Enforcing Module.

Equivalent of ref codes/models/modules/architectures/CEM/CEMnet.py:12 —
a zero-parameter wrapper that projects a super-resolved image onto the
affine subspace { x : downscale(x) = LR }, so outputs exactly
reproduce the LR input when downscaled (the reference computes conjugate
filters with scipy and pads invalid margins, CEMnet.py:25-81).

TPU-native design: instead of precomputed conjugate FIR filters, the
projection is performed by Richardson-style iterative refinement
    x <- x + U (lr - D x)
with D = antialiased downscale (MATLAB-parity kernel via ops/imresize
gather-matmuls) and U = its adjoint-ish upsampler. Because ||I - U D|| < 1
for these kernels the iteration converges geometrically; a handful of
steps drives the consistency error to float tolerance. Everything is pure
jnp — jit/grad-compatible, so CEM can wrap training forwards exactly like
the reference's WrapArchitecture (ref CEMnet.py:58).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .imresize import imresize


def downscale(x: jnp.ndarray, scale: int,
              kernel: str = "cubic") -> jnp.ndarray:
    # clip=False: the projection math needs D to be LINEAR
    return imresize(x, scale=1.0 / scale, kernel=kernel, clip=False)


def upscale(x: jnp.ndarray, scale: int,
            kernel: str = "cubic") -> jnp.ndarray:
    return imresize(x, scale=float(scale), kernel=kernel, clip=False)


def _nearest_up(x: jnp.ndarray, s: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, s, w, s, c))
    return x.reshape(b, h * s, w * s, c)


def _box_down(x: jnp.ndarray, s: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h // s, s, w // s, s, c).mean(axis=(2, 4))


@partial(jax.jit, static_argnames=("scale", "n_iter", "kernel"))
def cem_project(sr: jnp.ndarray, lr: jnp.ndarray, scale: int,
                n_iter: int = 20, kernel: str = "box") -> jnp.ndarray:
    """Project sr so that downscale(out) == lr (ref CEM conjugate-filter
    projection, CEMnet.py:12-58).

    kernel='box': closed-form exact projection — per s x s block,
    D(U y) = y identically, so one corrective step makes the box-downscale
    of the output bitwise equal to lr (and it is the minimum-L2
    correction, matching CEM's orthogonal projection).

    other kernels (e.g. 'cubic'): conjugate-gradient solve of
    (D U) y = lr - D sr in LR space, then out = sr + U y — the iterative
    equivalent of the reference's precomputed conjugate filters.
    """
    sr = sr.astype(jnp.float32)
    if kernel == "box":
        resid = lr - _box_down(sr, scale)
        return sr + _nearest_up(resid, scale)

    # exact minimum-L2 correction: c = D^T (D D^T)^{-1} e where D is the
    # downscale operator and D^T its true adjoint (via vjp). D D^T is SPD
    # in LR space, so plain CG converges.
    def D(x):
        return downscale(x, scale, kernel)

    _, d_vjp = jax.vjp(D, sr)

    def Dt(y):
        return d_vjp(y)[0]

    def A(y):  # D D^T, SPD
        return D(Dt(y))

    e = lr - D(sr)
    y0 = jnp.zeros_like(e)

    def body(i, carry):
        y, r, p = carry
        ap = A(p)
        alpha = jnp.sum(r * r) / (jnp.sum(p * ap) + 1e-12)
        y = y + alpha * p
        r_new = r - alpha * ap
        beta = jnp.sum(r_new * r_new) / (jnp.sum(r * r) + 1e-12)
        p = r_new + beta * p
        return (y, r_new, p)

    y, _, _ = jax.lax.fori_loop(0, n_iter, body, (y0, e, e))
    return sr + Dt(y)


class CEMWrapper:
    """Wrap a jittable SR forward with the consistency projection
    (ref CEMnet.WrapArchitecture:58). fn maps lr -> sr."""

    def __init__(self, scale: int, n_iter: int = 20,
                 kernel: str = "box"):
        self.scale = scale
        self.n_iter = n_iter
        self.kernel = kernel

    def __call__(self, fn, lr: jnp.ndarray, *args, **kwargs):
        sr = fn(lr, *args, **kwargs)
        return cem_project(sr, lr.astype(jnp.float32), self.scale,
                           self.n_iter, self.kernel)

    def consistency_error(self, sr: jnp.ndarray, lr: jnp.ndarray
                          ) -> jnp.ndarray:
        return jnp.abs(downscale(sr, self.scale, self.kernel)
                       - lr).max()
