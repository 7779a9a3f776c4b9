"""Pallas TPU kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from trainner_tpu.ops.degradations import apply_kernels, gaussian_kernels
from trainner_tpu.ops.pallas_kernels import blur_per_sample_pallas

RNG = jax.random.PRNGKey(0)


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
