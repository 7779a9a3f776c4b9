"""Tests for CEM projection and AdaTarget (SURVEY.md §2.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

RNG = jax.random.PRNGKey(0)


def test_cem_projection_enforces_consistency():
    from trainner_tpu.ops.cem import cem_project, downscale

    from trainner_tpu.ops.cem import _box_down

    scale = 4
    lr = jax.random.uniform(RNG, (1, 16, 16, 3))
    sr = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    # exact box projection: bitwise-consistent in one step
    out = cem_project(sr, lr, scale, kernel="box")
    assert float(jnp.abs(_box_down(out, scale) - lr).max()) < 1e-6
    # general-kernel CG projection: drives consistency error down hard
    err_before = float(jnp.abs(downscale(sr, scale) - lr).max())
    out = cem_project(sr, lr, scale, n_iter=30, kernel="cubic")
    err_after = float(jnp.abs(downscale(out, scale) - lr).max())
    assert err_after < err_before / 20


def test_cem_preserves_consistent_input():
    """If sr is already consistent, the projection changes little."""
    from trainner_tpu.ops.cem import cem_project, downscale, upscale

    from trainner_tpu.ops.cem import _box_down

    scale = 2
    lr = jax.random.uniform(RNG, (1, 16, 16, 3))
    sr = upscale(lr, scale)
    out = cem_project(sr, _box_down(sr, scale), scale, kernel="box")
    assert float(jnp.abs(out - sr).max()) < 1e-5


def test_cem_wrapper_is_differentiable():
    from trainner_tpu.ops.cem import cem_project

    lr = jax.random.uniform(RNG, (1, 8, 8, 3))

    def loss(sr):
        return jnp.sum(cem_project(sr, lr, 2, n_iter=3,
                                   kernel="cubic") ** 2)

    g = jax.grad(loss)(jax.random.uniform(RNG, (1, 16, 16, 3)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_adatarget_identity_affine_recovers_center():
    """Zero-init LocNet => identity affine => transformed target equals
    the target center crop (the 7x7 patch inside the 9x9)."""
    from trainner_tpu.ops.adatarget import LocNet, ada_target

    loc = LocNet()
    out = jax.random.uniform(RNG, (1, 14, 14, 1))
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (1, 14, 14, 1))
    v = loc.init(RNG, jnp.zeros((1, 7, 7)), jnp.zeros((1, 9, 9)))
    warped = ada_target(out, tgt, v["params"], loc)
    assert warped.shape == tgt.shape
    # identity affine: sampled grid spans the central 7x7 of each patch
    assert float(jnp.abs(warped - tgt).mean()) < 0.06


def test_adatarget_loc_net_predicts_affine_shape():
    from trainner_tpu.ops.adatarget import LocNet

    loc = LocNet()
    v = loc.init(RNG, jnp.zeros((4, 7, 7)), jnp.zeros((4, 9, 9)))
    theta = loc.apply(v, jnp.ones((4, 7, 7)), jnp.ones((4, 9, 9)))
    assert theta.shape == (4, 2, 3)
    ident = np.tile(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32),
                    (4, 1, 1))
    assert np.allclose(np.asarray(theta), ident)  # zero-init => identity
