"""Spatial (band) parallelism gates on the 8-virtual-device CPU backend.

The reference scales big-image inference by host-side tiling
(ref codes/models/sr_model.py test_chop:319); parallel/spatial.py is the
TPU-native multi-chip version: height bands sharded over an `sp` mesh
axis, halo rows exchanged over ICI via lax.ppermute. These tests pin the
numerics contract: band seams are EXACT (not blended) whenever
halo >= receptive field, and the only deviation from single-device
inference is the usual border effect at the image's outer rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_tpu.parallel.spatial import make_spatial_mesh, spatial_infer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _conv_stack(n_layers, bias, key, c_in=3, c_out=3, nf=8):
    """Plain SAME 3x3 conv stack (receptive radius = n_layers)."""
    ks = jax.random.split(key, n_layers)
    widths = [c_in] + [nf] * (n_layers - 1) + [c_out]
    kernels = [jax.random.normal(k, (3, 3, widths[i], widths[i + 1]),
                                 jnp.float32) * 0.3
               for i, k in enumerate(ks)]
    biases = [jax.random.normal(k, (widths[i + 1],)) * 0.1 if bias else None
              for i, k in enumerate(ks)]

    def apply_fn(x):
        for i, w in enumerate(kernels):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if biases[i] is not None:
                x = x + biases[i]
            if i < n_layers - 1:
                x = jax.nn.leaky_relu(x, 0.2)
        return x

    return apply_fn


@pytest.mark.parametrize("bias", [False, True])
def test_spatial_infer_exact_interior_and_seams(bias):
    """Every band SEAM must be exact (not blended) when halo >= receptive
    radius; the only deviation from single-device inference is confined
    to the outer rf-1 rows at the image's top/bottom edge, where the
    zero halo's intermediate activations differ from progressive per-conv
    zero padding (a conv window at the boundary reaches real image rows,
    so the halo rows are nonzero after the first layer)."""
    rf = 3
    apply_fn = _conv_stack(rf, bias=bias, key=jax.random.PRNGKey(2))
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 16, 3))
    mesh = make_spatial_mesh(4)
    y_sp = np.asarray(spatial_infer(apply_fn, x, mesh, halo=4))
    y_1 = np.asarray(apply_fn(x))
    edge = rf - 1
    np.testing.assert_allclose(y_sp[:, edge:-edge], y_1[:, edge:-edge],
                               rtol=0, atol=1e-6)
    # the border deviation exists but is bounded (same class of effect
    # as chop-tile borders)
    assert np.max(np.abs(y_sp - y_1)) < 3.0


def test_spatial_infer_pad_and_scale():
    """H not divisible by the axis size is padded internally and cropped
    back; scale>1 output geometry is correct."""
    conv = _conv_stack(2, bias=False, key=jax.random.PRNGKey(4))

    def apply_fn(x):  # nearest-neighbour 2x upsample after the convs
        y = conv(x)
        return jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)

    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 29, 12, 3))
    mesh = make_spatial_mesh(4)   # 29 -> pad to 32, bands of 8
    y_sp = np.asarray(spatial_infer(apply_fn, x, mesh, halo=3, scale=2))
    assert y_sp.shape == (1, 58, 24, 3)
    # interior exact; outer rf-1=1 input rows (2 output rows at scale 2)
    # carry the usual border effect, incl. at the internal pad boundary
    y_1 = np.asarray(apply_fn(x))
    np.testing.assert_allclose(y_sp[:, 2:-2], y_1[:, 2:-2],
                               rtol=0, atol=1e-6)


def test_rrdb_seams_exact_at_small_halo():
    """Round-5 measured claim (docs/qa_curves/seam_rrdb23_init.json):
    RRDB's EFFECTIVE receptive radius is ~4-6 input rows (residual
    scaling x0.2 decays cross-row influence geometrically), ~30x below
    the conservative per-conv bound — so practical halos far under
    `receptive_radius()` still give numerically exact interior seams.
    Gate that here on a deeper RRDB (nb=3 -> conservative radius ~50
    rows) at halo=8, matching the flagship measurement's tolerance
    class. Reference analogue: chop overlap=16 in
    /root/reference/codes/models/sr_model.py:319."""
    from trainner_tpu.train.sr_trainer import SRTrainer

    opt = {"is_train": False, "scale": 2,
           "network_G": {"type": "rrdb_net", "nf": 16, "nb": 3, "gc": 8,
                         "upscale": 2, "gaussian_noise": False}}
    tr = SRTrainer(opt, dtype=jnp.float32)
    state = tr.init_state(jax.random.PRNGKey(0), (1, 16, 16, 3))

    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 24, 3))
    mesh = make_spatial_mesh(4)   # bands of 16 rows, halo 8
    halo, s = 8, 2
    y_sp = np.asarray(tr.eval_step_spatial(state, x, mesh, halo=halo))
    y_1 = np.asarray(tr.eval_step(state, x))
    assert y_sp.shape == y_1.shape == (1, 128, 48, 3)
    # interior = beyond halo rows from the image's outer edge (the only
    # structural deviation region); every internal band seam lies inside
    interior = slice(halo * s, -halo * s)
    np.testing.assert_allclose(y_sp[:, interior], y_1[:, interior],
                               rtol=0, atol=1e-5)


def test_spatial_infer_halo_too_large():
    mesh = make_spatial_mesh(8)
    x = jnp.zeros((1, 16, 8, 3))  # bands of 2 < halo 4
    with pytest.raises(ValueError):
        spatial_infer(lambda z: z, x, mesh, halo=4)


def test_eval_step_spatial_matches_eval_step():
    """The trainer-level band-parallel path on a real RRDB generator:
    interior rows (beyond the conservative receptive radius from the
    image's outer edge) must match single-device eval_step exactly."""
    from trainner_tpu.train.sr_trainer import SRTrainer

    opt = {"is_train": False, "scale": 2,
           "network_G": {"type": "rrdb_net", "nf": 8, "nb": 1, "gc": 4,
                         "upscale": 2, "gaussian_noise": False}}
    tr = SRTrainer(opt, dtype=jnp.float32)
    state = tr.init_state(jax.random.PRNGKey(0), (1, 16, 16, 3))

    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 96, 32, 3))
    mesh = make_spatial_mesh(4)
    # nb=1 -> conv_first + 15 RDB convs + trunk + upconv + HRconv +
    # conv_last ~ 21 3x3 convs; halo 24 covers it with band height 24
    y_sp = np.asarray(tr.eval_step_spatial(state, x, mesh, halo=24))
    y_1 = np.asarray(tr.eval_step(state, x))
    assert y_sp.shape == y_1.shape == (1, 192, 64, 3)
    s, rf = 2, 24
    np.testing.assert_allclose(y_sp[:, rf * s:-rf * s],
                               y_1[:, rf * s:-rf * s],
                               rtol=0, atol=2e-5)
