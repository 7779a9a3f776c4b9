"""Mesh/sharding tests on the 8-virtual-device CPU backend
(SURVEY.md §2.9 — the distributed-backend layer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_tpu.parallel.mesh import (MeshConfig, batch_sharding,
                                        local_batch_slice, make_mesh,
                                        param_sharding, replicate,
                                        shard_batch)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _trainer(mesh=None):
    from trainner_tpu.train.sr_trainer import SRTrainer

    opt = {"is_train": True, "scale": 2,
           "network_G": {"type": "rrdb_net", "nf": 8, "nb": 1, "gc": 4,
                         "upscale": 2, "gaussian_noise": False},
           "network_D": {"type": "discriminator_vgg", "size": 16,
                         "base_nf": 8},
           "train": {"lr_G": 1e-3, "lr_D": 1e-3,
                     "pixel_criterion": "l1", "pixel_weight": 1.0,
                     "gan_type": "vanilla", "gan_weight": 5e-3,
                     "lr_scheme": "MultiStepLR", "lr_steps": [100],
                     "niter": 100}}
    return SRTrainer(opt, mesh=mesh, dtype=jnp.float32)


def _batch(b=8):
    r = np.random.default_rng(0)
    return {"LR": r.random((b, 8, 8, 3), np.float32),
            "HR": r.random((b, 16, 16, 3), np.float32)}


def test_mesh_construction():
    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    assert dict(mesh.shape) == {"data": 4, "fsdp": 2}
    mesh = make_mesh(MeshConfig(data=-1, fsdp=1))
    assert mesh.shape["data"] == len(jax.devices())
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=3, fsdp=2))


def test_local_batch_slice_single_process():
    mesh = make_mesh(MeshConfig(data=8))
    s = local_batch_slice(32, mesh)
    assert (s.start, s.stop) == (0, 32)


def test_data_parallel_matches_single_device():
    """8-way data-parallel GAN step must reproduce the single-device
    step (same math, gradients all-reduced by XLA)."""
    batch = _batch(8)

    tr1 = _trainer(mesh=None)
    s1 = tr1.init_state(jax.random.PRNGKey(0), (8, 8, 8, 3))
    s1, logs1 = tr1.train_step(s1, batch)

    mesh = make_mesh(MeshConfig(data=8, fsdp=1))
    tr2 = _trainer(mesh=mesh)
    s2 = tr2.init_state(jax.random.PRNGKey(0), (8, 8, 8, 3))
    s2 = replicate(s2, mesh)
    sharded = shard_batch(batch, mesh)
    s2, logs2 = tr2.train_step(s2, sharded)

    assert abs(float(logs1["l_g_total"]) - float(logs2["l_g_total"])) < 1e-5
    for a, b in zip(jax.tree.leaves(s1.g.params),
                    jax.tree.leaves(s2.g.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fsdp_sharding_specs():
    """Flagship-size conv kernels MUST carry an fsdp axis; small leaves
    (biases) must stay replicated (parallel/mesh._param_spec)."""
    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    params = {
        # ESRGAN-scale 3x3 conv: 3*3*64*192 = 110,592 elems > 2**16
        "conv_big": jnp.zeros((3, 3, 64, 192), jnp.float32),
        # trunk conv at nf=64/gc=32 boundary: 3*3*96*32 = 27,648 < 2**16
        "conv_small": jnp.zeros((3, 3, 96, 32), jnp.float32),
        "bias": jnp.zeros((192,), jnp.float32),
    }
    sh = param_sharding(params, mesh)
    big = sh["conv_big"].spec
    assert any(ax == "fsdp" for ax in big if ax), (
        f"large kernel not fsdp-sharded: {big}")
    # the fsdp dim actually divides: 192 % 2 == 0 on the largest dim
    assert big[3] == "fsdp"
    assert sh["conv_small"].spec == jax.sharding.PartitionSpec()
    assert sh["bias"].spec == jax.sharding.PartitionSpec()


def test_fsdp_sharded_step_runs():
    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    tr = _trainer(mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0), (8, 8, 8, 3))
    shardings = param_sharding(state, mesh)
    state = jax.tree.map(jax.device_put, state, shardings)
    batch = shard_batch(_batch(8), mesh)
    state, logs = tr.train_step(state, batch)
    assert np.isfinite(float(logs["l_g_total"]))


def test_mesh_tensor_axis():
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "tensor": 2}
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=4, fsdp=2, tensor=2))
    # tensor=1 keeps the legacy 2-axis mesh (cached-program stability)
    assert dict(make_mesh(MeshConfig(data=4, fsdp=2, tensor=1)).shape) == \
        {"data": 4, "fsdp": 2}


def test_tensor_parallel_matches_single_device():
    """dp x fsdp x tensor GAN step must reproduce the single-device step:
    output-channel-split convs compute the same math; only the dx/grad
    reductions change order (hence allclose, not bitwise)."""
    batch = _batch(8)

    tr1 = _trainer(mesh=None)
    s1 = tr1.init_state(jax.random.PRNGKey(0), (8, 8, 8, 3))
    s1, logs1 = tr1.train_step(s1, jax.tree.map(jnp.asarray, batch))

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    trn = _trainer(mesh=mesh)
    sn = trn.init_state(jax.random.PRNGKey(0), (8, 8, 8, 3))
    # min_size=0: the test net is tiny, force sharding onto every
    # divisible leaf so the tensor path is actually exercised
    sh = param_sharding(sn, mesh, min_size=0)
    sn = jax.tree.map(jax.device_put, sn, sh)
    # at least one conv kernel must actually be split over 'tensor'
    n_tp = sum(1 for leaf in jax.tree.leaves(sn.g.params)
               if hasattr(leaf, "sharding") and leaf.ndim >= 2
               and any(ax == "tensor" for ax in leaf.sharding.spec
                       if ax is not None))
    assert n_tp >= 5, f"expected tensor-sharded kernels, got {n_tp}"
    sn, logsn = trn.train_step(sn, shard_batch(batch, mesh))

    for k in logs1:
        np.testing.assert_allclose(float(logs1[k]), float(logsn[k]),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(s1.g.params),
                    jax.tree.leaves(sn.g.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_batch_sharding_layout():
    mesh = make_mesh(MeshConfig(data=8))
    sh = batch_sharding(mesh)
    x = jax.device_put(np.zeros((8, 4, 4, 3), np.float32), sh)
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (1, 4, 4, 3)


def test_sharded_checkpoint_resume_bitwise(tmp_path):
    """Checkpoint/resume under the data x fsdp mesh, end-to-end: run 2
    sharded GAN steps, save, continue 2 more; restore the checkpoint
    into a freshly-sharded state, replay the same 2 steps, and match the
    uninterrupted run BITWISE (the one distributed path round 3 left
    ungated)."""
    from trainner_tpu.utils.checkpoint import load_state, save_state

    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    tr = _trainer(mesh=mesh)

    def sharded_init():
        s = tr.init_state(jax.random.PRNGKey(0), (8, 8, 8, 3))
        sh = param_sharding(s, mesh)
        return jax.tree.map(jax.device_put, s, sh), sh

    def batch(i):
        r = np.random.default_rng(100 + i)
        return shard_batch({"LR": r.random((8, 8, 8, 3), np.float32),
                            "HR": r.random((8, 16, 16, 3), np.float32)},
                           mesh)

    state, shardings = sharded_init()
    for i in range(2):
        state, _ = tr.train_step(state, batch(i))
    path = str(tmp_path / "2.state")
    save_state(state, path, epoch=1)

    ref = state
    for i in range(2, 4):
        ref, _ = tr.train_step(ref, batch(i))

    fresh, _ = sharded_init()
    restored, meta = load_state(path, fresh)
    assert meta["iter"] == 2 and meta["epoch"] == 1
    restored = jax.tree.map(jax.device_put, restored, shardings)
    for i in range(2, 4):
        restored, _ = tr.train_step(restored, batch(i))

    ref_leaves = jax.tree.leaves(ref)
    res_leaves = jax.tree.leaves(restored)
    assert len(ref_leaves) == len(res_leaves)
    for a, b in zip(ref_leaves, res_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_steps_scan_on_mesh():
    """The scanned multi-step dispatch under the data x fsdp mesh:
    batches carry a leading (k,) step axis sharded only on 'data'."""
    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    tr = _trainer(mesh=mesh)
    assert tr.can_scan_steps()
    state = tr.init_state(jax.random.PRNGKey(0), (8, 8, 8, 3))
    state = jax.tree.map(jax.device_put, state, param_sharding(state, mesh))
    r = np.random.default_rng(5)
    k = 3
    batches = {"LR": jnp.asarray(r.random((k, 8, 8, 8, 3), np.float32)),
               "HR": jnp.asarray(r.random((k, 8, 16, 16, 3), np.float32))}
    state, logs = tr.train_steps(state, batches)
    assert int(state.step) == k
    assert jax.tree.leaves(logs)[0].shape[0] == k
    assert np.isfinite(float(logs["l_g_total"][-1]))
