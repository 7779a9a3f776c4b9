"""SRFlow flow-stack tests: invertibility, logdet consistency, NLL
training step (SURVEY.md §2.6 srflow_net, §2.5 SRFlow_model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_tpu.models.srflow import (
    ActNorm, CondAffine, InvConv1x1, SRFlowNet, gaussian_logp, squeeze2,
    unsqueeze2)

RNG = jax.random.PRNGKey(0)


def test_squeeze_roundtrip():
    x = jax.random.uniform(RNG, (2, 8, 8, 3))
    assert jnp.allclose(unsqueeze2(squeeze2(x)), x)


def test_actnorm_invertible():
    x = jax.random.normal(RNG, (2, 8, 8, 4))
    an = ActNorm(4)
    v = an.init(RNG, x, jnp.zeros((2,)))
    # perturb params so it's not identity
    v = jax.tree.map(lambda p: p + 0.3, v)
    y, ld = an.apply(v, x, jnp.zeros((2,)), False)
    x2, ld2 = an.apply(v, y, ld, True)
    assert np.allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    assert np.allclose(np.asarray(ld2), 0.0, atol=1e-4)


def test_invconv_invertible_logdet():
    x = jax.random.normal(RNG, (2, 6, 6, 8))
    pc = InvConv1x1(8)
    v = pc.init(RNG, x, jnp.zeros((2,)))
    y, ld = pc.apply(v, x, jnp.zeros((2,)), False)
    x2, ld2 = pc.apply(v, y, ld, True)
    assert np.allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    assert np.allclose(np.asarray(ld2), 0.0, atol=1e-3)
    # orthogonal init -> logdet ~ 0 forward too
    assert abs(float(ld[0])) < 1e-2


def test_cond_affine_invertible():
    x = jax.random.normal(RNG, (2, 8, 8, 12))
    ft = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    cp = CondAffine(12, hidden_channels=8)
    v = cp.init(RNG, x, ft, jnp.zeros((2,)))
    y, ld = cp.apply(v, x, ft, jnp.zeros((2,)), False)
    x2, ld2 = cp.apply(v, y, ft, ld, True)
    assert np.allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    assert np.allclose(np.asarray(ld2), 0.0, atol=1e-3)


def test_srflow_l1_full_invertibility():
    """With L=1 there are no splits: reverse(forward(gt)) == gt."""
    net = SRFlowNet(nf=8, nb=2, gc=4, scale=2, K=2, L=1,
                    hidden_channels=8)
    lr = jax.random.uniform(RNG, (1, 8, 8, 3))
    hr = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    v = net.init(RNG, gt=hr, lr=lr, reverse=False, rng=RNG)
    z, nll, logdet = net.apply(v, gt=hr, lr=lr, reverse=False,
                               add_gt_noise=False)
    hr_rec, _ = net.apply(v, lr=lr, z=z, reverse=True,
                          rng=jax.random.PRNGKey(2))
    assert np.allclose(np.asarray(hr_rec), np.asarray(hr), atol=1e-3)


def test_srflow_nll_finite_and_sampling_shape():
    net = SRFlowNet(nf=8, nb=2, gc=4, scale=4, K=2, L=3,
                    hidden_channels=8)
    lr = jax.random.uniform(RNG, (2, 8, 8, 3))
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    v = net.init(RNG, gt=hr, lr=lr, reverse=False, rng=RNG)
    _, nll, _ = net.apply(v, gt=hr, lr=lr, reverse=False, rng=RNG)
    assert np.all(np.isfinite(np.asarray(nll)))
    sr, _ = net.apply(v, lr=lr, reverse=True, eps_std=0.5,
                      rng=jax.random.PRNGKey(3))
    assert sr.shape == (2, 32, 32, 3)


def test_srflow_trainer_step_and_freeze():
    from trainner_tpu.train.srflow_trainer import SRFlowTrainer

    opt = {"is_train": True, "scale": 4, "model": "srflow",
           "network_G": {"type": "srflow_net", "nf": 8, "nb": 2, "gc": 4,
                         "scale": 4, "K": 2,
                         "flow": {"L": 3, "hidden_channels": 8}},
           "train": {"lr_G": 1e-4, "niter": 100, "fl_weight": 1.0,
                     "train_RRDB_delay": 0.5,
                     "lr_scheme": "MultiStepLR", "lr_steps": [50]}}
    tr = SRFlowTrainer(opt)
    rng = np.random.default_rng(0)
    batch = {"LR": rng.random((2, 8, 8, 3), np.float32),
             "HR": rng.random((2, 32, 32, 3), np.float32)}
    state = tr.init_state(jax.random.PRNGKey(0), (2, 8, 8, 3))
    rrdb_before = jax.tree.leaves(state.g.params["RRDB"])[0].copy()
    state, logs = tr.train_step(state, batch)
    assert np.isfinite(float(logs["nll"]))
    # RRDB frozen at step 0 (delay 0.5 * 100 = 50)
    rrdb_after = jax.tree.leaves(state.g.params["RRDB"])[0]
    assert np.allclose(np.asarray(rrdb_before), np.asarray(rrdb_after))
    sr = tr.eval_step(state, jnp.asarray(batch["LR"]), heat=0.5)
    assert sr.shape == (2, 32, 32, 3)


def test_srflow_full_invertibility_with_splits():
    """With all epses returned and fed back, reverse(forward(gt)) == gt
    even across split layers (complete glow invertibility)."""
    net = SRFlowNet(nf=8, nb=2, gc=4, scale=4, K=2, L=3,
                    hidden_channels=8)
    lr = jax.random.uniform(RNG, (1, 8, 8, 3))
    hr = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    v = net.init(RNG, gt=hr, lr=lr, reverse=False, rng=RNG)
    epses, nll, _ = net.apply(v, gt=hr, lr=lr, reverse=False,
                              add_gt_noise=False, return_epses=True)
    assert len(epses) == 3  # 2 splits + final z
    hr_rec, _ = net.apply(v, lr=lr, reverse=True, epses=epses)
    assert np.allclose(np.asarray(hr_rec), np.asarray(hr), atol=2e-3)
