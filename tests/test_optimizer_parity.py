"""Optimizer parity vs the reference's torch implementations
(ref codes/models/modules/optimizers/: adamp, ranger) on an identical
deterministic toy problem. Skipped without torch/reference."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/codes"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)


def _toy_problem():
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(8, 4)).astype(np.float32)
    a = rng.normal(size=(16, 8)).astype(np.float32)
    b = rng.normal(size=(16, 4)).astype(np.float32)
    return w0, a, b


def _run_torch(opt_ctor, w0, a, b, lr, steps):
    w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = opt_ctor([w], lr)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    for _ in range(steps):
        opt.zero_grad()
        loss = ((ta @ w - tb) ** 2).mean()
        loss.backward()
        opt.step()
    return w.detach().numpy()


def _run_ours(name, w0, a, b, lr, steps, **kw):
    import jax
    import jax.numpy as jnp

    from trainner_tpu.train.optimizers import build_optimizer

    opt = build_optimizer(name, **kw)
    params = {"w": jnp.asarray(w0.copy())}
    state = opt.init(params)
    ja, jb = jnp.asarray(a), jnp.asarray(b)

    def loss_fn(p):
        return jnp.mean((ja @ p["w"] - jb) ** 2)

    for _ in range(steps):
        grads = jax.grad(loss_fn)(params)
        params, state = opt.apply(grads, state, params, jnp.float32(lr))
    return np.asarray(params["w"])


def _load_ref_module(rel):
    """Load a reference optimizer file directly (bypasses the package
    __init__ chain, which needs torchvision)."""
    import importlib.util

    path = os.path.join(REF, rel)
    spec = importlib.util.spec_from_file_location(
        "ref_" + os.path.basename(rel)[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_adamp_matches_reference():
    AdamP = _load_ref_module(
        "models/modules/optimizers/adamp/adamp.py").AdamP

    w0, a, b = _toy_problem()
    ref = _run_torch(lambda p, lr: AdamP(p, lr=lr), w0, a, b, 1e-2, 20)
    ours = _run_ours("adamp", w0, a, b, 1e-2, 20)
    assert np.abs(ours - ref).max() < 2e-4, np.abs(ours - ref).max()


def test_sgdp_matches_reference():
    SGDP = _load_ref_module(
        "models/modules/optimizers/adamp/sgdp.py").SGDP

    w0, a, b = _toy_problem()
    ref = _run_torch(lambda p, lr: SGDP(p, lr=lr, momentum=0.9), w0, a, b,
                     1e-2, 20)
    ours = _run_ours("sgdp", w0, a, b, 1e-2, 20, momentum=0.9)
    assert np.abs(ours - ref).max() < 2e-4, np.abs(ours - ref).max()


def test_adam_matches_torch():
    w0, a, b = _toy_problem()
    ref = _run_torch(lambda p, lr: torch.optim.Adam(p, lr=lr), w0, a, b,
                     1e-2, 20)
    ours = _run_ours("adam", w0, a, b, 1e-2, 20)
    assert np.abs(ours - ref).max() < 2e-4


def test_ranger_matches_reference():
    Ranger = _load_ref_module(
        "models/modules/optimizers/ranger/ranger.py").Ranger

    w0, a, b = _toy_problem()
    # 20 steps spans RAdam's rectification warmup and 3 LookAhead syncs
    ref = _run_torch(lambda p, lr: Ranger(p, lr=lr), w0, a, b, 1e-2, 20)
    ours = _run_ours("ranger", w0, a, b, 1e-2, 20, use_gc=True)
    assert np.abs(ours - ref).max() < 2e-4, np.abs(ours - ref).max()


def test_madgrad_matches_reference():
    MADGRAD = _load_ref_module(
        "models/modules/optimizers/madgrad/madgrad.py").MADGRAD

    w0, a, b = _toy_problem()
    ref = _run_torch(lambda p, lr: MADGRAD(p, lr=lr), w0, a, b, 1e-2, 20)
    ours = _run_ours("madgrad", w0, a, b, 1e-2, 20)
    assert np.abs(ours - ref).max() < 2e-4, np.abs(ours - ref).max()
