"""LR schedule parity vs torch.optim.lr_scheduler (ref schedulers.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from trainner_tpu.train.schedulers import build_scheduler


def _torch_lrs(sched_ctor, lr, steps):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    sched = sched_ctor(opt)
    out = []
    for _ in range(steps):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(out)


def test_multistep_matches_torch():
    lr = 1e-3
    ours = build_scheduler({"lr_scheme": "MultiStepLR",
                            "lr_steps": [5, 10], "lr_gamma": 0.5},
                           base_lr=lr, niter=20)
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.MultiStepLR(
        o, milestones=[5, 10], gamma=0.5), lr, 20)
    got = np.asarray([ours.get_lr(i) for i in range(20)])
    assert np.allclose(got, ref, rtol=1e-6), (got, ref)


def test_steplr_matches_torch():
    lr = 1e-3
    ours = build_scheduler({"lr_scheme": "StepLR", "lr_step_size": 4,
                            "lr_gamma": 0.1}, base_lr=lr, niter=12)
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.StepLR(
        o, step_size=4, gamma=0.1), lr, 12)
    got = np.asarray([ours.get_lr(i) for i in range(12)])
    assert np.allclose(got, ref, rtol=1e-6)


def test_cosine_matches_torch():
    lr = 1e-3
    ours = build_scheduler({"lr_scheme": "CosineAnnealingLR",
                            "lr_T_max": 10, "eta_min": 1e-5},
                           base_lr=lr, niter=10)
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
        o, T_max=10, eta_min=1e-5), lr, 10)
    got = np.asarray([ours.get_lr(i) for i in range(10)])
    assert np.allclose(got, ref, rtol=1e-5), (got, ref)
