"""LR schedulers: behavioral equivalents of ref codes/models/schedulers.py
(get_schedulers:9 — MultiStepLR(+_Restart:129), StepLR(+_Restart:166),
ProgressiveMultiStepLR:191, CosineAnnealingLR(+_Restart:215),
ReduceLROnPlateau:115, LambdaLR, Linear, FlatCosineDecay) plus the warmup +
SWA switchover logic of base_model.update_learning_rate:246.

TPU-first design: schedules run on the HOST as pure ``lr(step)`` functions
(plus a small stateful object for plateau); the resulting scalar is fed into
the jitted train step each iteration, so no schedule ever triggers an XLA
recompile. This replaces torch's stateful `_LRScheduler.step()` chain.
"""

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence


def _multistep(base_lr: float, milestones: Sequence[int], gamma: float,
               step: int) -> float:
    return base_lr * gamma ** bisect.bisect_right(sorted(milestones), step)


def _multistep_restart(base_lr: float, milestones: Sequence[int],
                       gamma: float, restarts: Sequence[int],
                       restart_weights: Sequence[float], step: int) -> float:
    """MultiStepLR_Restart (ref schedulers.py:129): at each restart step the
    lr resets to base_lr * weight and milestone counting restarts."""
    restarts = sorted(restarts or [])
    weights = list(restart_weights or [1.0] * len(restarts))
    seg = bisect.bisect_right(restarts, step)
    seg_start = restarts[seg - 1] if seg > 0 else 0
    w = weights[seg - 1] if seg > 0 else 1.0
    local = step - seg_start
    ms = sorted(m - seg_start for m in milestones if m > seg_start)
    return base_lr * w * gamma ** bisect.bisect_right(ms, local)


def _step_lr(base_lr: float, step_size: int, gamma: float, step: int) -> float:
    return base_lr * gamma ** (step // max(step_size, 1))


def _cosine(base_lr: float, t_max: int, eta_min: float, step: int) -> float:
    t = min(step, t_max)
    return eta_min + (base_lr - eta_min) * \
        (1 + math.cos(math.pi * t / max(t_max, 1))) / 2


def _cosine_restart(base_lr: float, periods: Sequence[int],
                    restart_weights: Sequence[float], eta_min: float,
                    step: int) -> float:
    """CosineAnnealingLR_Restart (ref schedulers.py:215): consecutive cosine
    periods, each rescaled by its restart weight."""
    cum = 0
    for i, p in enumerate(periods):
        if step < cum + p or i == len(periods) - 1:
            w = restart_weights[i] if i < len(restart_weights) else 1.0
            return eta_min + (base_lr * w - eta_min) * \
                (1 + math.cos(math.pi * min(step - cum, p) / max(p, 1))) / 2
        cum += p
    return eta_min


def _linear(base_lr: float, niter: int, fixed: int, step: int) -> float:
    """Linear decay to 0 after `fixed` iters (ref CycleGAN-style lambda)."""
    if step <= fixed:
        return base_lr
    denom = max(niter - fixed, 1)
    return base_lr * max(0.0, 1.0 - (step - fixed) / denom)


def _flat_cosine(base_lr: float, niter: int, fixed: int, step: int) -> float:
    """Flat until `fixed`, then half-cosine to 0 (ref FlatCosineDecay)."""
    if step <= fixed:
        return base_lr
    t = (step - fixed) / max(niter - fixed, 1)
    return base_lr * (1 + math.cos(math.pi * min(t, 1.0))) / 2


@dataclass
class Scheduler:
    """Host-side lr provider.

    get_lr(step) -> float; for plateau schedules call
    `plateau_step(metric)` after each validation (ref ReduceLROnPlateau).
    Warmup (ref base_model.py:246-298): linear ramp from 0 over
    `warmup_iters`.
    SWA switchover: after `swa_start_iter`, a constant `swa_lr` (SWALR).
    """

    fn: Callable[[int], float]
    base_lr: float
    warmup_iters: int = 0
    swa_start_iter: Optional[int] = None
    swa_lr: float = 0.0
    # plateau state
    plateau: bool = False
    plateau_mode: str = "max"
    plateau_factor: float = 0.5
    plateau_patience: int = 10
    plateau_threshold: float = 1e-4
    plateau_min_lr: float = 0.0
    _plateau_scale: float = field(default=1.0, repr=False)
    _plateau_best: Optional[float] = field(default=None, repr=False)
    _plateau_bad: int = field(default=0, repr=False)

    def get_lr(self, step: int) -> float:
        if self.swa_start_iter is not None and step > self.swa_start_iter \
                and self.swa_lr:
            return self.swa_lr
        lr = self.fn(step) * self._plateau_scale
        if self.warmup_iters and step < self.warmup_iters:
            lr = lr * (step + 1) / self.warmup_iters
        return max(lr, self.plateau_min_lr if self.plateau else 0.0)

    def plateau_step(self, metric: float) -> None:
        if not self.plateau:
            return
        better = (self._plateau_best is None or
                  (metric > self._plateau_best + self.plateau_threshold
                   if self.plateau_mode == "max" else
                   metric < self._plateau_best - self.plateau_threshold))
        if better:
            self._plateau_best = metric
            self._plateau_bad = 0
        else:
            self._plateau_bad += 1
            if self._plateau_bad > self.plateau_patience:
                self._plateau_scale *= self.plateau_factor
                self._plateau_bad = 0

    def state_dict(self) -> Dict:
        return {"plateau_scale": self._plateau_scale,
                "plateau_best": self._plateau_best,
                "plateau_bad": self._plateau_bad}

    def load_state_dict(self, d: Dict) -> None:
        self._plateau_scale = d.get("plateau_scale", 1.0)
        self._plateau_best = d.get("plateau_best")
        self._plateau_bad = d.get("plateau_bad", 0)


def build_scheduler(train_opt: dict, base_lr: Optional[float] = None,
                    niter: int = 500000) -> Scheduler:
    """Build from the reference's train-option keys (lr_scheme, lr_steps,
    lr_gamma, restarts, restart_weights, T_period, eta_min, lr_step_size,
    warmup_iters, fixed_niter, swa_start_iter/swa_lr, plateau knobs)."""
    train_opt = train_opt or {}
    scheme = (train_opt.get("lr_scheme") or "MultiStepLR")
    lr = float(base_lr if base_lr is not None
               else train_opt.get("lr_G", 1e-4) or 1e-4)
    gamma = float(train_opt.get("lr_gamma", 0.5) or 0.5)
    steps = list(train_opt.get("lr_steps") or
                 train_opt.get("lr_steps_rel") or [])
    restarts = list(train_opt.get("restarts") or [])
    rweights = list(train_opt.get("restart_weights") or [])
    eta_min = float(train_opt.get("eta_min", 0.0) or 0.0)
    fixed = int(train_opt.get("fixed_niter", 0) or
                train_opt.get("fixed_niter_rel", 0) or 0)
    key = scheme.lower()

    if key in ("multisteplr", "multistep"):
        fn = lambda s: _multistep(lr, steps, gamma, s)  # noqa: E731
    elif key in ("multisteplr_restart", "multistep_restart"):
        fn = lambda s: _multistep_restart(lr, steps, gamma,  # noqa: E731
                                          restarts, rweights, s)
    elif key in ("steplr", "steplr_restart", "step"):
        size = int(train_opt.get("lr_step_size",
                                 train_opt.get("lr_step_sizes", [50000])[0]
                                 if train_opt.get("lr_step_sizes")
                                 else 50000))
        fn = lambda s: _step_lr(lr, size, gamma, s)  # noqa: E731
    elif key in ("progressivemultisteplr",):
        fn = lambda s: _multistep(lr, steps, gamma, s)  # noqa: E731
    elif key in ("cosineannealinglr", "cosine"):
        t_max = int(train_opt.get("T_max", niter) or niter)
        fn = lambda s: _cosine(lr, t_max, eta_min, s)  # noqa: E731
    elif key in ("cosineannealinglr_restart", "cosine_restart"):
        periods = list(train_opt.get("T_period") or [niter])
        fn = lambda s: _cosine_restart(lr, periods, rweights,  # noqa: E731
                                       eta_min, s)
    elif key in ("linear",):
        fn = lambda s: _linear(lr, niter, fixed, s)  # noqa: E731
    elif key in ("flatcosine", "flatcosinedecay"):
        fn = lambda s: _flat_cosine(lr, niter, fixed, s)  # noqa: E731
    elif key in ("lambdalr",):
        fn = lambda s: _linear(lr, niter, fixed, s)  # noqa: E731
    elif key in ("reducelronplateau", "plateau"):
        fn = lambda s: lr  # noqa: E731
    else:
        raise NotImplementedError(f"lr_scheme [{scheme}] not recognized")

    sched = Scheduler(
        fn=fn, base_lr=lr,
        warmup_iters=int(train_opt.get("warmup_iters", 0) or 0),
        swa_start_iter=train_opt.get("swa_start_iter"),
        swa_lr=float(train_opt.get("swa_lr", 0.0) or 0.0),
        plateau=key in ("reducelronplateau", "plateau"),
        plateau_mode=train_opt.get("plateau_mode", "max"),
        plateau_factor=float(train_opt.get("plateau_factor", 0.5) or 0.5),
        plateau_patience=int(train_opt.get("plateau_patience", 10) or 10),
        plateau_threshold=float(train_opt.get("plateau_threshold", 1e-4)
                                or 1e-4),
        plateau_min_lr=float(train_opt.get("plateau_min_lr", 0.0) or 0.0))
    return sched
