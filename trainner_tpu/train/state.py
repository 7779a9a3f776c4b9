"""Functional train state: the TPU-native replacement for the reference's
mutable ``BaseModel`` strategy object (ref codes/models/base_model.py).

Everything the reference mutates in-place (network weights, optimizer
moments, SWA average, AMP scaler) becomes an explicit pytree carried through
the jitted train step; checkpointing serializes the whole state (see
utils/checkpoint.py), mirroring the {iter}_{net}.pth + {iter}.state pair
(ref base_model.py:160,454).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct


class NetState(struct.PyTreeNode):
    """One network's learnable + auxiliary variables + optimizer moments.

    extra: non-trained collections (flax 'batch_stats' incl. spectral-norm
    power-iteration vectors).
    """

    params: Any
    opt_state: Any = None
    extra: Dict[str, Any] = struct.field(default_factory=dict)

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, **self.extra}


class SRTrainState(struct.PyTreeNode):
    """GAN training state: G (+ optional D), SWA/EMA averages, step, rng.

    swa (ref models/swa.py AveragedModel): equal-weight running average of
    G params, refreshed every swa step after swa_start_iter.
    ema: classic exponential average (the reference reserves `use_ema`
    checkpoint keys without implementing it — we implement it for real).
    """

    step: jnp.ndarray
    rng: jax.Array
    g: NetState
    d: Optional[NetState] = None
    swa_params: Optional[Any] = None
    swa_n: Optional[jnp.ndarray] = None
    ema_params: Optional[Any] = None
    loc: Optional[NetState] = None  # AdaTarget LocNet (ref setup_atg:603)
    # auto-grad-clip norm history ring buffer (ref base_model.py:94
    # grad_history; {vals: (K,) f32, n: i32})
    grad_hist: Optional[Dict[str, Any]] = None

    @property
    def int_step(self) -> int:
        return int(self.step)


def init_swa(state: SRTrainState) -> SRTrainState:
    return state.replace(swa_params=jax.tree.map(jnp.copy, state.g.params),
                         swa_n=jnp.zeros([], jnp.int32))


def swa_update(state: SRTrainState) -> SRTrainState:
    """avg <- (avg * n + p) / (n + 1) (torch AveragedModel default)."""
    n = state.swa_n.astype(jnp.float32)
    new = jax.tree.map(lambda a, p: (a * n + p) / (n + 1.0),
                       state.swa_params, state.g.params)
    return state.replace(swa_params=new, swa_n=state.swa_n + 1)


def ema_update(state: SRTrainState, decay: float) -> SRTrainState:
    new = jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                       state.ema_params, state.g.params)
    return state.replace(ema_params=new)


def refresh_bn_stats(apply_fn, params: Any, extra: Dict[str, Any],
                     batches) -> Dict[str, Any]:
    """Recompute BatchNorm running statistics for `params` over `batches`
    (the reference's torch.optim.swa_utils.update_bn, invoked on SWA save
    — ref base_model.py:180): reset stats, then cumulative-average the
    per-batch statistics, exactly what update_bn's momentum=None does.

    apply_fn(variables, x, train, mutable) -> (y, new_collections).
    Returns a new `extra` dict with refreshed 'batch_stats'; other
    collections pass through unchanged.
    """
    if "batch_stats" not in extra:
        return extra
    momentum = 0.99  # flax BatchNorm default; used to recover batch stats
    zero_stats = jax.tree.map(jnp.zeros_like, extra["batch_stats"])
    acc = None
    n = 0
    for x in batches:
        variables = {"params": params, **extra, "batch_stats": zero_stats}
        _, new_cols = apply_fn(variables, x, True, ["batch_stats"])
        new_stats = dict(new_cols)["batch_stats"]
        # recover the raw batch statistic: updated = m*0 + (1-m)*batch
        batch_stats = jax.tree.map(lambda v: v / (1.0 - momentum),
                                   new_stats)
        if acc is None:
            acc = batch_stats
        else:
            acc = jax.tree.map(lambda a, b: a + b, acc, batch_stats)
        n += 1
    if n == 0:
        return extra
    mean_stats = jax.tree.map(lambda a: a / float(n), acc)
    out = dict(extra)
    out["batch_stats"] = mean_stats
    return out
