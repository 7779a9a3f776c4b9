"""Optimizers (optax): behavioral equivalents of ref codes/models/
optimizers.py:74 (config_optimizer) and the vendored implementations under
codes/models/modules/optimizers/ (adamp/sgdp, ranger = RAdam + LookAhead +
gradient centralization, madgrad).

TPU-first design: the learning rate is NOT baked into the transform chain —
`Optimizer.update(grads, state, params, lr)` takes lr as a traced scalar so
the jitted train step never recompiles when the host-side scheduler (see
schedulers.py) changes the lr (warmup, restarts, plateau). Decoupled weight
decay is applied inside, pre-lr, matching AdamW/AdamP semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def _tree_map2(f, a, b):
    return jax.tree.map(f, a, b)


# ---------------------------------------------------------------------------
# gradient centralization (ranger option; ref ranger.py use_gc)
# ---------------------------------------------------------------------------


def centralize_gradients() -> optax.GradientTransformation:
    """Subtract per-filter gradient mean for conv/dense kernels (ndim > 1)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def gc(g):
            if g.ndim > 1:
                axes = tuple(range(1, g.ndim))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree.map(gc, updates), state

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# AdamP / SGDP projection (ref modules/optimizers/adamp/)
# ---------------------------------------------------------------------------


def _channel_view(x):
    return x.reshape(x.shape[0], -1)


def _layer_view(x):
    return x.reshape(1, -1)


def _cosine_similarity(a, b, eps):
    an = jnp.linalg.norm(a, axis=1) + eps
    bn = jnp.linalg.norm(b, axis=1) + eps
    dot = jnp.sum(a * b, axis=1)
    return jnp.abs(dot) / (an * bn)


def _adamp_project(p, grad, perturb, delta: float, wd_ratio: float,
                   eps: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project out the radial component for scale-invariant params.

    Returns (perturb, wd_scale). Mirrors adamp.py's projection: if the
    gradient is (nearly) orthogonal to the weight in channel or layer view,
    remove the component of the update along the weight direction and shrink
    weight decay by wd_ratio.
    """
    if p.ndim < 2:
        return perturb, jnp.asarray(1.0, p.dtype)

    def proj_in_view(view):
        pv, gv = view(p), view(grad)
        cos = _cosine_similarity(gv, pv, eps)
        thresh = delta / jnp.sqrt(jnp.asarray(pv.shape[1], jnp.float32))
        cond = jnp.max(cos) < thresh
        expand = pv / (jnp.linalg.norm(pv, axis=1, keepdims=True) + eps)
        pert_v = view(perturb)
        proj = pert_v - expand * jnp.sum(pert_v * expand, axis=1,
                                         keepdims=True)
        return cond, proj.reshape(p.shape)

    # channel view wins over layer view (adamp.py's early return)
    c_cond, c_proj = proj_in_view(_channel_view)
    l_cond, l_proj = proj_in_view(_layer_view)
    out = jnp.where(c_cond, c_proj, jnp.where(l_cond, l_proj, perturb))
    fired = jnp.logical_or(c_cond, l_cond)
    wd = jnp.where(fired, jnp.asarray(wd_ratio, jnp.float32), 1.0)
    return out, wd.astype(p.dtype)


class ScaleByAdamPState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adamp(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   delta: float = 0.1, wd_ratio: float = 0.1,
                   weight_decay: float = 0.0,
                   nesterov: bool = False) -> optax.GradientTransformation:
    """AdamP (ref modules/optimizers/adamp/adamp.py)."""

    def init(params):
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        return ScaleByAdamPState(jnp.zeros([], jnp.int32), mu, nu)

    def update(updates, state, params):
        count = state.count + 1
        b1c = 1 - b1 ** count.astype(jnp.float32)
        b2c = 1 - b2 ** count.astype(jnp.float32)
        mu = _tree_map2(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = _tree_map2(lambda v, g: b2 * v + (1 - b2) * g * g,
                        state.nu, updates)

        def direction(m, v, g, p):
            denom = jnp.sqrt(v / b2c) + eps
            if nesterov:
                step = (b1 * m / b1c + (1 - b1) * g) / denom
            else:
                step = (m / b1c) / denom
            step, wd_scale = _adamp_project(p, g, step, delta, wd_ratio, eps)
            if weight_decay:
                step = step + weight_decay * wd_scale * p
            return step

        out = jax.tree.map(direction, mu, nu, updates, params)
        return out, ScaleByAdamPState(count, mu, nu)

    return optax.GradientTransformation(init, update)


class ScaleBySGDPState(NamedTuple):
    momentum: Any


def scale_by_sgdp(momentum: float = 0.9, dampening: float = 0.0,
                  eps: float = 1e-8, delta: float = 0.1,
                  wd_ratio: float = 1.0, weight_decay: float = 0.0,
                  nesterov: bool = False) -> optax.GradientTransformation:
    """SGDP (ref modules/optimizers/adamp/sgdp.py)."""

    def init(params):
        return ScaleBySGDPState(jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params):
        buf = _tree_map2(lambda b, g: momentum * b + (1 - dampening) * g,
                         state.momentum, updates)

        def direction(b, g, p):
            d = g + momentum * b if nesterov else b
            d, wd_scale = _adamp_project(p, g, d, delta, wd_ratio, eps)
            if weight_decay:
                d = d + weight_decay * wd_scale * p
            return d

        out = jax.tree.map(direction, buf, updates, params)
        return out, ScaleBySGDPState(buf)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# RAdam + LookAhead = Ranger (ref modules/optimizers/ranger/ranger.py)
# ---------------------------------------------------------------------------


class LookaheadState(NamedTuple):
    slow: Any
    count: jnp.ndarray


def lookahead(k: int = 6, alpha: float = 0.5) -> optax.GradientTransformation:
    """LookAhead wrapper as a terminal transform: every k steps pull the
    fast weights toward the slow copy. Expects to run AFTER the lr scaling
    (i.e. updates are the final deltas); we emulate by correcting the update
    so that params+update lands on the interpolated point."""

    def init(params):
        return LookaheadState(jax.tree.map(jnp.copy, params),
                              jnp.zeros([], jnp.int32))

    def update(updates, state, params):
        count = state.count + 1
        sync = (count % k) == 0

        def upd(u, s, p):
            fast = p + u
            slow_new = s + alpha * (fast - s)
            return jnp.where(sync, slow_new - p, u)

        def slow_upd(u, s, p):
            fast = p + u
            return jnp.where(sync, s + alpha * (fast - s), s)

        new_updates = jax.tree.map(upd, updates, state.slow, params)
        new_slow = jax.tree.map(slow_upd, updates, state.slow, params)
        return new_updates, LookaheadState(new_slow, count)

    return optax.GradientTransformation(init, update)


class ScaleByRAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_radam(b1: float = 0.95, b2: float = 0.999,
                   eps: float = 1e-5) -> optax.GradientTransformation:
    """Rectified Adam core (ranger.py math, branch-free via jnp.where)."""

    def init(params):
        return ScaleByRAdamState(jnp.zeros([], jnp.int32),
                                 jax.tree.map(jnp.zeros_like, params),
                                 jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = _tree_map2(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = _tree_map2(lambda v, g: b2 * v + (1 - b2) * g * g,
                        state.nu, updates)
        b2t = b2 ** t
        n_sma_max = 2.0 / (1 - b2) - 1
        n_sma = n_sma_max - 2 * t * b2t / (1 - b2t)
        rect = jnp.sqrt(((n_sma - 4) * (n_sma - 2) * n_sma_max) /
                        jnp.maximum((n_sma_max - 4) * (n_sma_max - 2) * n_sma,
                                    1e-12))
        use_var = n_sma >= 5.0
        b1c = 1 - b1 ** t

        def direction(m, v):
            var_step = rect * (m / b1c) / (jnp.sqrt(v / (1 - b2t)) + eps)
            sgd_step = m / b1c
            return jnp.where(use_var, var_step, sgd_step)

        return jax.tree.map(direction, mu, nu), \
            ScaleByRAdamState(count, mu, nu)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# MADGRAD (ref modules/optimizers/madgrad.py)
# ---------------------------------------------------------------------------


class MadgradState(NamedTuple):
    count: jnp.ndarray
    grad_sum_sq: Any
    s: Any
    x0: Any




# ---------------------------------------------------------------------------
# public wrapper
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Optimizer:
    """lr-at-update-time optimizer. `update` returns final param deltas."""

    tx: optax.GradientTransformation
    sign: float = -1.0  # descent

    def init(self, params):
        return self.tx.init(params)

    def update(self, grads, opt_state, params, lr):
        updates, opt_state = self.tx.update(grads, opt_state, params)
        lr = jnp.asarray(lr, jnp.float32)
        updates = jax.tree.map(lambda u: self.sign * lr * u, updates)
        return updates, opt_state

    def apply(self, grads, opt_state, params, lr):
        updates, opt_state = self.update(grads, opt_state, params, lr)
        return optax.apply_updates(params, updates), opt_state


def build_optimizer(name: str = "adam", *, beta1: float = 0.9,
                    beta2: float = 0.999, eps: float = 1e-8,
                    weight_decay: float = 0.0, momentum: float = 0.9,
                    nesterov: bool = False,
                    use_gc: bool = False, lookahead_k: int = 6,
                    lookahead_alpha: float = 0.5,
                    **_: Any) -> Optimizer:
    """String → Optimizer (ref models/optimizers.py:74 registry)."""
    name = (name or "adam").lower()
    chain = []
    if name in ("adam", "adamw"):
        chain.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
    elif name == "sgd":
        chain.append(optax.trace(decay=momentum, nesterov=nesterov))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
    elif name == "rmsprop":
        chain.append(optax.scale_by_rms(decay=0.99, eps=eps))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
    elif name == "adamp":
        chain.append(scale_by_adamp(b1=beta1, b2=beta2, eps=eps,
                                    weight_decay=weight_decay,
                                    nesterov=nesterov))
    elif name == "sgdp":
        chain.append(scale_by_sgdp(momentum=momentum, eps=eps,
                                   weight_decay=weight_decay,
                                   nesterov=nesterov))
    elif name == "ranger":
        if use_gc:
            chain.append(centralize_gradients())
        chain.append(scale_by_radam(b1=beta1 if beta1 != 0.9 else 0.95,
                                    b2=beta2, eps=1e-5))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
    elif name == "madgrad":
        return _MadgradOptimizer(momentum=momentum, eps=eps,
                                 weight_decay=weight_decay)
    else:
        raise NotImplementedError(f"optimizer [{name}] not recognized")
    tx = optax.chain(*chain)
    if name == "ranger":
        # lookahead must see post-lr deltas; Optimizer scales by lr after the
        # chain, so wrap at the Optimizer level instead.
        return _RangerOptimizer(tx, lookahead_k, lookahead_alpha)
    return Optimizer(tx)


class _MadgradOptimizer(Optimizer):
    """Exact MADGRAD (ref modules/optimizers/madgrad/madgrad.py step:69):
    dual averaging where the learning rate enters the accumulated
    statistics (lamb = (lr+eps) * sqrt(k+1)), second moments take a cube
    root, and params are a (1-momentum)-weighted moving average of the
    dual iterate z. lr is therefore consumed inside update(), not applied
    externally. Trajectory-exact vs the reference
    (tests/test_optimizer_parity.py)."""

    def __init__(self, momentum: float = 0.9, eps: float = 1e-6,
                 weight_decay: float = 0.0):
        object.__setattr__(self, "tx", None)
        object.__setattr__(self, "sign", 1.0)
        object.__setattr__(self, "momentum", momentum)
        object.__setattr__(self, "eps", eps)
        object.__setattr__(self, "weight_decay", weight_decay)

    def init(self, params):
        return MadgradState(jnp.zeros([], jnp.int32),
                            jax.tree.map(jnp.zeros_like, params),
                            jax.tree.map(jnp.zeros_like, params),
                            jax.tree.map(jnp.copy, params))

    def update(self, grads, opt_state, params, lr):
        k = opt_state.count
        lr_eff = jnp.asarray(lr, jnp.float32) + self.eps
        lamb = lr_eff * jnp.sqrt(k.astype(jnp.float32) + 1.0)
        mom, eps, wd = self.momentum, self.eps, self.weight_decay
        ck = 1.0 - mom

        def upd(g, gss, s, x0, p):
            if wd:
                g = g + wd * p
            if mom == 0.0:
                # x0 reconstructed from current state (ref :155-157)
                rms0 = jnp.cbrt(gss) + eps
                x0 = p + s / rms0
            gss_n = gss + lamb * g * g
            rms = jnp.cbrt(gss_n) + eps
            s_n = s + lamb * g
            z = x0 - s_n / rms
            p_new = z if mom == 0.0 else (1.0 - ck) * p + ck * z
            return p_new - p, gss_n, s_n

        flat_g, tdef = jax.tree.flatten(grads)
        flat_gss = tdef.flatten_up_to(opt_state.grad_sum_sq)
        flat_s = tdef.flatten_up_to(opt_state.s)
        flat_x = tdef.flatten_up_to(opt_state.x0)
        flat_p = tdef.flatten_up_to(params)
        outs = [upd(*t) for t in
                zip(flat_g, flat_gss, flat_s, flat_x, flat_p)]
        deltas = tdef.unflatten([o[0] for o in outs])
        new_gss = tdef.unflatten([o[1] for o in outs])
        new_s = tdef.unflatten([o[2] for o in outs])
        return deltas, MadgradState(k + 1, new_gss, new_s, opt_state.x0)


class _RangerOptimizer(Optimizer):
    """Ranger = RAdam chain + LookAhead applied to the final (lr-scaled)
    deltas."""

    def __init__(self, tx, k: int, alpha: float):
        object.__setattr__(self, "tx", tx)
        object.__setattr__(self, "sign", -1.0)
        object.__setattr__(self, "_la", lookahead(k, alpha))

    def init(self, params):
        return (self.tx.init(params), self._la.init(params))

    def update(self, grads, opt_state, params, lr):
        inner, la_state = opt_state
        updates, inner = self.tx.update(grads, inner, params)
        lr = jnp.asarray(lr, jnp.float32)
        updates = jax.tree.map(lambda u: self.sign * lr * u, updates)
        updates, la_state = self._la.update(updates, la_state, params)
        return updates, (inner, la_state)
