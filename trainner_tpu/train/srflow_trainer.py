"""SRFlow trainer: NLL objective with delayed RRDB unfreeze.

Equivalent of ref codes/models/SRFlow_model.py:12 (SRFlowModel): loss =
fl_weight * nll (+ optional pixel losses on sampled output); RRDB encoder
params frozen until train_RRDB_delay * niter (ref :25-37); validation
samples at multiple heats (temperatures).

TPU-native: freeze = zero-mask on the RRDB subtree's gradients inside the
jitted step (two cached jit specializations, frozen/unfrozen — same
technique as the G/D schedule in SRTrainer).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.networks import define_G
from .optimizers import build_optimizer
from .schedulers import build_scheduler
from .state import NetState, SRTrainState
from .sr_trainer import clip_grads


class SRFlowTrainer:
    def __init__(self, opt: dict, mesh: Optional[Mesh] = None,
                 dtype=jnp.float32):
        self.opt = opt
        self.mesh = mesh
        train_opt = opt.get("train") or {}
        self.train_opt = train_opt
        self.netG = define_G(opt, dtype=dtype)
        self.scale = int(opt.get("scale", 4) or 4)
        self.fl_weight = float(train_opt.get("fl_weight", 1.0) or 1.0)
        niter = int(float(train_opt.get("niter", 5e5) or 5e5))
        delay_frac = train_opt.get("train_RRDB_delay")
        self.rrdb_unfreeze_iter = int(float(delay_frac) * niter) \
            if delay_frac else 0
        self.heats = (opt.get("val") or {}).get("heats") or [0.0, 0.5, 0.75]

        self.optG = build_optimizer(train_opt.get("optim_G", "adam"))
        self.schedG = build_scheduler(train_opt,
                                      base_lr=train_opt.get("lr_G", 2e-4),
                                      niter=niter)
        self.grad_clip = train_opt.get("grad_clip", "norm")
        self.grad_clip_value = float(train_opt.get("grad_clip_value", 1.0)
                                     or 1.0)
        self._jit_cache: Dict[bool, Any] = {}

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, lr_shape, hr_shape=None
                   ) -> SRTrainState:
        rng, rg, rstate = jax.random.split(rng, 3)
        if hr_shape is None:
            b, h, w, c = lr_shape
            hr_shape = (b, h * self.scale, w * self.scale, c)
        lr0 = jnp.zeros(lr_shape, jnp.float32)
        hr0 = jnp.zeros(hr_shape, jnp.float32)
        g_vars = jax.jit(lambda r, a, b_: self.netG.init(
            r, gt=b_, lr=a, reverse=False, rng=r))(rg, lr0, hr0)
        g = NetState(params=g_vars["params"],
                     opt_state=self.optG.init(g_vars["params"]),
                     extra={k: v for k, v in g_vars.items()
                            if k != "params"})
        return SRTrainState(step=jnp.zeros([], jnp.int32), rng=rstate, g=g)

    # ------------------------------------------------------------------
    def _train_step(self, state: SRTrainState, batch, lr_g,
                    *, train_rrdb: bool):
        rng, r_noise = jax.random.split(state.rng)
        lr_img = batch["LR"].astype(jnp.float32)
        hr_img = batch["HR"].astype(jnp.float32)

        def forward(params):
            _, nll, _ = self.netG.apply(
                {"params": params, **state.g.extra}, gt=hr_img, lr=lr_img,
                reverse=False, rng=r_noise)
            loss = self.fl_weight * jnp.mean(nll)
            return loss, {"nll": jnp.mean(nll)}

        (loss, logs), grads = jax.value_and_grad(
            forward, has_aux=True)(state.g.params)
        if not train_rrdb:
            # zero the RRDB-encoder subtree (ref set_rrdb_training);
            # "RRDB" in the TPU redesign, "encoder" in the interop net
            enc_key = "RRDB" if "RRDB" in grads else "encoder"
            grads = {**grads, enc_key: jax.tree.map(jnp.zeros_like,
                                                    grads[enc_key])}
        grads = clip_grads(grads, self.grad_clip, self.grad_clip_value)
        params, opt_state = self.optG.apply(grads, state.g.opt_state,
                                            state.g.params, lr_g)
        logs = dict(logs)
        logs["l_g_total"] = loss
        return state.replace(step=state.step + 1, rng=rng,
                             g=state.g.replace(params=params,
                                               opt_state=opt_state)), logs

    def train_step(self, state: SRTrainState, batch: Dict[str, Any]):
        if getattr(self, "_host_step", None) is None:
            self._host_step = int(state.step)
        step = self._host_step
        self._host_step += 1
        train_rrdb = step >= self.rrdb_unfreeze_iter
        if train_rrdb not in self._jit_cache:
            self._jit_cache[train_rrdb] = jax.jit(
                functools.partial(self._train_step, train_rrdb=train_rrdb),
                donate_argnums=(0,))
        lr_g = jnp.float32(self.schedG.get_lr(step))
        batch = {"LR": jnp.asarray(batch["LR"]),
                 "HR": jnp.asarray(batch["HR"])}
        return self._jit_cache[train_rrdb](state, batch, lr_g)

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _sample(self, g: NetState, lr_img, heat: float, rng):
        sr, _ = self.netG.apply({"params": g.params, **g.extra},
                                lr=lr_img.astype(jnp.float32),
                                reverse=True, eps_std=heat, rng=rng)
        return sr

    def eval_step(self, state: SRTrainState, lr_img,
                  heat: float = 0.0) -> jnp.ndarray:
        return self._sample(state.g, lr_img, float(heat),
                            jax.random.PRNGKey(0))
