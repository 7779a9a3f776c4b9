"""Deinterlacing (DVD) trainer.

Equivalent of ref codes/models/DVD_model.py:28 (DVDModel): G predicts the
two full-height field frames (top, bottom) from the interlaced input;
GeneratorLoss applies to both outputs against their targets; optional GAN
on each (ref :209-227).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..losses.gan import build_adversarial
from ..losses.generator_loss import GeneratorLoss
from ..models.networks import define_D, define_G
from .optimizers import build_optimizer
from .schedulers import build_scheduler
from .state import NetState, SRTrainState
from .sr_trainer import clip_grads


class DVDTrainer:
    def __init__(self, opt: dict, mesh: Optional[Mesh] = None,
                 dtype=jnp.float32):
        self.opt = opt
        self.mesh = mesh
        train_opt = opt.get("train") or {}
        self.train_opt = train_opt
        self.scale = 1
        self.netG = define_G(opt, dtype=dtype)
        self.gan_weight = float(train_opt.get("gan_weight") or 0.0)
        self.use_gan = bool(self.gan_weight) and opt.get("is_train", True)
        self.netD = define_D(opt, dtype=dtype) if self.use_gan else None
        self.generator_loss = GeneratorLoss(opt, device_dtype=dtype) \
            if opt.get("is_train", True) else None
        self.adversarial = build_adversarial(train_opt) if self.use_gan \
            else None
        niter = int(float(train_opt.get("niter", 5e5) or 5e5))
        self.optG = build_optimizer(train_opt.get("optim_G", "adam"))
        self.schedG = build_scheduler(train_opt,
                                      base_lr=train_opt.get("lr_G", 1e-4),
                                      niter=niter)
        if self.use_gan:
            self.optD = build_optimizer(train_opt.get("optim_D", "adam"))
            self.schedD = build_scheduler(
                train_opt,
                base_lr=train_opt.get("lr_D", train_opt.get("lr_G", 1e-4)),
                niter=niter)
        self.grad_clip = train_opt.get("grad_clip")
        self.grad_clip_value = float(train_opt.get("grad_clip_value", 0.1)
                                     or 0.1)
        self._jit_step = None

    # ------------------------------------------------------------------
    def init_state_from_batch(self, rng, batch):
        return self.init_state(rng, jnp.asarray(batch["in"]).shape)

    def init_state(self, rng: jax.Array, in_shape, hr_shape=None
                   ) -> SRTrainState:
        rng, rg, rd, rstate = jax.random.split(rng, 4)
        x0 = jnp.zeros(in_shape, jnp.float32)
        g_vars = jax.jit(lambda r, x: self.netG.init(
            {"params": r}, x, train=False))(rg, x0)
        g = NetState(g_vars["params"], self.optG.init(g_vars["params"]),
                     {k: v for k, v in g_vars.items() if k != "params"})
        d = None
        if self.use_gan:
            d_vars = jax.jit(lambda r, x: self.netD.init(
                r, x, train=False))(rd, x0)
            d = NetState(d_vars["params"],
                         self.optD.init(d_vars["params"]),
                         {k: v for k, v in d_vars.items()
                          if k != "params"})
        return SRTrainState(step=jnp.zeros([], jnp.int32), rng=rstate,
                            g=g, d=d)

    # ------------------------------------------------------------------
    def _train_step(self, state: SRTrainState, batch, lr_g, lr_d):
        rng, r_gp = jax.random.split(state.rng)
        interlaced = batch["in"].astype(jnp.float32)
        top = batch["top"].astype(jnp.float32)
        bottom = batch["bottom"].astype(jnp.float32)
        logs: Dict[str, jnp.ndarray] = {}

        def forward_g(params):
            fake_t, fake_b = self.netG.apply(
                {"params": params, **state.g.extra}, interlaced,
                train=True)
            fake_t = fake_t.astype(jnp.float32)
            fake_b = fake_b.astype(jnp.float32)
            l_t, logs_t = self.generator_loss(fake_t, top)
            l_b, logs_b = self.generator_loss(fake_b, bottom)
            total = l_t + l_b
            llogs = {f"{k}_T": v for k, v in logs_t.items()}
            llogs.update({f"{k}_B": v for k, v in logs_b.items()})
            if self.use_gan:
                d_params = jax.lax.stop_gradient(state.d.params)

                def d_fn(x):
                    # batch-stats BN for the G-stage pass (ref keeps netD
                    # in train mode throughout); stat updates discarded
                    variables = {"params": d_params, **state.d.extra}
                    mutable = [k for k in state.d.extra] \
                        if state.d.extra else False
                    out = self.netD.apply(variables, x, train=True,
                                          mutable=mutable)
                    return out[0] if mutable else out

                l_gan = self.adversarial.generator_loss(d_fn, fake_t, top) \
                    + self.adversarial.generator_loss(d_fn, fake_b, bottom)
                llogs["l_g_gan"] = l_gan
                total = total + l_gan
            return total, (llogs, fake_t, fake_b)

        (loss_g, (glogs, fake_t, fake_b)), grads = jax.value_and_grad(
            forward_g, has_aux=True)(state.g.params)
        grads = clip_grads(grads, self.grad_clip, self.grad_clip_value)
        g_params, g_opt = self.optG.apply(grads, state.g.opt_state,
                                          state.g.params, lr_g)
        logs.update(glogs)
        logs["l_g_total"] = loss_g
        new_g = state.g.replace(params=g_params, opt_state=g_opt)

        new_d = state.d
        if self.use_gan:
            def forward_d(d_params):
                box = {}

                def d_fn(x):
                    variables = {"params": d_params, **state.d.extra}
                    mutable = [k for k in state.d.extra] \
                        if state.d.extra else False
                    out = self.netD.apply(variables, x, train=True,
                                          mutable=mutable)
                    if mutable:
                        out, extra = out
                        box.update(dict(extra))
                    return out

                l_t, logs_t = self.adversarial.discriminator_loss(
                    d_fn, jax.lax.stop_gradient(fake_t), top, gp_rng=r_gp)
                l_b, _ = self.adversarial.discriminator_loss(
                    d_fn, jax.lax.stop_gradient(fake_b), bottom,
                    gp_rng=r_gp)
                return l_t + l_b, (logs_t, box)

            (loss_d, (dlogs, d_extra)), dgrads = jax.value_and_grad(
                forward_d, has_aux=True)(state.d.params)
            dgrads = clip_grads(dgrads, self.grad_clip,
                                self.grad_clip_value)
            d_params, d_opt = self.optD.apply(dgrads, state.d.opt_state,
                                              state.d.params, lr_d)
            new_d = NetState(d_params, d_opt, d_extra or state.d.extra)
            logs.update(dlogs)
            logs["l_d_total"] = loss_d

        return state.replace(step=state.step + 1, rng=rng, g=new_g,
                             d=new_d), logs

    def train_step(self, state: SRTrainState, batch: Dict[str, Any]):
        if getattr(self, "_host_step", None) is None:
            self._host_step = int(state.step)
        step = self._host_step
        self._host_step += 1
        lr_g = jnp.float32(self.schedG.get_lr(step))
        lr_d = jnp.float32(self.schedD.get_lr(step)) \
            if self.use_gan else jnp.float32(0.0)
        if self._jit_step is None:
            self._jit_step = jax.jit(self._train_step, donate_argnums=(0,))
        batch = {k: jnp.asarray(batch[k]) for k in ("in", "top", "bottom")}
        return self._jit_step(state, batch, lr_g, lr_d)

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def _eval(self, g: NetState, x):
        t, b = self.netG.apply({"params": g.params, **g.extra},
                               x.astype(jnp.float32), train=False)
        return t.astype(jnp.float32), b.astype(jnp.float32)

    def eval_step(self, state: SRTrainState, interlaced) -> jnp.ndarray:
        """Returns the top-field frame (primary deinterlaced output)."""
        return self._eval(state.g, interlaced)[0]

    def eval_step_both(self, state: SRTrainState, interlaced):
        return self._eval(state.g, interlaced)
