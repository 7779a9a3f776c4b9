"""Pix2pix conditional-GAN trainer.

Equivalent of ref codes/models/pix2pix_model.py:17 (Pix2PixModel):
G (unet/resnet) maps A->B; D is conditional (sees concat(A, image));
G loss = conditional adversarial + GeneratorLoss stack (L1 etc.,
ref backward_G:150); D trained on pooled? (pix2pix uses no pool) real/fake
conditional pairs.

TPU-native: same pure-step design as SRTrainer — one jitted step updates
both G and D; batches shard over the mesh 'data' axis.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..ops.blocks import wire_to_f01
from ..losses.gan import build_adversarial
from ..losses.generator_loss import GeneratorLoss
from ..models.networks import define_D, define_G
from ..parallel.mesh import batch_sharding
from .optimizers import build_optimizer
from .schedulers import build_scheduler
from .state import NetState, SRTrainState
from .sr_trainer import clip_grads


class Pix2PixTrainer:
    """A->B conditional GAN training strategy."""

    def __init__(self, opt: dict, mesh: Optional[Mesh] = None,
                 dtype=jnp.float32):
        self.opt = opt
        self.znorm = bool((((opt.get("datasets") or {}).get("train")
                            or {}).get("znorm", True)))
        self.mesh = mesh
        self.dtype = dtype
        train_opt = opt.get("train") or {}
        self.train_opt = train_opt
        self.scale = 1

        self.netG = define_G(opt, dtype=dtype)
        self.gan_weight = float(train_opt.get("gan_weight") or 0.0)
        self.use_gan = bool(self.gan_weight) and opt.get("is_train", True)
        self.netD = define_D(opt, dtype=dtype) if self.use_gan else None

        self.generator_loss = GeneratorLoss(opt, device_dtype=dtype) \
            if opt.get("is_train", True) else None
        self.adversarial = build_adversarial(train_opt, conditional=True) \
            if self.use_gan else None
        if self.adversarial is not None:
            # pix2pix uses the standard (non-relativistic) GAN form
            self.adversarial.form = (train_opt.get("gan_opt") or {}).get(
                "form", "standard")

        niter = int(float(train_opt.get("niter", 5e5) or 5e5))
        self.optG = build_optimizer(
            train_opt.get("optim_G", "adam"),
            beta1=float(train_opt.get("beta1_G", 0.5) or 0.5))
        self.schedG = build_scheduler(train_opt,
                                      base_lr=train_opt.get("lr_G", 2e-4),
                                      niter=niter)
        if self.use_gan:
            self.optD = build_optimizer(
                train_opt.get("optim_D", "adam"),
                beta1=float(train_opt.get("beta1_D", 0.5) or 0.5))
            self.schedD = build_scheduler(
                train_opt, base_lr=train_opt.get("lr_D",
                                                 train_opt.get("lr_G", 2e-4)),
                niter=niter)
        else:
            self.optD = self.schedD = None
        self.grad_clip = train_opt.get("grad_clip")
        self.grad_clip_value = float(train_opt.get("grad_clip_value", 0.1)
                                     or 0.1)
        self._jit_step = None

    # ------------------------------------------------------------------
    def init_state_from_batch(self, rng: jax.Array, batch: Dict[str, Any]
                              ) -> SRTrainState:
        a = jnp.asarray(batch["A"])
        b = jnp.asarray(batch["B"]) if "B" in batch else a
        return self.init_state(rng, a.shape, b.shape)

    def init_state(self, rng: jax.Array, a_shape, b_shape=None
                   ) -> SRTrainState:
        rng, rg, rd, rstate = jax.random.split(rng, 4)
        if b_shape is None:
            b_shape = a_shape
        g_vars = jax.jit(lambda r, x: self.netG.init(
            {"params": r, "dropout": r}, x, train=False))(
                rg, jnp.zeros(a_shape, jnp.float32))
        g = NetState(params=g_vars["params"],
                     opt_state=self.optG.init(g_vars["params"]),
                     extra={k: v for k, v in g_vars.items()
                            if k != "params"})
        d = None
        if self.use_gan:
            d_in = (*b_shape[:3], a_shape[3] + b_shape[3])
            d_vars = jax.jit(lambda r, x: self.netD.init(
                r, x, train=False))(rd, jnp.zeros(d_in, jnp.float32))
            d = NetState(params=d_vars["params"],
                         opt_state=self.optD.init(d_vars["params"]),
                         extra={k: v for k, v in d_vars.items()
                                if k != "params"})
        return SRTrainState(step=jnp.zeros([], jnp.int32), rng=rstate,
                            g=g, d=d)

    # ------------------------------------------------------------------
    def _g_apply(self, g: NetState, params, x, rng, train: bool):
        variables = {"params": params, **g.extra}
        mutable = [k for k in g.extra] if train and g.extra else False
        out = self.netG.apply(variables, x, train=train,
                              rngs={"dropout": rng}, mutable=mutable)
        if mutable:
            y, extra = out
            return y, dict(extra)
        return out, g.extra

    def _d_apply(self, d: NetState, params, x, train: bool):
        variables = {"params": params, **d.extra}
        mutable = [k for k in d.extra] if train and d.extra else False
        out = self.netD.apply(variables, x, train=train, mutable=mutable)
        if mutable:
            y, extra = out
            return y, dict(extra)
        return out, d.extra

    # ------------------------------------------------------------------
    def _train_step(self, state: SRTrainState, batch, lr_g, lr_d):
        rng, r_g = jax.random.split(state.rng)
        real_a = wire_to_f01(batch["A"], self.znorm)
        real_b = wire_to_f01(batch["B"], self.znorm)
        logs: Dict[str, jnp.ndarray] = {}

        def forward_g(params):
            fake_b, g_extra = self._g_apply(state.g, params, real_a, r_g,
                                            train=True)
            fake_b = fake_b.astype(jnp.float32)
            total, llogs = self.generator_loss(fake_b, real_b)
            if self.use_gan:
                d_params = jax.lax.stop_gradient(state.d.params)

                def d_fn(x):
                    # batch-stats BN for the G-stage pass (ref keeps netD
                    # in train mode throughout); stat updates discarded
                    out, _ = self._d_apply(state.d, d_params, x,
                                           train=True)
                    return out

                l_g_gan = self.adversarial.generator_loss(
                    d_fn, fake_b, real_b, condition=real_a)
                llogs["l_g_gan"] = l_g_gan
                total = total + l_g_gan
            return total, (llogs, fake_b, g_extra)

        (loss_g, (glogs, fake_b, g_extra)), grads = jax.value_and_grad(
            forward_g, has_aux=True)(state.g.params)
        grads = clip_grads(grads, self.grad_clip, self.grad_clip_value)
        g_params, g_opt = self.optG.apply(grads, state.g.opt_state,
                                          state.g.params, lr_g)
        new_g = NetState(g_params, g_opt, g_extra)
        logs.update(glogs)
        logs["l_g_total"] = loss_g

        new_d = state.d
        if self.use_gan:
            def forward_d(d_params):
                box = {}

                def d_fn(x):
                    out, extra = self._d_apply(state.d, d_params, x,
                                               train=True)
                    box.update(extra)
                    return out

                l_d, dlogs = self.adversarial.discriminator_loss(
                    d_fn, fake_b, real_b, condition=real_a)
                return l_d, (dlogs, box)

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
            if self.schedD else jnp.float32(0.0)
        if self._jit_step is None:
            if self.mesh is not None:
                bsh = batch_sharding(self.mesh)
                self._jit_step = jax.jit(
                    self._train_step,
                    in_shardings=(None, {"A": bsh, "B": bsh}, None, None),
                    donate_argnums=(0,))
            else:
                self._jit_step = jax.jit(self._train_step,
                                         donate_argnums=(0,))
        batch = {"A": jnp.asarray(batch["A"]), "B": jnp.asarray(batch["B"])}
        return self._jit_step(state, batch, lr_g, lr_d)

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def _eval(self, g: NetState, x):
        y, _ = self._g_apply(g, g.params, x.astype(jnp.float32),
                             jax.random.PRNGKey(0), train=False)
        return y.astype(jnp.float32)

    def eval_step(self, state: SRTrainState, a_img) -> jnp.ndarray:
        return self._eval(state.g, a_img)
