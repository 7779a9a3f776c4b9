"""CycleGAN trainer: 2 generators + 2 discriminators with cycle/identity
losses and fake-image replay pools.

Equivalent of ref codes/models/cyclegan_model.py:18 (CycleGANModel):
  G_A: A->B, G_B: B->A; D_A judges B-domain, D_B judges A-domain;
  cycle loss lambda_A * ||G_B(G_A(A)) - A|| + lambda_B * ||G_A(G_B(B)) - B||;
  identity loss lambda_identity * (...) (ref :39-47); lsgan standard form;
  ImagePool history buffers for D inputs (ref :118-119).

TPU-native: one jitted step computes both G updates jointly (shared loss,
one optimizer over the combined {G_A, G_B} params — equivalent to the
reference's single optimizer over itertools.chain of both G params) and
both D updates; the pools run host-side between G and D sub-steps, so the
step is split into two jitted functions with the pool swap between them.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh

from ..losses.basic import get_pixel_criterion
from ..ops.blocks import wire_to_f01
from ..losses.gan import build_adversarial
from ..losses.generator_loss import GeneratorLoss
from ..models.networks import define_D, define_G
from ..utils.image_pool import ImagePool
from .optimizers import build_optimizer
from .schedulers import build_scheduler
from .state import NetState
from .sr_trainer import clip_grads


class CycleGANState(struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array
    g: NetState          # combined params {"G_A": ..., "G_B": ...}
    d_a: Optional[NetState] = None
    d_b: Optional[NetState] = None

    def named_params(self) -> Dict[str, Any]:
        out = {"G_A": self.g.params["G_A"], "G_B": self.g.params["G_B"]}
        if self.d_a is not None:
            out["D_A"] = self.d_a.params
        if self.d_b is not None:
            out["D_B"] = self.d_b.params
        return out


class CycleGANTrainer:
    def __init__(self, opt: dict, mesh: Optional[Mesh] = None,
                 dtype=jnp.float32):
        self.opt = opt
        self.znorm = bool((((opt.get("datasets") or {}).get("train")
                            or {}).get("znorm", True)))
        self.mesh = mesh
        self.dtype = dtype
        train_opt = opt.get("train") or {}
        self.train_opt = train_opt
        self.is_train = bool(opt.get("is_train", True))

        self.netG_A = define_G(opt, dtype=dtype)
        self.netG_B = define_G(opt, dtype=dtype)
        self.gan_weight = float(train_opt.get("gan_weight") or 1.0)
        self.use_gan = self.is_train and bool(self.gan_weight)
        if self.use_gan:
            self.netD_A = define_D(opt, dtype=dtype)
            self.netD_B = define_D(opt, dtype=dtype)
        self.lambda_a = float(train_opt.get("lambda_A", 10.0) or 10.0)
        self.lambda_b = float(train_opt.get("lambda_B", 10.0) or 10.0)
        self.lambda_idt = float(train_opt.get("lambda_identity", 0.5)
                                or 0.0)
        self.cycle_crit = get_pixel_criterion(
            train_opt.get("cycle_criterion", "l1"))
        self.idt_crit = get_pixel_criterion(
            train_opt.get("idt_criterion", "l1"))
        self.generator_loss = GeneratorLoss(opt, device_dtype=dtype) \
            if self.is_train else None
        self.adversarial = build_adversarial(
            {**train_opt, "gan_type": train_opt.get("gan_type", "lsgan")}) \
            if self.use_gan else None
        if self.adversarial is not None:
            self.adversarial.form = (train_opt.get("gan_opt") or {}).get(
                "form", "standard")

        niter = int(float(train_opt.get("niter", 5e5) or 5e5))
        self.optG = build_optimizer(train_opt.get("optim_G", "adam"),
                                    beta1=float(train_opt.get("beta1_G",
                                                              0.5) or 0.5))
        self.schedG = build_scheduler(train_opt,
                                      base_lr=train_opt.get("lr_G", 2e-4),
                                      niter=niter)
        if self.use_gan:
            self.optD = build_optimizer(
                train_opt.get("optim_D", "adam"),
                beta1=float(train_opt.get("beta1_D", 0.5) or 0.5))
            self.schedD = build_scheduler(
                train_opt,
                base_lr=train_opt.get("lr_D", train_opt.get("lr_G", 2e-4)),
                niter=niter)
        pool_size = int(opt.get("pool_size", 50) or 50)
        self.fake_a_pool = ImagePool(pool_size)
        self.fake_b_pool = ImagePool(pool_size)
        self.grad_clip = train_opt.get("grad_clip")
        self.grad_clip_value = float(train_opt.get("grad_clip_value", 0.1)
                                     or 0.1)
        self._jit_g = None
        self._jit_d = None

    # ------------------------------------------------------------------
    def init_state_from_batch(self, rng, batch):
        return self.init_state(rng, jnp.asarray(batch["A"]).shape,
                               jnp.asarray(batch["B"]).shape)

    def init_state(self, rng: jax.Array, a_shape, b_shape=None
                   ) -> CycleGANState:
        b_shape = b_shape or a_shape
        rng, r1, r2, r3, r4, rs = jax.random.split(rng, 6)
        za = jnp.zeros(a_shape, jnp.float32)
        zb = jnp.zeros(b_shape, jnp.float32)
        ga = jax.jit(lambda r, x: self.netG_A.init(
            {"params": r, "dropout": r}, x, train=False))(r1, za)
        gb = jax.jit(lambda r, x: self.netG_B.init(
            {"params": r, "dropout": r}, x, train=False))(r2, zb)
        g_params = {"G_A": ga["params"], "G_B": gb["params"]}
        g_extra = {"G_A": {k: v for k, v in ga.items() if k != "params"},
                   "G_B": {k: v for k, v in gb.items() if k != "params"}}
        g = NetState(params=g_params, opt_state=self.optG.init(g_params),
                     extra=g_extra)
        d_a = d_b = None
        if self.use_gan:
            da = jax.jit(lambda r, x: self.netD_A.init(
                r, x, train=False))(r3, zb)
            db = jax.jit(lambda r, x: self.netD_B.init(
                r, x, train=False))(r4, za)
            d_a = NetState(da["params"], self.optD.init(da["params"]),
                           {k: v for k, v in da.items() if k != "params"})
            d_b = NetState(db["params"], self.optD.init(db["params"]),
                           {k: v for k, v in db.items() if k != "params"})
        return CycleGANState(step=jnp.zeros([], jnp.int32), rng=rs, g=g,
                             d_a=d_a, d_b=d_b)

    # ------------------------------------------------------------------
    def _apply_g(self, net, params, extra, x, rng, train):
        variables = {"params": params, **extra}
        mutable = [k for k in extra] if train and extra else False
        out = net.apply(variables, x, train=train, rngs={"dropout": rng},
                        mutable=mutable)
        if mutable:
            y, new_extra = out
            return y.astype(jnp.float32), dict(new_extra)
        return out.astype(jnp.float32), extra

    def _apply_d(self, net, params, extra, x, train):
        variables = {"params": params, **extra}
        mutable = [k for k in extra] if train and extra else False
        out = net.apply(variables, x, train=train, mutable=mutable)
        if mutable:
            y, new_extra = out
            return y, dict(new_extra)
        return out, extra

    # ------------------------------------------------------------------
    def _g_step(self, state: CycleGANState, batch, lr_g):
        rng, r1, r2, r3, r4 = jax.random.split(state.rng, 5)
        real_a = wire_to_f01(batch["A"], self.znorm)
        real_b = wire_to_f01(batch["B"], self.znorm)

        def forward(params):
            extra = state.g.extra
            fake_b, ea = self._apply_g(self.netG_A, params["G_A"],
                                       extra["G_A"], real_a, r1, True)
            rec_a, eb = self._apply_g(self.netG_B, params["G_B"],
                                      extra["G_B"], fake_b, r2, True)
            fake_a, _ = self._apply_g(self.netG_B, params["G_B"],
                                      extra["G_B"], real_b, r3, True)
            rec_b, _ = self._apply_g(self.netG_A, params["G_A"],
                                     extra["G_A"], fake_a, r4, True)
            logs: Dict[str, jnp.ndarray] = {}
            loss = self.lambda_a * self.cycle_crit(rec_a, real_a) + \
                self.lambda_b * self.cycle_crit(rec_b, real_b)
            logs["l_cycle"] = loss
            if self.lambda_idt > 0:
                idt_a, _ = self._apply_g(self.netG_A, params["G_A"],
                                         extra["G_A"], real_b, r1, True)
                idt_b, _ = self._apply_g(self.netG_B, params["G_B"],
                                         extra["G_B"], real_a, r2, True)
                l_idt = self.lambda_idt * (
                    self.idt_crit(idt_a, real_b) * self.lambda_b +
                    self.idt_crit(idt_b, real_a) * self.lambda_a)
                logs["l_idt"] = l_idt
                loss = loss + l_idt
            if self.use_gan:
                da_p = jax.lax.stop_gradient(state.d_a.params)
                db_p = jax.lax.stop_gradient(state.d_b.params)

                # train=True: batch-stats norm for the G-stage pass (ref
                # keeps netD in train mode); stat updates discarded
                def d_a_fn(x):
                    return self._apply_d(self.netD_A, da_p,
                                         state.d_a.extra, x, True)[0]

                def d_b_fn(x):
                    return self._apply_d(self.netD_B, db_p,
                                         state.d_b.extra, x, True)[0]

                l_gan_a = self.adversarial.generator_loss(d_a_fn, fake_b,
                                                          real_b)
                l_gan_b = self.adversarial.generator_loss(d_b_fn, fake_a,
                                                          real_a)
                logs["l_g_gan_A"] = l_gan_a
                logs["l_g_gan_B"] = l_gan_b
                loss = loss + l_gan_a + l_gan_b
            return loss, (logs, fake_a, fake_b, {"G_A": ea, "G_B": eb})

        (loss, (logs, fake_a, fake_b, g_extra)), grads = \
            jax.value_and_grad(forward, has_aux=True)(state.g.params)
        grads = clip_grads(grads, self.grad_clip, self.grad_clip_value)
        g_params, g_opt = self.optG.apply(grads, state.g.opt_state,
                                          state.g.params, lr_g)
        logs["l_g_total"] = loss
        new_g = NetState(g_params, g_opt, g_extra)
        return state.replace(rng=rng, g=new_g), logs, fake_a, fake_b

    def _d_step(self, state: CycleGANState, batch, fake_a, fake_b, lr_d):
        real_a = wire_to_f01(batch["A"], self.znorm)
        real_b = wire_to_f01(batch["B"], self.znorm)
        logs: Dict[str, jnp.ndarray] = {}
        new_ds = []
        for tag, net, d_state, fake, real in (
                ("A", self.netD_A, state.d_a, fake_b, real_b),
                ("B", self.netD_B, state.d_b, fake_a, real_a)):
            def forward_d(params, d_state=d_state, net=net, fake=fake,
                          real=real):
                box = {}

                def d_fn(x):
                    out, extra = self._apply_d(net, params, d_state.extra,
                                               x, True)
                    box.update(extra)
                    return out

                l_d, dlogs = self.adversarial.discriminator_loss(
                    d_fn, fake, real)
                return l_d * 0.5, (dlogs, box)

            (l_d, (dlogs, d_extra)), dgrads = jax.value_and_grad(
                forward_d, has_aux=True)(d_state.params)
            dgrads = clip_grads(dgrads, self.grad_clip,
                                self.grad_clip_value)
            p, o = self.optD.apply(dgrads, d_state.opt_state,
                                   d_state.params, lr_d)
            new_ds.append(NetState(p, o, d_extra or d_state.extra))
            logs[f"l_d_{tag}"] = l_d
        return state.replace(step=state.step + 1, d_a=new_ds[0],
                             d_b=new_ds[1]), logs

    # ------------------------------------------------------------------
    def train_step(self, state: CycleGANState, batch: Dict[str, Any]
                   ) -> Tuple[CycleGANState, Dict[str, jnp.ndarray]]:
        if getattr(self, "_host_step", None) is None:
            self._host_step = int(state.step)
        step = self._host_step
        self._host_step += 1
        lr_g = jnp.float32(self.schedG.get_lr(step))
        batch = {"A": jnp.asarray(batch["A"]), "B": jnp.asarray(batch["B"])}
        if self._jit_g is None:
            self._jit_g = jax.jit(self._g_step)
            if self.use_gan:
                self._jit_d = jax.jit(self._d_step)
        state, logs, fake_a, fake_b = self._jit_g(state, batch, lr_g)
        if self.use_gan:
            lr_d = jnp.float32(self.schedD.get_lr(step))
            # replay pools (host-side, ref cyclegan_model.py:200-210)
            fa = jnp.asarray(self.fake_a_pool.query(np.asarray(fake_a)))
            fb = jnp.asarray(self.fake_b_pool.query(np.asarray(fake_b)))
            state, dlogs = self._jit_d(state, batch, fa, fb, lr_d)
            logs = {**logs, **dlogs}
        else:
            state = state.replace(step=state.step + 1)
        return state, logs

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def _eval(self, g: NetState, x):
        y, _ = self._apply_g(self.netG_A, g.params["G_A"], g.extra["G_A"],
                             x.astype(jnp.float32), jax.random.PRNGKey(0),
                             False)
        return y

    def eval_step(self, state: CycleGANState, a_img) -> jnp.ndarray:
        """A->B direction (ref test-time uses G_A)."""
        return self._eval(state.g, a_img)
