"""SFTGAN trainer with auxiliary-classifier discriminator.

Equivalent of ref codes/models/SFTGAN_ACD_model.py:16 (SFTGAN_ACD_Model):
G = SFTNet conditioned on segmentation probability maps; D = ACD VGG-BN
returning (gan_logits, class_logits); D loss adds cross-entropy on the
8 scene categories; G loss = pixel/feature stack + adversarial.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..losses.gan import gan_loss
from ..losses.generator_loss import GeneratorLoss
from ..models.sft import ACDVGGBN96, SFTNet
from .optimizers import build_optimizer
from .schedulers import build_scheduler
from .state import NetState, SRTrainState
from .sr_trainer import clip_grads


def _xent(logits, labels):
    return -jnp.mean(jnp.sum(
        jax.nn.log_softmax(logits) * jax.nn.one_hot(
            labels, logits.shape[-1]), axis=-1))


class SFTGANTrainer:
    def __init__(self, opt: dict, mesh: Optional[Mesh] = None,
                 dtype=jnp.float32):
        self.opt = opt
        self.mesh = mesh
        train_opt = opt.get("train") or {}
        self.train_opt = train_opt
        cfg = opt.get("network_G") or {}
        self.netG = SFTNet(nf=cfg.get("nf", 64),
                           cond_nf=cfg.get("cond_nf", 32),
                           n_blocks=cfg.get("n_blocks", 16), dtype=dtype)
        self.gan_weight = float(train_opt.get("gan_weight") or 0.0)
        self.use_gan = bool(self.gan_weight) and opt.get("is_train", True)
        self.netD = ACDVGGBN96(dtype=dtype) if self.use_gan else None
        self.gan_type = train_opt.get("gan_type", "vanilla")
        self.generator_loss = GeneratorLoss(opt, device_dtype=dtype) \
            if opt.get("is_train", True) else None
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
        import numpy as np

        lr = jnp.asarray(batch["LR"])
        seg = jnp.asarray(batch["seg"])
        hr_shape = (lr.shape[0], lr.shape[1] * 4, lr.shape[2] * 4, 3)
        return self.init_state(rng, lr.shape, seg.shape, hr_shape)

    def init_state(self, rng: jax.Array, lr_shape, seg_shape=None,
                   hr_shape=None) -> SRTrainState:
        rng, rg, rd, rstate = jax.random.split(rng, 4)
        if seg_shape is None:
            b, h, w, _ = lr_shape
            seg_shape = (b, h * 4, w * 4, 8)
        if hr_shape is None:
            b, h, w, _ = lr_shape
            hr_shape = (b, h * 4, w * 4, 3)
        g_vars = jax.jit(lambda r, a, s: self.netG.init(
            {"params": r}, a, s, train=False))(
            rg, jnp.zeros(lr_shape, jnp.float32),
            jnp.zeros(seg_shape, jnp.float32))
        g = NetState(g_vars["params"], self.optG.init(g_vars["params"]),
                     {k: v for k, v in g_vars.items() if k != "params"})
        d = None
        if self.use_gan:
            d_vars = jax.jit(lambda r, x: self.netD.init(
                r, x, train=False))(rd, jnp.zeros(hr_shape, jnp.float32))
            d = NetState(d_vars["params"],
                         self.optD.init(d_vars["params"]),
                         {k: v for k, v in d_vars.items()
                          if k != "params"})
        return SRTrainState(step=jnp.zeros([], jnp.int32), rng=rstate,
                            g=g, d=d)

    # ------------------------------------------------------------------
    def _d_apply(self, params, extra, x, train):
        variables = {"params": params, **extra}
        mutable = ["batch_stats"] if train and "batch_stats" in extra \
            else False
        out = self.netD.apply(variables, x, train=train, mutable=mutable)
        if mutable:
            (gan, cls), new_extra = out
            return gan, cls, dict(new_extra)
        gan, cls = out
        return gan, cls, extra

    def _train_step(self, state: SRTrainState, batch, lr_g, lr_d):
        rng, r_next = jax.random.split(state.rng)
        lr_img = batch["LR"].astype(jnp.float32)
        seg = batch["seg"].astype(jnp.float32)
        hr_img = batch["HR"].astype(jnp.float32)
        labels = batch.get("category")
        if labels is None:
            # derive a per-image dominant class from the seg maps
            labels = jnp.argmax(jnp.mean(seg, axis=(1, 2)), axis=-1)
        logs: Dict[str, jnp.ndarray] = {}

        def forward_g(params):
            fake = self.netG.apply({"params": params}, lr_img, seg,
                                   train=True).astype(jnp.float32)
            total, llogs = self.generator_loss(fake, hr_img)
            if self.use_gan:
                d_params = jax.lax.stop_gradient(state.d.params)
                # batch-stats BN for the G-stage pass (ref keeps netD in
                # train mode throughout); stat updates discarded
                gan_logits, cls_logits, _ = self._d_apply(
                    d_params, state.d.extra, fake, True)
                l_gan = self.gan_weight * gan_loss(self.gan_type,
                                                   gan_logits, True)
                l_cls = _xent(cls_logits, labels)
                llogs["l_g_gan"] = l_gan
                llogs["l_g_cls"] = l_cls
                total = total + l_gan + l_cls
            return total, (llogs, fake)

        (loss_g, (glogs, fake)), grads = jax.value_and_grad(
            forward_g, has_aux=True)(state.g.params)
        grads = clip_grads(grads, self.grad_clip, self.grad_clip_value)
        g_params, g_opt = self.optG.apply(grads, state.g.opt_state,
                                          state.g.params, lr_g)
        new_g = state.g.replace(params=g_params, opt_state=g_opt)
        logs.update(glogs)
        logs["l_g_total"] = loss_g

        new_d = state.d
        if self.use_gan:
            fake_det = jax.lax.stop_gradient(fake)

            def forward_d(d_params):
                box = {}
                gan_r, cls_r, extra = self._d_apply(
                    d_params, state.d.extra, hr_img, True)
                box.update(extra)
                gan_f, cls_f, _ = self._d_apply(
                    d_params, state.d.extra, fake_det, True)
                l_real = gan_loss(self.gan_type, gan_r, True,
                                  is_disc=True)
                l_fake = gan_loss(self.gan_type, gan_f, False,
                                  is_disc=True)
                # ACD: class loss on real AND fake (ref SFTGAN_ACD)
                l_cls = _xent(cls_r, labels) + _xent(cls_f, labels)
                dlogs = {"l_d_real": l_real, "l_d_fake": l_fake,
                         "l_d_cls": l_cls,
                         "D_real": jnp.mean(gan_r),
                         "D_fake": jnp.mean(gan_f)}
                return (l_real + l_fake) * 0.5 + l_cls, (dlogs, box)

            (loss_d, (dlogs, d_extra)), dgrads = jax.value_and_grad(
                forward_d, has_aux=True)(state.d.params)
            dgrads = clip_grads(dgrads, self.grad_clip,
                                self.grad_clip_value)
            d_params, d_opt = self.optD.apply(dgrads, state.d.opt_state,
                                              state.d.params, lr_d)
            new_d = NetState(d_params, d_opt, d_extra or state.d.extra)
            logs.update(dlogs)
            logs["l_d_total"] = loss_d

        return state.replace(step=state.step + 1, rng=r_next, g=new_g,
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
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ("LR", "HR", "seg", "category")}
        return self._jit_step(state, arrays, lr_g, lr_d)

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def _eval(self, g: NetState, lr_img, seg):
        return self.netG.apply({"params": g.params},
                               lr_img.astype(jnp.float32),
                               seg.astype(jnp.float32),
                               train=False).astype(jnp.float32)

    def eval_step(self, state: SRTrainState, lr_img, seg=None):
        if seg is None:
            b, h, w, _ = lr_img.shape
            seg = jnp.full((b, h * 4, w * 4, 8), 1.0 / 8)
        return self._eval(state.g, lr_img, seg)
