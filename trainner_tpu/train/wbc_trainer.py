"""White-box cartoonization (WBC) trainer.

Equivalent of ref codes/models/wbc_model.py:66 (WBCModel): G (WBC U-Net)
output smoothed by a guided filter against the input (ref forward:227);
four representations drive the losses (ref backward_G:268):
  surface   = guided_filter(fake, fake)   vs guided_filter(cartoon)
  texture   = random gray ColorShift      vs gray cartoon
  structure = superpixel segment-mean of fake (on-device SLIC)
  content   = fake vs input photo
plus regularization (tv) on fake vs cartoon; dual discriminators D_S
(surface, 3ch) and D_T (texture, 1ch) with replay pools; per-representation
loss selectors + weights (surf_w/text_w/stru_w/cont_w/reg_w), identity loss
lambda_identity.

TPU-native: all representations (incl. superpixels, ops/superpixel.py)
compute on device inside the jitted G step; pools swap host-side between
the G and D steps as in the CycleGAN trainer. `sp_exact: true` opts into
the reference's exact host superpixels (sk_felzenszwalb + selective
reduction + adaptive mix coloring, ref wbc_model.py:44-58 defaults) via
jax.pure_callback — a device->host round trip per step, for when fidelity
to the reference's structure representation matters more than step time.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh

from ..losses.gan import build_adversarial
from ..losses.generator_loss import GeneratorLoss
from ..models.networks import define_D, define_G
from ..ops.blocks import wire_to_f01
from ..ops.colors import color_shift
from ..ops.filters import guided_filter
from ..ops.superpixel import superpixel_structure
from ..utils.image_pool import ImagePool
from .optimizers import build_optimizer
from .schedulers import build_scheduler
from .state import NetState
from .sr_trainer import clip_grads


class WBCState(struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array
    g: NetState
    d_s: Optional[NetState] = None
    d_t: Optional[NetState] = None

    def named_params(self) -> Dict[str, Any]:
        out = {"G": self.g.params}
        if self.d_s is not None:
            out["D_S"] = self.d_s.params
        if self.d_t is not None:
            out["D_T"] = self.d_t.params
        return out


def _sel(train_opt, key, default):
    v = train_opt.get(key)
    if v is None:
        return default
    return list(v) if isinstance(v, (list, tuple)) else [v]


class WBCTrainer:
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

        self.netG = define_G(opt, dtype=dtype)
        self.gan_weight = float(train_opt.get("gan_weight") or 1.0)
        self.use_gan = self.is_train and bool(self.gan_weight)
        if self.use_gan:
            self.netD_S = define_D(opt, dtype=dtype)
            self.netD_T = define_D(opt, dtype=dtype)

        # representation weights (ref wbc_model surf_w/text_w/...)
        self.surf_w = float(train_opt.get("surf_scale", 1.0) or 1.0)
        self.text_w = float(train_opt.get("text_scale", 1.0) or 1.0)
        self.stru_w = float(train_opt.get("struct_scale", 1.0) or 1.0)
        self.cont_w = float(train_opt.get("content_scale", 1.0) or 1.0)
        self.reg_w = float(train_opt.get("reg_scale", 1.0) or 1.0)
        self.lambda_idt = float(train_opt.get("lambda_identity", 0) or 0)

        # per-representation loss selectors (ref wbc_model :154-170)
        self.surf_losses = _sel(train_opt, "surf_losses", [])
        self.text_losses = _sel(train_opt, "text_losses", [])
        self.struct_losses = _sel(train_opt, "struct_losses", ["fea"])
        self.cont_losses = _sel(train_opt, "cont_losses", ["fea"])
        self.reg_losses = _sel(train_opt, "reg_losses", ["tv"])
        self.idt_losses = _sel(train_opt, "idt_losses", ["pix"])

        # guided filter radii (ref forward: r=1 output smoothing, r=5 surf)
        self.gf_r = int(train_opt.get("guided_filter_r", 1) or 1)
        self.gf_eps = float(train_opt.get("guided_filter_eps", 1e-2))
        self.gf_surf_r = int(train_opt.get("surf_guided_filter_r", 5) or 5)
        self.gf_surf_eps = float(train_opt.get("surf_guided_filter_eps",
                                               2e-1))
        self.sp_n_segments = int(train_opt.get("sp_n_segments", 200) or 200)
        # exact host superpixels (ref wbc_model.py:44-58 defaults)
        self.sp_exact = bool(train_opt.get("sp_exact"))
        self.sp_algo = str(train_opt.get("sp_algo", "sk_felzenszwalb"))
        self.sp_reduction = train_opt.get("sp_reduction", "selective")
        self.sp_kind = str(train_opt.get("sp_kind", "mix"))
        self.sp_max_size = train_opt.get("sp_max_size")

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
        self.fake_s_pool = ImagePool(pool_size)
        self.fake_t_pool = ImagePool(pool_size)
        self.grad_clip = train_opt.get("grad_clip")
        self.grad_clip_value = float(train_opt.get("grad_clip_value", 0.1)
                                     or 0.1)
        self._jit_g = None
        self._jit_d = None

    # ------------------------------------------------------------------
    def init_state_from_batch(self, rng, batch):
        return self.init_state(rng, jnp.asarray(batch["A"]).shape)

    def init_state(self, rng: jax.Array, a_shape, b_shape=None) -> WBCState:
        rng, r1, r2, r3, rs = jax.random.split(rng, 5)
        za = jnp.zeros(a_shape, jnp.float32)
        gv = jax.jit(lambda r, x: self.netG.init(
            {"params": r}, x, train=False))(r1, za)
        g = NetState(gv["params"], self.optG.init(gv["params"]),
                     {k: v for k, v in gv.items() if k != "params"})
        d_s = d_t = None
        if self.use_gan:
            ds = jax.jit(lambda r, x: self.netD_S.init(
                r, x, train=False))(r2, za)
            gray = jnp.zeros((*a_shape[:3], 1), jnp.float32)
            dt = jax.jit(lambda r, x: self.netD_T.init(
                r, x, train=False))(r3, gray)
            d_s = NetState(ds["params"], self.optD.init(ds["params"]),
                           {k: v for k, v in ds.items() if k != "params"})
            d_t = NetState(dt["params"], self.optD.init(dt["params"]),
                           {k: v for k, v in dt.items() if k != "params"})
        return WBCState(step=jnp.zeros([], jnp.int32), rng=rs, g=g,
                        d_s=d_s, d_t=d_t)

    # ------------------------------------------------------------------
    def _apply_g(self, params, extra, x, train):
        variables = {"params": params, **extra}
        mutable = [k for k in extra] if train and extra else False
        out = self.netG.apply(variables, x, train=train, mutable=mutable)
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

    def _representations(self, rng, fake_b, real_b):
        r1, r2 = jax.random.split(rng)
        fake_blur = guided_filter(fake_b, fake_b, self.gf_surf_r,
                                  self.gf_surf_eps)
        real_blur = guided_filter(real_b, real_b, self.gf_surf_r,
                                  self.gf_surf_eps)
        fake_gray, real_gray = color_shift(r1, fake_b, real_b)
        sp_in = jax.lax.stop_gradient(fake_b)
        if self.sp_exact:
            def _host_sp(imgs):
                from ..data.host_superpixels import superpixels as _sp

                out = np.stack([
                    _sp(np.asarray(im, np.float32),
                        n_segments=self.sp_n_segments, algo=self.sp_algo,
                        kind=self.sp_kind, reduction=self.sp_reduction,
                        max_size=self.sp_max_size)
                    for im in imgs])
                return out.astype(np.float32)

            sp = jax.pure_callback(
                _host_sp,
                jax.ShapeDtypeStruct(sp_in.shape, jnp.float32),
                jnp.clip(sp_in.astype(jnp.float32), 0.0, 1.0))
            # ref composes RandomGamma(100,120)/100 after the transform
            gamma = jax.random.uniform(r2, (sp.shape[0], 1, 1, 1),
                                       minval=1.0, maxval=1.2)
            sp_real = jnp.clip(sp, 1e-6, 1.0) ** gamma
        else:
            sp_real = superpixel_structure(
                r2, sp_in, n_segments=self.sp_n_segments)
        return fake_blur, real_blur, fake_gray, real_gray, sp_real

    # ------------------------------------------------------------------
    def _g_step(self, state: WBCState, batch, lr_g):
        rng, r_rep, r_next = jax.random.split(state.rng, 3)
        real_a = wire_to_f01(batch["A"], self.znorm)
        real_b = wire_to_f01(batch["B"], self.znorm)

        def forward(params):
            raw, g_extra = self._apply_g(params, state.g.extra, real_a,
                                         True)
            fake_b = guided_filter(real_a, raw, self.gf_r, self.gf_eps)
            (fake_blur, real_blur, fake_gray, real_gray,
             sp_real) = self._representations(r_rep, fake_b, real_b)
            logs: Dict[str, jnp.ndarray] = {}
            total = jnp.float32(0.0)

            if self.lambda_idt > 0:
                idt_raw, _ = self._apply_g(params, state.g.extra, real_b,
                                           True)
                idt_b = guided_filter(real_b, idt_raw, self.gf_r,
                                      self.gf_eps)
                l_idt, idt_logs = self.generator_loss(
                    idt_b, real_b, selectors=self.idt_losses)
                total += self.lambda_idt * l_idt
                logs["l_idt"] = l_idt

            if self.use_gan:
                ds_p = jax.lax.stop_gradient(state.d_s.params)
                dt_p = jax.lax.stop_gradient(state.d_t.params)

                # train=True: batch-stats norm for the G-stage pass (ref
                # keeps netD in train mode); stat updates discarded
                def ds_fn(x):
                    return self._apply_d(self.netD_S, ds_p,
                                         state.d_s.extra, x, True)[0]

                def dt_fn(x):
                    return self._apply_d(self.netD_T, dt_p,
                                         state.d_t.extra, x, True)[0]

                l_gan_s = self.adversarial.generator_loss(
                    ds_fn, fake_blur, real_blur)
                l_gan_t = self.adversarial.generator_loss(
                    dt_fn, fake_gray, real_gray)
                logs["l_g_gan_S"] = l_gan_s
                logs["l_g_gan_T"] = l_gan_t
                total += self.surf_w * l_gan_s + self.text_w * l_gan_t

            # per-representation selector losses (ref backward_G:268)
            reps = [("surf", fake_blur, real_blur, self.surf_losses,
                     self.surf_w),
                    ("text", fake_gray, real_gray, self.text_losses,
                     self.text_w),
                    ("struct", fake_b, sp_real, self.struct_losses,
                     self.stru_w),
                    ("cont", fake_b, real_a, self.cont_losses,
                     self.cont_w),
                    ("reg", fake_b, real_b, self.reg_losses, self.reg_w)]
            for name, fake, real, sel, wgt in reps:
                if not sel:
                    continue
                if fake.shape[-1] != real.shape[-1]:
                    fake = jnp.repeat(fake, real.shape[-1] // fake.shape[-1]
                                      if real.shape[-1] > fake.shape[-1]
                                      else 1, -1)
                l, llogs = self.generator_loss(fake, real, selectors=sel)
                total += wgt * l
                for k, v in llogs.items():
                    logs[f"{k}_{name}"] = v
            return total, (logs, fake_b, fake_blur, fake_gray, real_blur,
                           real_gray, g_extra)

        (loss, aux), grads = jax.value_and_grad(
            forward, has_aux=True)(state.g.params)
        (logs, fake_b, fake_blur, fake_gray, real_blur, real_gray,
         g_extra) = aux
        grads = clip_grads(grads, self.grad_clip, self.grad_clip_value)
        g_params, g_opt = self.optG.apply(grads, state.g.opt_state,
                                          state.g.params, lr_g)
        logs["l_g_total"] = loss
        state = state.replace(rng=r_next,
                              g=NetState(g_params, g_opt, g_extra))
        return state, logs, fake_blur, fake_gray, real_blur, real_gray

    def _d_step(self, state: WBCState, fake_blur, fake_gray, real_blur,
                real_gray, lr_d):
        logs: Dict[str, jnp.ndarray] = {}
        new_ds = []
        for tag, net, d_state, fake, real in (
                ("S", self.netD_S, state.d_s, fake_blur, real_blur),
                ("T", self.netD_T, state.d_t, fake_gray, real_gray)):
            def forward_d(params, net=net, d_state=d_state, fake=fake,
                          real=real):
                box = {}

                def d_fn(x):
                    out, extra = self._apply_d(net, params, d_state.extra,
                                               x, True)
                    box.update(extra)
                    return out

                l_d, dlogs = self.adversarial.discriminator_loss(
                    d_fn, fake, real)
                return l_d, (dlogs, box)

            (l_d, (dlogs, d_extra)), dgrads = jax.value_and_grad(
                forward_d, has_aux=True)(d_state.params)
            dgrads = clip_grads(dgrads, self.grad_clip,
                                self.grad_clip_value)
            p, o = self.optD.apply(dgrads, d_state.opt_state,
                                   d_state.params, lr_d)
            new_ds.append(NetState(p, o, d_extra or d_state.extra))
            logs[f"l_d_{tag}"] = l_d
        return state.replace(step=state.step + 1, d_s=new_ds[0],
                             d_t=new_ds[1]), logs

    # ------------------------------------------------------------------
    def train_step(self, state: WBCState, batch: Dict[str, Any]
                   ) -> Tuple[WBCState, Dict[str, jnp.ndarray]]:
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
        state, logs, fake_blur, fake_gray, real_blur, real_gray = \
            self._jit_g(state, batch, lr_g)
        if self.use_gan:
            lr_d = jnp.float32(self.schedD.get_lr(step))
            fb = jnp.asarray(self.fake_s_pool.query(np.asarray(fake_blur)))
            fg = jnp.asarray(self.fake_t_pool.query(np.asarray(fake_gray)))
            state, dlogs = self._jit_d(state, fb, fg, real_blur, real_gray,
                                       lr_d)
            logs = {**logs, **dlogs}
        else:
            state = state.replace(step=state.step + 1)
        return state, logs

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def _eval(self, g: NetState, x):
        x = x.astype(jnp.float32)
        raw, _ = self._apply_g(g.params, g.extra, x, False)
        return guided_filter(x, raw, self.gf_r, self.gf_eps)

    def eval_step(self, state: WBCState, a_img) -> jnp.ndarray:
        return self._eval(state.g, a_img)
