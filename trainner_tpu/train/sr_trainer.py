"""SR / restoration GAN trainer: the TPU-native equivalent of the
reference's SRModel strategy (ref codes/models/sr_model.py:22-372 on top of
base_model.py) re-designed as pure jitted step functions over an explicit
``SRTrainState``.

Feature coverage (same option keys as the reference):
  * G (+ optional D when gan_weight) with the full GeneratorLoss stack and
    relativistic adversarial loss (ref sr_model.py:162-193).
  * D_update_ratio / D_init_iters schedule (ref :246-267) — decided
    host-side; the G-only and G+D steps are two cached jit specializations.
  * virtual batch / gradient accumulation via lax.scan microbatches
    (ref base_model.py:722,805).
  * batch augmentations (mixup family incl. cutblur w/ LR pre-upsampling,
    cutout mask re-application — ref sr_model.py:213-240).
  * DiffAugment + frequency-separation filters on D inputs
    (ref losses.py:573-582).
  * grad clipping: value | norm (ref base_model.py:774,896).
  * SWA running average + EMA (ref models/swa.py; use_ema keys).
  * bf16 compute policy: network body bf16, losses f32 — the TPU
    replacement for AMP autocast + GradScaler (no loss scaling needed).
  * pixel-unshuffle wrapper (ref base_model.py:766, block.py:493).

Multi-device: pass a Mesh; batches shard over 'data', params replicate (or
fsdp-shard), gradients all-reduce implicitly via pjit.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses.gan import AdversarialLoss, build_adversarial
from ..losses.generator_loss import GeneratorLoss
from ..models.networks import define_D, define_G
from ..ops.batchaug import BatchAugment
from ..ops.blocks import interpolate, space_to_depth, wire_to_f01
from ..ops.diffaug import diff_augment
from ..ops.filters import filter_high, filter_low
from ..parallel.mesh import batch_sharding
from .optimizers import build_optimizer
from .schedulers import build_scheduler
from .state import NetState, SRTrainState, ema_update, init_swa, swa_update


def clip_grads(grads, mode: Optional[str], value):
    """value/norm gradient clipping (ref base_model.py:896,911). `value`
    may be a traced scalar (the AGC percentile value)."""
    if not mode:
        return grads
    if mode == "value":
        return jax.tree.map(lambda g: jnp.clip(g, -value, value), grads)
    if mode in ("norm", "auto"):
        gnorm = optax_global_norm(grads)
        scale = jnp.minimum(1.0, value / (gnorm + 1e-6))
        return jax.tree.map(lambda g: g * scale, grads)
    raise NotImplementedError(f"grad_clip [{mode}]")


AGC_HISTORY = 256  # ring-buffer size (the reference keeps an unbounded
# python list, base_model.py:94; a fixed window is the jit-able analogue)


def init_grad_hist() -> dict:
    return {"vals": jnp.zeros((AGC_HISTORY,), jnp.float32),
            "n": jnp.zeros((), jnp.int32)}


def agc_hist_percentile(hist: dict, percentile: float = 10.0):
    """Clip value = percentile of the recorded grad-norm history
    (ref get_auto_norm, base_model.py:896-909)."""
    vals, n = hist["vals"], hist["n"]
    k = vals.shape[0]
    valid = jnp.where(jnp.arange(k) < jnp.minimum(n, k), vals, jnp.nan)
    clip_val = jnp.nanpercentile(valid, percentile)
    return jnp.where(n > 0, clip_val, jnp.inf)


def agc_percentile_clip(grads, hist: dict, percentile: float = 10.0):
    """Auto grad clip: record the current global grad norm in the ring
    buffer, clip to the `percentile`-th percentile of the history
    INCLUDING the current norm (exactly the reference's get_auto_norm +
    clip_grad_norm_ sequence, base_model.py:896-922)."""
    gnorm = optax_global_norm(grads)
    vals, n = hist["vals"], hist["n"]
    k = vals.shape[0]
    new_hist = {"vals": vals.at[jnp.mod(n, k)].set(gnorm), "n": n + 1}
    clip_val = agc_hist_percentile(new_hist, percentile)
    scale = jnp.minimum(1.0, clip_val / (gnorm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), new_hist


def optax_global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(x))
                        for x in jax.tree.leaves(tree)))


class SRTrainer:
    """Owns static config + modules; state flows through pure steps."""

    def __init__(self, opt: dict, mesh: Optional[Mesh] = None,
                 dtype=jnp.bfloat16):
        self.opt = opt
        self.mesh = mesh
        self.dtype = dtype
        train_opt = opt.get("train") or {}
        self.train_opt = train_opt
        self.scale = int(opt.get("scale", 4) or 4)
        # uint8 wire batches renormalize on device with the train
        # dataset's znorm convention
        self.znorm = bool(((opt.get("datasets") or {}).get("train")
                           or {}).get("znorm"))

        # networks -----------------------------------------------------
        self.netG = define_G(opt, dtype=dtype)
        self.gan_weight = float(train_opt.get("gan_weight") or 0.0)
        self.use_gan = bool(self.gan_weight) and opt.get("is_train", True)
        self.netD = define_D(opt, dtype=dtype) if self.use_gan else None

        # losses ---------------------------------------------------------
        self.generator_loss = GeneratorLoss(opt, device_dtype=dtype) \
            if opt.get("is_train", True) else None
        self.adversarial: Optional[AdversarialLoss] = (
            build_adversarial(train_opt) if self.use_gan else None)

        # optimizers / schedulers ---------------------------------------
        self.optG = build_optimizer(
            train_opt.get("optim_G", "adam"),
            beta1=float(train_opt.get("beta1_G", 0.9) or 0.9),
            beta2=float(train_opt.get("beta2_G", 0.999) or 0.999),
            weight_decay=float(train_opt.get("weight_decay_G", 0) or 0))
        self.schedG = build_scheduler(
            train_opt, base_lr=train_opt.get("lr_G", 1e-4),
            niter=int(float(train_opt.get("niter", 5e5) or 5e5)))
        if self.use_gan:
            self.optD = build_optimizer(
                train_opt.get("optim_D", "adam"),
                beta1=float(train_opt.get("beta1_D", 0.9) or 0.9),
                beta2=float(train_opt.get("beta2_D", 0.999) or 0.999),
                weight_decay=float(train_opt.get("weight_decay_D", 0) or 0))
            self.schedD = build_scheduler(
                train_opt, base_lr=train_opt.get("lr_D",
                                                 train_opt.get("lr_G", 1e-4)),
                niter=int(float(train_opt.get("niter", 5e5) or 5e5)))
        else:
            self.optD = self.schedD = None

        # feature toggles -----------------------------------------------
        self.d_update_ratio = int(train_opt.get("D_update_ratio", 1) or 1)
        self.d_init_iters = int(train_opt.get("D_init_iters", 0) or 0)
        self.accumulations = max(1, int(
            (train_opt.get("virtual_batch_size") or 0) or 1))
        self.grad_clip = train_opt.get("grad_clip")
        self.grad_clip_value = float(train_opt.get("grad_clip_value", 0.1)
                                     or 0.1)
        self.use_swa = bool(opt.get("use_swa"))
        self.swa_start_iter = int(float(train_opt.get(
            "swa_start_iter", 0) or 0))
        self.use_ema = bool(opt.get("use_ema") or train_opt.get("use_ema"))
        self.ema_decay = float(train_opt.get("ema_decay", 0.999) or 0.999)
        self.unshuffle_scale = int(opt.get("unshuffle_scale", 0) or 0) \
            if opt.get("use_unshuffle") else 0

        # CEM wrapper (ref base_model.setup_cem:746): project G outputs
        # onto the downscale-consistency subspace inside the jitted step
        self.use_cem = bool(opt.get("use_cem"))
        self.cem_kernel = (opt.get("cem") or {}).get("kernel", "box") \
            if isinstance(opt.get("cem"), dict) else "box"

        # AdaTarget (ref base_model.setup_atg:603): LocNet-aligned targets
        self.use_atg = bool(opt.get("use_atg"))
        self.atg_start_iter = int(float(train_opt.get("atg_start_iter", 0)
                                        or 0))
        if self.use_atg:
            from ..ops.adatarget import LocNet

            self.loc_net = LocNet()
        else:
            self.loc_net = None

        # FreezeD (ref base_model.setup_freezeD:663): freeze the first
        # `freeze_loc` D layers during finetune
        self.freeze_loc = int(train_opt.get("freeze_loc", 0) or 0) \
            if train_opt.get("freeze_d") or train_opt.get("freeze_loc") \
            else 0

        # batchaug / diffaug / freq-sep ---------------------------------
        self.batchaug = None
        if train_opt.get("mixup"):
            mixopts = train_opt.get("mixopts",
                                    ["blend", "rgb", "mixup", "cutmix",
                                     "cutmixup"])
            alphas = dict(zip(mixopts, train_opt.get("mixalpha", []) or []))
            self.batchaug = BatchAugment(
                list(mixopts) + ["none"],
                (list(train_opt.get("mixprob", []) or
                      [1.0] * len(mixopts)) + [1.0]), alphas)
            self.cutblur = "cutblur" in mixopts
        else:
            self.cutblur = False
        self.dapolicy = (train_opt.get("dapolicy", "") or "") \
            if train_opt.get("diffaug") else ""
        self.use_fs = bool(train_opt.get("fs"))
        lpf = train_opt.get("lpf_type", "average")
        hpf = train_opt.get("hpf_type", "average")
        self.f_low = (lambda x: filter_low(x, kernel_size=9,
                                           filter_type=lpf)) \
            if self.use_fs else None
        self.f_high = (lambda x: filter_high(x, kernel_size=9,
                                             filter_type=hpf)) \
            if self.use_fs else None

        self._jit_cache: Dict[Any, Callable] = {}

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, lr_shape: Tuple[int, ...],
                   hr_shape: Optional[Tuple[int, ...]] = None
                   ) -> SRTrainState:
        rng, rg, rd, rstate = jax.random.split(rng, 4)
        lr_in = jnp.zeros(lr_shape, jnp.float32)
        if self.unshuffle_scale:
            lr_in = space_to_depth(lr_in, self.unshuffle_scale)
        # jit the inits: eager init dispatches hundreds of tiny programs,
        # which is pathological on remote-compile backends
        g_vars = jax.jit(lambda r, x: self.netG.init(
            {"params": r, "noise": r}, x, train=False))(rg, lr_in)
        g_extra = {k: v for k, v in g_vars.items() if k != "params"}
        g = NetState(params=g_vars["params"],
                     opt_state=self.optG.init(g_vars["params"]),
                     extra=g_extra)
        d = None
        if self.use_gan:
            if hr_shape is None:
                b, h, w, c = lr_shape
                hr_shape = (b, h * self.scale, w * self.scale,
                            int(self.opt["network_G"].get("out_nc", 3)))
            d_vars = jax.jit(lambda r, x: self.netD.init(
                r, x, train=False))(rd, jnp.zeros(hr_shape, jnp.float32))
            d_extra = {k: v for k, v in d_vars.items() if k != "params"}
            d = NetState(params=d_vars["params"],
                         opt_state=self.optD.init(d_vars["params"]),
                         extra=d_extra)
        loc = None
        if self.use_atg:
            rng, rl = jax.random.split(rng)
            lv = self.loc_net.init(rl, jnp.zeros((1, 7, 7)),
                                   jnp.zeros((1, 9, 9)))
            loc = NetState(params=lv["params"],
                           opt_state=self.optG.init(lv["params"]))
        state = SRTrainState(step=jnp.zeros([], jnp.int32), rng=rstate,
                             g=g, d=d, loc=loc)
        if self.grad_clip == "auto":
            state = state.replace(grad_hist=init_grad_hist())
        if self.use_swa:
            state = init_swa(state)
        if self.use_ema:
            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, state.g.params))
        return state

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------
    def _g_apply(self, g: NetState, lr_img, rng, train: bool):
        x = lr_img
        if self.unshuffle_scale:
            x = space_to_depth(x, self.unshuffle_scale)
        kwargs = {}
        mutable = [k for k in g.extra] if train and g.extra else False
        out = self.netG.apply(g.variables(), x, train=train,
                              rngs={"noise": rng, "dropout": rng},
                              mutable=mutable, **kwargs)
        if mutable:
            y, new_extra = out
            return y, dict(new_extra)
        return out, g.extra

    def _d_apply(self, d: NetState, params, x, train: bool,
                 return_feats: bool = False):
        """Always returns (logits, extra_collections)."""
        variables = {"params": params, **d.extra}
        mutable = [k for k in d.extra] if train and d.extra else False
        kwargs = {"return_feats": True} if return_feats else {}
        out = self.netD.apply(variables, x, train=train, mutable=mutable,
                              **kwargs)
        if mutable:
            logits, new_extra = out
            return logits, dict(new_extra)
        return out, d.extra

    # ------------------------------------------------------------------
    # train step (pure)
    # ------------------------------------------------------------------
    def _train_step(self, state: SRTrainState, batch: Dict[str, jnp.ndarray],
                    lr_g: jnp.ndarray, lr_d: jnp.ndarray,
                    *, update_d: bool, update_g: bool,
                    atg_on: bool = False
                    ) -> Tuple[SRTrainState, Dict[str, jnp.ndarray]]:
        rng, r_aug, r_da, r_gp, r_noise = jax.random.split(state.rng, 5)
        # uint8 wire batches normalize on device (ops/blocks.wire_to_f01)
        lr_img = wire_to_f01(batch["LR"], self.znorm)
        hr_img = wire_to_f01(batch["HR"], self.znorm)
        logs: Dict[str, jnp.ndarray] = {}

        # batch augmentations (ref sr_model.py:213-220)
        mask = None
        if self.batchaug is not None:
            # augs operate on equal-size pairs: nearest up/down is exact
            # for integer scales, so non-cut regions survive bit-exact
            # (the reference upsamples for cutblur, ref sr_model.py:213;
            # its other augs scale box coords instead — same effect)
            up = self.scale > 1
            if up:
                lr_img = interpolate(lr_img, scale=self.scale,
                                     mode="nearest")
            hr_img, lr_img, mask, _ = self.batchaug(r_aug, hr_img, lr_img)
            if up:
                lr_img = interpolate(lr_img, scale=1.0 / self.scale,
                                     mode="nearest")

        def forward_g(params, lr_c, hr_c, msk, loc_params=None):
            g = state.g.replace(params=params)
            fake, new_extra = self._g_apply(g, lr_c, r_noise, train=True)
            fake = fake.astype(jnp.float32)
            if self.use_cem:
                from ..ops.cem import cem_project

                fake = cem_project(fake, lr_c.astype(jnp.float32),
                                   self.scale, kernel=self.cem_kernel)
            if loc_params is not None:
                # AdaTarget: align the target to the output per patch
                from ..ops.adatarget import ada_target

                hr_c = ada_target(fake, hr_c, loc_params, self.loc_net)
            # AdaTarget's patch grid drops the ragged edge when
            # H,W % 7 != 0 — compute the loss on the aligned region
            # (the reference F.folds into zeros there, atg.py:101)
            ha, wa = hr_c.shape[1], hr_c.shape[2]
            fake_roi = fake[:, :ha, :wa] \
                if fake.shape[1:3] != (ha, wa) else fake
            msk_roi = (msk[:, :ha, :wa]
                       if msk is not None
                       and msk.shape[1:3] != (ha, wa) else msk)
            if msk_roi is not None:
                fake_l = fake_roi * msk_roi
                hr_l = hr_c * msk_roi
            else:
                fake_l, hr_l = fake_roi, hr_c
            total, llogs = self.generator_loss(fake_l, hr_l,
                                               f_low=self.f_low)
            if self.use_gan:
                d_params = jax.lax.stop_gradient(state.d.params)
                fa = fake_l
                ra = hr_l
                if self.f_high is not None:
                    fa, ra = self.f_high(fa), self.f_high(ra)
                if self.dapolicy:
                    fa = diff_augment(r_da, fa, self.dapolicy)
                    ra = diff_augment(r_da, ra, self.dapolicy)

                def d_fn(x, want_maps=False):
                    # train=True: the reference keeps netD in train mode
                    # for the G-stage adversarial pass too (ref
                    # sr_model.py:162-193), so BatchNorm uses BATCH stats
                    # and G's gradient flows through them. Eval-mode
                    # running stats lag early in training and give G a
                    # vacuous adversarial signal (D "fooled" under stale
                    # stats while winning under batch stats), which lets
                    # D saturate unopposed. Stat mutations are discarded;
                    # the D stage owns the running-stat update.
                    out, _ = self._d_apply(state.d, d_params, x,
                                           train=True,
                                           return_feats=want_maps)
                    return out

                l_g_gan = self.adversarial.generator_loss(d_fn, fa, ra)
                llogs["l_g_gan"] = l_g_gan
                total = total + l_g_gan
            return total, (llogs, fake, new_extra)

        A = self.accumulations

        def accum_microbatches(grad_fn, params, *arrays):
            """Gradient accumulation over A microbatches via lax.scan
            (virtual batch, ref base_model.py:722,805). arrays' leading dim
            must be divisible by A."""
            chunks = [x.reshape(A, x.shape[0] // A, *x.shape[1:])
                      if x is not None else None for x in arrays]
            zero_g = jax.tree.map(jnp.zeros_like, params)

            def body(acc, xs):
                (loss, aux), g = grad_fn(params, *[
                    x if x is not None else None for x in xs])
                acc_g = jax.tree.map(jnp.add, acc[0], g)
                return (acc_g, acc[1] + loss), aux

            init = (zero_g, jnp.zeros((), jnp.float32))
            (g_sum, loss_sum), auxs = jax.lax.scan(
                body, init,
                tuple(c for c in chunks))
            grads = jax.tree.map(lambda g: g / A, g_sum)
            return loss_sum / A, grads, auxs

        new_g = state.g
        fake_for_d = None
        new_loc = state.loc
        new_hist = state.grad_hist
        if update_g:
            if self.use_atg and state.loc is not None and atg_on:
                # joint grads over (G, LocNet) (ref sr_model.py:45-47)
                def fwd_joint(gp, lp):
                    return forward_g(gp, lr_img, hr_img, mask,
                                     loc_params=lp)

                (loss_g, (glogs, fake_for_d, g_extra)), (grads, lgrads) = \
                    jax.value_and_grad(fwd_joint, argnums=(0, 1),
                                       has_aux=True)(
                        state.g.params, state.loc.params)
                lgrads = clip_grads(lgrads, self.grad_clip,
                                    self.grad_clip_value)
                lp, lo = self.optG.apply(lgrads, state.loc.opt_state,
                                         state.loc.params, lr_g)
                new_loc = NetState(lp, lo)
            elif A == 1:
                (loss_g, (glogs, fake_for_d, g_extra)), grads = \
                    jax.value_and_grad(forward_g, has_aux=True)(
                        state.g.params, lr_img, hr_img, mask)
            else:
                gfn = jax.value_and_grad(forward_g, has_aux=True)
                msk = mask if mask is not None else \
                    jnp.ones((*hr_img.shape[:3], 1), hr_img.dtype)
                loss_g, grads, (glogs, fakes, g_extra) = accum_microbatches(
                    lambda p, l, h, m: gfn(p, l, h, m),
                    state.g.params, lr_img, hr_img, msk)
                fake_for_d = fakes.reshape(-1, *fakes.shape[2:])
                glogs = jax.tree.map(jnp.mean, glogs)
                g_extra = jax.tree.map(lambda x: x[-1], g_extra)
            if self.grad_clip == "auto" and state.grad_hist is not None:
                grads, new_hist = agc_percentile_clip(grads,
                                                      state.grad_hist)
            else:
                grads = clip_grads(grads, self.grad_clip,
                                   self.grad_clip_value)
            new_params, new_opt = self.optG.apply(
                grads, state.g.opt_state, state.g.params, lr_g)
            new_g = NetState(new_params, new_opt, g_extra)
            logs.update(glogs)
            logs["l_g_total"] = loss_g
        else:
            fake_for_d, g_extra = self._g_apply(state.g, lr_img, r_noise,
                                                train=True)
            fake_for_d = fake_for_d.astype(jnp.float32)
            new_g = state.g.replace(extra=g_extra)

        new_d = state.d
        if self.use_gan and update_d:
            fake_det = jax.lax.stop_gradient(fake_for_d)
            fa, ra = fake_det, hr_img
            if self.f_high is not None:
                fa, ra = self.f_high(fa), self.f_high(ra)
            if self.dapolicy:
                fa = diff_augment(r_da, fa, self.dapolicy)
                ra = diff_augment(r_da, ra, self.dapolicy)

            def forward_d(d_params, fa_c, ra_c):
                extra_box = {}

                def d_fn(x):
                    logits, new_extra = self._d_apply(state.d, d_params, x,
                                                      train=True)
                    extra_box.update(new_extra)
                    return logits

                l_d, dlogs = self.adversarial.discriminator_loss(
                    d_fn, fa_c, ra_c, gp_rng=r_gp)
                return l_d, (dlogs, extra_box)

            if A == 1:
                (loss_d, (dlogs, d_extra)), dgrads = jax.value_and_grad(
                    forward_d, has_aux=True)(state.d.params, fa, ra)
            else:
                dfn = jax.value_and_grad(forward_d, has_aux=True)
                loss_d, dgrads, (dlogs, d_extra) = accum_microbatches(
                    dfn, state.d.params, fa, ra)
                dlogs = jax.tree.map(jnp.mean, dlogs)
                d_extra = jax.tree.map(lambda x: x[-1], d_extra)
            if self.grad_clip == "auto" and new_hist is not None:
                dgrads = clip_grads(dgrads, "norm",
                                    agc_hist_percentile(new_hist))
            else:
                dgrads = clip_grads(dgrads, self.grad_clip,
                                    self.grad_clip_value)
            if self.freeze_loc:
                # FreezeD (ref base_model.py:663): zero grads of the first
                # freeze_loc feature layers (name-sorted module order)
                frozen = set(sorted(dgrads)[:self.freeze_loc])
                dgrads = {k: (jax.tree.map(jnp.zeros_like, v)
                              if k in frozen else v)
                          for k, v in dgrads.items()}
            d_params, d_opt = self.optD.apply(
                dgrads, state.d.opt_state, state.d.params, lr_d)
            new_d = NetState(d_params, d_opt, d_extra or state.d.extra)
            logs.update(dlogs)
            logs["l_d_total"] = loss_d

        state = state.replace(step=state.step + 1, rng=rng, g=new_g,
                              d=new_d, loc=new_loc, grad_hist=new_hist)
        if self.use_ema:
            state = ema_update(state, self.ema_decay)
        return state, logs

    # ------------------------------------------------------------------
    # public jitted entry
    # ------------------------------------------------------------------
    def _get_step_fn(self, update_d: bool, update_g: bool,
                     atg_on: bool = False) -> Callable:
        key = (update_d, update_g, atg_on)
        if key not in self._jit_cache:
            fn = functools.partial(self._train_step, update_d=update_d,
                                   update_g=update_g, atg_on=atg_on)
            if self.mesh is not None:
                bsh = batch_sharding(self.mesh)
                repl = NamedSharding(self.mesh, P())
                self._jit_cache[key] = jax.jit(
                    fn,
                    in_shardings=(None, {"LR": bsh, "HR": bsh}, None, None),
                    donate_argnums=(0,))
            else:
                self._jit_cache[key] = jax.jit(fn, donate_argnums=(0,))
        return self._jit_cache[key]

    def train_step(self, state: SRTrainState, batch: Dict[str, Any]
                   ) -> Tuple[SRTrainState, Dict[str, jnp.ndarray]]:
        """One optimization step; host-side schedule decisions mirror ref
        sr_model.optimize_parameters:246-267.

        The step counter is mirrored host-side: reading int(state.step)
        would force a device sync every iteration (costly on high-latency
        links), so we only sync once to (re)seed the mirror."""
        if getattr(self, "_host_step", None) is None:
            self._host_step = int(state.step)
        step = self._host_step
        self._host_step += 1
        lr_g = self.schedG.get_lr(step)
        lr_d = self.schedD.get_lr(step) if self.schedD else 0.0
        update_g = (not self.use_gan) or (
            step % self.d_update_ratio == 0 and step >= self.d_init_iters)
        update_d = self.use_gan
        atg_on = self.use_atg and step >= self.atg_start_iter
        fn = self._get_step_fn(update_d, update_g, atg_on)
        state, logs = fn(state, batch, jnp.float32(lr_g), jnp.float32(lr_d))
        # gate only on use_swa: swa_start_iter=0 means "from the beginning"
        if self.use_swa and step >= self.swa_start_iter:
            if state.swa_params is None:
                state = init_swa(state)
            state = swa_update(state)
        return state, logs

    def can_scan_steps(self) -> bool:
        """True when a multi-step window is expressible as one compiled
        scan: no host-side schedule transitions inside the window (SWA
        averaging, ATG activation, D-ratio G-step gating)."""
        return not (self.use_swa or self.use_atg
                    or (self.use_gan and (self.d_update_ratio != 1
                                          or self.d_init_iters > 0)))

    def train_steps(self, state: SRTrainState, batches: Dict[str, Any]
                    ) -> Tuple[SRTrainState, Dict[str, jnp.ndarray]]:
        """Run k optimization steps in ONE jitted `lax.scan` dispatch.

        TPU-first amortization: on remote/high-latency runtimes every
        `train_step` call pays a host->device dispatch round-trip; a
        scanned window pays it once per k steps. Identical math to k
        sequential `train_step` calls — gated bitwise in
        tests/test_sr_trainer_features.py.

        `batches`: dict of arrays with a leading (k, ...) step axis.
        Per-step learning rates come in as scanned arrays so MultiStep
        boundaries inside the window are exact. Returns (state, logs)
        with every log stacked to shape (k,). Falls back to sequential
        `train_step` calls when the window crosses a host-side schedule
        transition (`can_scan_steps`)."""
        k = int(jax.tree.leaves(batches)[0].shape[0])
        if getattr(self, "_host_step", None) is None:
            self._host_step = int(state.step)
        if not self.can_scan_steps():
            out = []
            for i in range(k):
                state, logs = self.train_step(
                    state, jax.tree.map(lambda v: v[i], batches))
                out.append(logs)
            # log keys can differ across steps (e.g. D_update_ratio
            # skips G losses on some steps): stack over the key union,
            # NaN where a step did not produce the entry
            keys = sorted({kk for lg in out for kk in lg})
            nan = jnp.float32(jnp.nan)
            return state, {kk: jnp.stack([
                jnp.asarray(lg.get(kk, nan), jnp.float32) for lg in out])
                for kk in keys}
        step0 = self._host_step
        lr_g = jnp.asarray([self.schedG.get_lr(step0 + i)
                            for i in range(k)], jnp.float32)
        lr_d = jnp.asarray([self.schedD.get_lr(step0 + i) if self.schedD
                            else 0.0 for i in range(k)], jnp.float32)
        key = ("scan", self.use_gan, k)
        if key not in self._jit_cache:
            fn = functools.partial(self._train_step,
                                   update_d=self.use_gan, update_g=True,
                                   atg_on=False)

            def scan_fn(st, bat, lg, ld):
                def body(carry, xs):
                    b, g, d = xs
                    return fn(carry, b, g, d)

                return jax.lax.scan(body, st, (bat, lg, ld))

            if self.mesh is not None:
                bsh = batch_sharding(self.mesh)
                ssh = NamedSharding(self.mesh, P(None, *bsh.spec))
                self._jit_cache[key] = jax.jit(
                    scan_fn,
                    in_shardings=(None, {"LR": ssh, "HR": ssh},
                                  None, None),
                    donate_argnums=(0,))
            else:
                self._jit_cache[key] = jax.jit(scan_fn, donate_argnums=(0,))
        state, logs = self._jit_cache[key](state, batches, lr_g, lr_d)
        # advance the host mirror only after a successful dispatch: a
        # compile/dispatch failure must not skew the LR schedule
        self._host_step += k
        return state, logs

    # ------------------------------------------------------------------
    # eval
    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _eval_step(self, g: NetState, lr_img, use_ema_or_swa: str = "",
                   apply_cem: Optional[bool] = None):
        x = lr_img.astype(jnp.float32)
        y, _ = self._g_apply(g, x, jax.random.PRNGKey(0), train=False)
        y = y.astype(jnp.float32)
        if self.use_cem if apply_cem is None else apply_cem:
            from ..ops.cem import cem_project

            y = cem_project(y, x, self.scale, kernel=self.cem_kernel)
        return y

    def eval_step(self, state: SRTrainState, lr_img,
                  which: str = "auto",
                  apply_cem: Optional[bool] = None) -> jnp.ndarray:
        """Inference forward (ref sr_model.test:269).

        which: 'g' | 'ema' | 'swa' | 'auto' (auto prefers ema, then swa
        when available — mirrors validating the averaged model after the
        SWA switchover, ref base_model.py:246-323). apply_cem overrides
        the trainer-level CEM toggle (used by the test CLI's out_orig
        post-processing, ref test.py:150)."""
        g = state.g
        if which in ("ema", "auto") and state.ema_params is not None:
            g = state.g.replace(params=state.ema_params)
        elif which == "swa" and state.swa_params is not None:
            g = state.g.replace(params=state.swa_params)
        return self._eval_step(g, lr_img, apply_cem=apply_cem)

    def eval_step_chop(self, state: SRTrainState, lr_img,
                       patch_size: int = 128,
                       overlap: int = 16) -> jnp.ndarray:
        """Tiled inference for large inputs (ref sr_model.test_chop:319,
        dataops/common.py extract_patches_2d:575 / recompose_tensor:695).

        TPU-native: fixed patch size -> ONE jit specialization regardless of
        image size; tiles are batched through the net in one call; overlaps
        blend by uniform averaging of contributing tiles.
        """
        b, h, w, c = lr_img.shape
        s = self.scale
        p = min(patch_size, h, w)
        step = max(p - overlap, 1)
        ys = list(range(0, max(h - p, 0) + 1, step))
        xs = list(range(0, max(w - p, 0) + 1, step))
        if ys[-1] != h - p:
            ys.append(h - p)
        if xs[-1] != w - p:
            xs.append(w - p)
        tiles = jnp.concatenate(
            [lr_img[:, y:y + p, x:x + p, :] for y in ys for x in xs], axis=0)
        outs = []
        for i in range(0, tiles.shape[0], 32):
            outs.append(self.eval_step(state, tiles[i:i + 32]))
        out_tiles = jnp.concatenate(outs, axis=0)
        acc = jnp.zeros((b, h * s, w * s, out_tiles.shape[-1]), jnp.float32)
        cnt = jnp.zeros((b, h * s, w * s, 1), jnp.float32)
        k = 0
        for y in ys:
            for x in xs:
                tile = out_tiles[k * b:(k + 1) * b]
                acc = jax.lax.dynamic_update_slice(
                    acc, jax.lax.dynamic_slice(
                        acc, (0, y * s, x * s, 0), tile.shape) + tile,
                    (0, y * s, x * s, 0))
                cnt = jax.lax.dynamic_update_slice(
                    cnt, jax.lax.dynamic_slice(
                        cnt, (0, y * s, x * s, 0),
                        (b, p * s, p * s, 1)) + 1.0,
                    (0, y * s, x * s, 0))
                k += 1
        return acc / cnt

    def eval_step_spatial(self, state: SRTrainState, lr_img, mesh,
                          axis: str = "sp", halo: int = 16,
                          which: str = "auto") -> jnp.ndarray:
        """Band-parallel inference over a spatial mesh axis — the
        multi-chip scale-out of eval_step_chop (ref sr_model.test_chop
        :319). The image's height is sharded over `axis`; each device
        exchanges `halo` edge rows with neighbours over ICI and runs the
        full net on its band (parallel/spatial.py). Exact vs eval_step
        wherever halo covers the effective receptive field (gated in
        tests/test_parallel.py)."""
        from ..parallel.spatial import spatial_infer

        g = state.g
        if which in ("ema", "auto") and state.ema_params is not None:
            g = state.g.replace(params=state.ema_params)
        elif which == "swa" and state.swa_params is not None:
            g = state.g.replace(params=state.swa_params)

        def apply_fn(x):
            y, _ = self._g_apply(g, x.astype(jnp.float32),
                                 jax.random.PRNGKey(0), train=False)
            y = y.astype(jnp.float32)
            if self.use_cem:
                from ..ops.cem import cem_project

                y = cem_project(y, x.astype(jnp.float32), self.scale,
                                kernel=self.cem_kernel)
            return y

        return spatial_infer(apply_fn, lr_img, mesh, axis=axis,
                             halo=halo, scale=self.scale)

    def eval_step_x8(self, state: SRTrainState, lr_img) -> jnp.ndarray:
        """x8 geometric self-ensemble (ref sr_model.test_x8:279)."""
        outs = []
        for rot in range(4):
            for flip in (False, True):
                x = jnp.rot90(lr_img, rot, (1, 2))
                if flip:
                    x = x[:, :, ::-1, :]
                y = self.eval_step(state, x)
                if flip:
                    y = y[:, :, ::-1, :]
                y = jnp.rot90(y, -rot, (1, 2))
                outs.append(y)
        return jnp.mean(jnp.stack(outs), axis=0)

    # ------------------------------------------------------------------
    # SWA BN-statistics refresh (ref base_model.py:180 update_bn on save)
    # ------------------------------------------------------------------
    def refresh_swa_bn(self, state, batches):
        """Return `extra` collections with BatchNorm running stats
        recomputed for the SWA-averaged params over `batches` of LR
        images (device arrays). No-op when G has no batch_stats or SWA
        is not active."""
        from .state import refresh_bn_stats

        if state.swa_params is None or not state.g.extra:
            return state.g.extra

        def apply_fn(variables, x, train, mutable):
            # match _train_step's input normalization: uint8/znorm wire
            # batches must hit BN in the same range training used, or
            # the refreshed stats poison the SWA checkpoint
            x = wire_to_f01(x, self.znorm)
            return self.netG.apply(
                variables, x, train=train,
                rngs={"noise": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(0)},
                mutable=mutable)

        return refresh_bn_stats(apply_fn, state.swa_params,
                                state.g.extra, batches)
