"""PPON progressive 3-phase trainer.

Equivalent of ref codes/models/ppon_model.py:9 (PPONModel on SRModel):
phase milestones `ppon_stages` [s1, s2] switch content -> structure ->
perceptual training (ref update_stage:33); per-phase loss selectors
p1/p2/p3_losses (ref :19-25); per-phase branch freezing (ref
set_optim_params:52) — here realized as gradient masks over the branch
param-name prefixes; the network's phase-indexed output (out_c/out_s/out_p)
feeds the losses.

Implementation: extends SRTrainer; the phase is decided host-side from the
step and selects one of three cached jit specializations.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .sr_trainer import SRTrainer
from .state import SRTrainState

# param-name prefixes per branch (models/ppon.py naming)
_PHASE_PREFIXES = {
    1: ("fea_conv", "rb", "lr_conv", "up_c", "hr0_c", "hr1_c"),
    2: ("ssim", "up_s", "hr0_s", "hr1_s"),
    3: ("gan", "up_p", "hr0_p", "hr1_p"),
}


class PPONTrainer(SRTrainer):
    def __init__(self, opt: dict, mesh=None, dtype=jnp.float32):
        super().__init__(opt, mesh=mesh, dtype=dtype)
        train_opt = opt.get("train") or {}
        self.p1_losses = list(train_opt.get("p1_losses") or ["pix"])
        self.p2_losses = list(train_opt.get("p2_losses") or
                              ["pix-multiscale", "ms-ssim"])
        self.p3_losses = list(train_opt.get("p3_losses") or ["contextual"])
        self.stages_m = list(train_opt.get("ppon_stages") or
                             [50000, 75000])
        self.inference_phase = int(opt.get("ppon_phase", 3) or 3)

    # ------------------------------------------------------------------
    def current_phase(self, step: int) -> int:
        phase = 1
        for i, s in enumerate(self.stages_m):
            if step >= s:
                phase = i + 2
        return min(phase, 3)

    def _phase_selectors(self, phase: int):
        return {1: self.p1_losses, 2: self.p2_losses,
                3: self.p3_losses}[phase]

    @staticmethod
    def _mask_to_phase(grads, phase: int):
        """Zero gradients outside the active branch (ref per-phase
        requires_grad freezing, ppon_model.py:52-110)."""
        prefixes = _PHASE_PREFIXES[phase]

        def mask(d):
            return {k: (v if any(k.startswith(p) for p in prefixes)
                        else jax.tree.map(jnp.zeros_like, v))
                    for k, v in d.items()}

        return mask(grads)

    # ------------------------------------------------------------------
    def _train_step_ppon(self, state: SRTrainState, batch, lr_g, lr_d,
                         *, phase: int):
        from ..ops.blocks import wire_to_f01

        rng, r_noise, r_gp = jax.random.split(state.rng, 3)
        lr_img = wire_to_f01(batch["LR"], self.znorm)
        hr_img = wire_to_f01(batch["HR"], self.znorm)
        selectors = self._phase_selectors(phase)
        use_gan = self.use_gan and phase == 3
        logs: Dict[str, jnp.ndarray] = {}

        def forward_g(params):
            outs = self.netG.apply({"params": params}, lr_img, train=True)
            out = outs[phase - 1].astype(jnp.float32)
            total, llogs = self.generator_loss(out, hr_img,
                                               selectors=selectors)
            if use_gan:
                d_params = jax.lax.stop_gradient(state.d.params)

                def d_fn(x):
                    # batch-stats BN for the G-stage pass (ref keeps netD
                    # in train mode throughout); stat updates discarded
                    variables = {"params": d_params, **state.d.extra}
                    mutable = [k for k in state.d.extra] \
                        if state.d.extra else False
                    o = self.netD.apply(variables, x, train=True,
                                        mutable=mutable)
                    return o[0] if mutable else o

                l_gan = self.adversarial.generator_loss(d_fn, out, hr_img)
                llogs["l_g_gan"] = l_gan
                total = total + l_gan
            return total, (llogs, out)

        (loss_g, (glogs, out)), grads = jax.value_and_grad(
            forward_g, has_aux=True)(state.g.params)
        grads = self._mask_to_phase(grads, phase)
        g_params, g_opt = self.optG.apply(grads, state.g.opt_state,
                                          state.g.params, lr_g)
        # restore frozen-branch params (optimizer momentum from earlier
        # phases must not keep moving them — mirrors requires_grad=False)
        prefixes = _PHASE_PREFIXES[phase]
        g_params = {k: (v if any(k.startswith(p) for p in prefixes)
                        else state.g.params[k])
                    for k, v in g_params.items()}
        new_g = state.g.replace(params=g_params, opt_state=g_opt)
        logs.update(glogs)
        logs["l_g_total"] = loss_g
        logs["ppon_phase"] = jnp.float32(phase)

        new_d = state.d
        if use_gan:
            fake = jax.lax.stop_gradient(out)

            def forward_d(d_params):
                box = {}

                def d_fn(x):
                    variables = {"params": d_params, **state.d.extra}
                    mutable = [k for k in state.d.extra] \
                        if state.d.extra else False
                    o = self.netD.apply(variables, x, train=True,
                                        mutable=mutable)
                    if mutable:
                        o, extra = o
                        box.update(dict(extra))
                    return o

                l_d, dlogs = self.adversarial.discriminator_loss(
                    d_fn, fake, hr_img, gp_rng=r_gp)
                return l_d, (dlogs, box)

            (loss_d, (dlogs, d_extra)), dgrads = jax.value_and_grad(
                forward_d, has_aux=True)(state.d.params)
            d_params, d_opt = self.optD.apply(dgrads, state.d.opt_state,
                                              state.d.params, lr_d)
            new_d = state.d.replace(params=d_params, opt_state=d_opt,
                                    extra=d_extra or state.d.extra)
            logs.update(dlogs)
            logs["l_d_total"] = loss_d

        return state.replace(step=state.step + 1, rng=rng, g=new_g,
                             d=new_d), logs

    def train_step(self, state: SRTrainState, batch: Dict[str, Any]):
        if getattr(self, "_host_step", None) is None:
            self._host_step = int(state.step)
        step = self._host_step
        self._host_step += 1
        phase = self.current_phase(step)
        lr_g = jnp.float32(self.schedG.get_lr(step))
        lr_d = jnp.float32(self.schedD.get_lr(step)) if self.use_gan \
            else jnp.float32(0.0)
        key = ("ppon", phase)
        if key not in self._jit_cache:
            import functools

            self._jit_cache[key] = jax.jit(functools.partial(
                self._train_step_ppon, phase=phase), donate_argnums=(0,))
        batch = {"LR": jnp.asarray(batch["LR"]),
                 "HR": jnp.asarray(batch["HR"])}
        return self._jit_cache[key](state, batch, lr_g, lr_d)

    # ------------------------------------------------------------------
    def eval_step(self, state: SRTrainState, lr_img) -> jnp.ndarray:
        outs = self.netG.apply({"params": state.g.params},
                               lr_img.astype(jnp.float32), train=False)
        return outs[self.inference_phase - 1].astype(jnp.float32)
