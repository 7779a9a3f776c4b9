"""Adversarial losses in functional JAX form.

Equivalents of ref codes/models/modules/loss.py GANLoss:61 (vanilla/lsgan/
srpgan/nsgan/hinge/wgan-gp) and codes/models/losses.py Adversarial:343
(relativistic or standard forms, conditional concatenation for pix2pix,
multiscale-D list handling, D-feature-matching loss, wgan-gp gradient
penalty, fs-filter + DiffAugment on D inputs).

Design: instead of a stateful nn.Module owning netD, the adversarial loss
is a pure function of `d_apply` (a callable params,x -> logits). The
trainers close jitted G/D loss functions over it; stop_gradient replaces
.detach(). All math in f32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .basic import get_pixel_criterion


def _bce_logits(x: jnp.ndarray, target: float) -> jnp.ndarray:
    # numerically stable BCEWithLogits with constant target
    t = jnp.full_like(x, target)
    return jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


def gan_loss(gan_type: str, x: jnp.ndarray, target_is_real: bool,
             is_disc: bool = False, real_label: float = 1.0,
             fake_label: float = 0.0) -> jnp.ndarray:
    """Core GAN objective (ref GANLoss:61)."""
    gt = gan_type.lower()
    if gt == "hinge":
        if is_disc:
            xx = -x if target_is_real else x
            return jnp.mean(jax.nn.relu(1.0 + xx))
        return jnp.mean(-x)
    if gt in ("wgan-gp", "wgangp", "wgan"):
        return -jnp.mean(x) if target_is_real else jnp.mean(x)
    label = real_label if target_is_real else fake_label
    if gt in ("vanilla", "srpgan", "nsgan"):
        return _bce_logits(x, label)
    if gt == "lsgan":
        return jnp.mean((x - label) ** 2)
    raise NotImplementedError(f"GAN type [{gan_type}] is not implemented")


def gradient_penalty(d_fn: Callable, interp: jnp.ndarray,
                     constant: float = 1.0, eps: float = 1e-16) -> jnp.ndarray:
    """WGAN-GP penalty (ref GradientPenaltyLoss:140): (||dD/dx||_2 - 1)^2 at
    random interpolates; d_fn maps images -> critic scalars."""
    def critic_sum(x):
        return jnp.sum(d_fn(x))

    grads = jax.grad(critic_sum)(interp)
    g = (grads + eps).reshape(grads.shape[0], -1)
    norm = jnp.linalg.norm(g, axis=1)
    return jnp.mean((norm - constant) ** 2)


def _as_list(pred) -> List[jnp.ndarray]:
    """Normalize multiscale-D outputs: list-of-arrays or single array."""
    if isinstance(pred, (list, tuple)):
        return list(pred)
    return [pred]


@dataclass
class AdversarialLoss:
    """Functional adversarial loss builder (ref losses.py Adversarial:343).

    Args mirror the reference train options: gan_type, gan_weight,
    form ('relativistic'|'standard'), conditional (pix2pix concat),
    gan_featmaps + dis_feature_criterion/weight, gp_weight (wgan-gp).

    Call sites pass `d_fn`: x -> logits (params already bound, with
    stop_gradient semantics handled by the caller's choice of params) and
    optionally `d_feat_fn`: x -> (logits, feats).
    """

    gan_type: str = "vanilla"
    gan_weight: float = 1.0
    form: str = "relativistic"
    conditional: bool = False
    use_featmaps: bool = False
    dis_feature_criterion: str = "l1"
    dis_feature_weight: float = 1e-4
    gp_weight: Optional[float] = None

    def _cond(self, x, condition):
        if self.conditional and condition is not None:
            # conditional GAN concatenates the input condition on channels
            return jnp.concatenate([condition, x], axis=-1)
        return x

    # ------------------------------------------------------------------
    def generator_loss(self, d_fn: Callable, fake: jnp.ndarray,
                       real: Optional[jnp.ndarray] = None,
                       condition=None) -> jnp.ndarray:
        """G-stage loss. d_fn must NOT update or differentiate D params
        (caller binds stop_gradient(d_params))."""
        fake_in = self._cond(fake, condition)
        if self.use_featmaps:
            pred_fake, feats_fake = d_fn(fake_in, True)
            pred_real, feats_real = d_fn(
                self._cond(jax.lax.stop_gradient(real), condition), True)
        else:
            feats_fake = feats_real = None
            pred_fake = d_fn(fake_in)
            pred_real = None
            if self.form != "standard":
                pred_real = d_fn(
                    self._cond(jax.lax.stop_gradient(real), condition))

        fakes, reals = _as_list(pred_fake), _as_list(pred_real)
        total = 0.0
        for i, pf in enumerate(fakes):
            if self.form == "standard":
                total += gan_loss(self.gan_type, pf, True)
            else:
                pr = jax.lax.stop_gradient(reals[i])
                total += (gan_loss(self.gan_type, pr - jnp.mean(pf), False)
                          + gan_loss(self.gan_type, pf - jnp.mean(pr), True)
                          ) / 2.0
        l_g = self.gan_weight * total

        if self.use_featmaps and feats_fake is not None:
            crit = get_pixel_criterion(self.dis_feature_criterion)
            l_fea = sum(
                crit(sf, jax.lax.stop_gradient(hf))
                for sf, hf in zip(feats_fake, feats_real)) / len(feats_fake)
            l_g = l_g + self.dis_feature_weight * l_fea
        return l_g

    # ------------------------------------------------------------------
    def discriminator_loss(self, d_fn: Callable, fake: jnp.ndarray,
                           real: jnp.ndarray, condition=None,
                           gp_rng: Optional[jax.Array] = None
                           ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """D-stage loss: fake is stop-gradient'ed here (ref
        get_predictions_dis detaches fake)."""
        fake = jax.lax.stop_gradient(fake)
        fake_in = self._cond(fake, condition)
        real_in = self._cond(real, condition)
        pred_fake = d_fn(fake_in)
        pred_real = d_fn(real_in)
        fakes, reals = _as_list(pred_fake), _as_list(pred_real)

        l_d_real = 0.0
        l_d_fake = 0.0
        for pf, pr in zip(fakes, reals):
            if self.form == "standard":
                l_d_real += gan_loss(self.gan_type, pr, True, is_disc=True)
                l_d_fake += gan_loss(self.gan_type, pf, False, is_disc=True)
            else:
                l_d_real += gan_loss(self.gan_type, pr - jnp.mean(pf), True,
                                     is_disc=True)
                l_d_fake += gan_loss(self.gan_type, pf - jnp.mean(pr), False,
                                     is_disc=True)
        l_d_total = (l_d_fake + l_d_real) * 0.5

        logs = {
            "l_d_real": l_d_real,
            "l_d_fake": l_d_fake,
            "D_real": jnp.mean(reals[0]),
            "D_fake": jnp.mean(fakes[0]),
        }

        if self.gan_type in ("wgan-gp", "wgangp") and self.gp_weight:
            assert gp_rng is not None, "wgan-gp needs an rng for interpolates"
            alpha = jax.random.uniform(gp_rng, (real.shape[0], 1, 1, 1))
            interp = alpha * fake + (1 - alpha) * real
            l_gp = self.gp_weight * gradient_penalty(
                lambda x: _as_list(d_fn(self._cond(x, condition)))[0], interp)
            l_d_total = l_d_total + l_gp
            logs["l_d_gp"] = l_gp
        return l_d_total, logs


def build_adversarial(train_opt: dict, conditional: bool = False
                      ) -> AdversarialLoss:
    """Construct from parsed train options (same keys as reference)."""
    gan_opt = train_opt.get("gan_opt") or {}
    return AdversarialLoss(
        gan_type=train_opt.get("gan_type", "vanilla"),
        gan_weight=float(train_opt.get("gan_weight", 1.0)),
        form=gan_opt.get("form", "relativistic"),
        conditional=conditional,
        use_featmaps=bool(train_opt.get("gan_featmaps")),
        dis_feature_criterion=train_opt.get("dis_feature_criterion", "l1"),
        dis_feature_weight=float(train_opt.get("dis_feature_weight", 1e-4)),
        gp_weight=train_opt.get("gp_weight"),
    )
