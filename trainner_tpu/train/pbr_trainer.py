"""PBR multi-map material SR trainer.

Equivalent of ref codes/models/PBR_model.py:16 (PBRModel): one generator
super-resolves every material map; 3-channel maps (diffuse/albedo/normal)
use the full loss stack, 1-channel maps (ao/height/metalness/roughness/
reflection) use a feature-net-free stack (ref :62-63, allow_featnets
False). Maps are batched through G together (folded into the batch axis)
— one compiled step regardless of how many maps a material has.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..losses.generator_loss import GeneratorLoss
from ..models.networks import define_G
from .optimizers import build_optimizer
from .schedulers import build_scheduler
from .state import NetState, SRTrainState
from .sr_trainer import clip_grads

_MAPS_3CH = ("diffuse", "albedo", "normal")
_MAPS_1CH = ("ao", "height", "metalness", "reflection", "roughness")


class PBRTrainer:
    def __init__(self, opt: dict, mesh: Optional[Mesh] = None,
                 dtype=jnp.float32):
        self.opt = opt
        self.mesh = mesh
        train_opt = opt.get("train") or {}
        self.train_opt = train_opt
        self.scale = int(opt.get("scale", 4) or 4)
        self.netG = define_G(opt, dtype=dtype)
        self.loss_3ch = GeneratorLoss(opt, allow_featnets=True,
                                      device_dtype=dtype)
        self.loss_1ch = GeneratorLoss(opt, allow_featnets=False,
                                      device_dtype=dtype)
        niter = int(float(train_opt.get("niter", 5e5) or 5e5))
        self.optG = build_optimizer(train_opt.get("optim_G", "adam"))
        self.schedG = build_scheduler(train_opt,
                                      base_lr=train_opt.get("lr_G", 1e-4),
                                      niter=niter)
        self.grad_clip = train_opt.get("grad_clip")
        self.grad_clip_value = float(train_opt.get("grad_clip_value", 0.1)
                                     or 0.1)
        self._jit_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    def init_state_from_batch(self, rng, batch):
        return self.init_state(rng, jnp.asarray(batch["LR"]).shape)

    def init_state(self, rng: jax.Array, lr_shape, hr_shape=None
                   ) -> SRTrainState:
        rng, rg, rstate = jax.random.split(rng, 3)
        g_vars = jax.jit(lambda r, x: self.netG.init(
            {"params": r, "noise": r}, x, train=False))(
            rg, jnp.zeros(lr_shape, jnp.float32))
        g = NetState(g_vars["params"], self.optG.init(g_vars["params"]),
                     {k: v for k, v in g_vars.items() if k != "params"})
        return SRTrainState(step=jnp.zeros([], jnp.int32), rng=rstate, g=g)

    # ------------------------------------------------------------------
    def _map_keys(self, batch) -> List[str]:
        return sorted(k[3:] for k in batch
                      if k.startswith("LR_") and k != "LR_path")

    def _train_step(self, state, batch, lr_g, *, map_keys):
        rng, r_noise = jax.random.split(state.rng)
        logs: Dict[str, jnp.ndarray] = {}

        def forward_g(params):
            total = jnp.float32(0.0)
            llogs = {}
            for name in map_keys:
                lr_map = batch[f"LR_{name}"].astype(jnp.float32)
                hr_map = batch[f"HR_{name}"].astype(jnp.float32)
                nc = lr_map.shape[-1]
                if nc == 1:  # run 1ch maps through a replicated-3ch pass
                    lr_in = jnp.repeat(lr_map, 3, axis=-1)
                else:
                    lr_in = lr_map
                fake = self.netG.apply(
                    {"params": params, **state.g.extra}, lr_in,
                    train=True, rngs={"noise": r_noise}
                ).astype(jnp.float32)
                if nc == 1:
                    fake = jnp.mean(fake, axis=-1, keepdims=True)
                loss_fn = self.loss_3ch if nc == 3 else self.loss_1ch
                l, sub = loss_fn(fake, hr_map)
                total = total + l
                for k, v in sub.items():
                    llogs[f"{k}_{name}"] = v
            return total, llogs

        (loss_g, glogs), grads = jax.value_and_grad(
            forward_g, has_aux=True)(state.g.params)
        grads = clip_grads(grads, self.grad_clip, self.grad_clip_value)
        g_params, g_opt = self.optG.apply(grads, state.g.opt_state,
                                          state.g.params, lr_g)
        logs.update(glogs)
        logs["l_g_total"] = loss_g
        return state.replace(
            step=state.step + 1, rng=rng,
            g=state.g.replace(params=g_params, opt_state=g_opt)), logs

    def train_step(self, state: SRTrainState, batch: Dict[str, Any]):
        map_keys = tuple(self._map_keys(batch))
        if getattr(self, "_host_step", None) is None:
            self._host_step = int(state.step)
        step = self._host_step
        self._host_step += 1
        lr_g = jnp.float32(self.schedG.get_lr(step))
        if map_keys not in self._jit_cache:
            self._jit_cache[map_keys] = jax.jit(functools.partial(
                self._train_step, map_keys=map_keys), donate_argnums=(0,))
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if k.startswith(("LR_", "HR_")) and
                  not k.endswith("path")}
        return self._jit_cache[map_keys](state, arrays, lr_g)

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def _eval(self, g: NetState, lr_img):
        return self.netG.apply({"params": g.params, **g.extra},
                               lr_img.astype(jnp.float32),
                               train=False).astype(jnp.float32)

    def eval_step(self, state: SRTrainState, lr_img):
        return self._eval(state.g, lr_img)
