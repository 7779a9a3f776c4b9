"""AdaTarget: adaptive target transformation (ATG + LocNet).

Equivalent of ref codes/models/modules/adatarget/atg.py: LocNet:8 (MLP
predicting a 2x3 affine per patch from concatenated output/target
patches), ATG:58 (unfold output into 7x7 patches and target into 9x9
patches, warp each target patch by the predicted inverse affine via
affine_grid/grid_sample, fold back). Used so pixel losses tolerate small
local misalignments (AdaTarget paper).

TPU-native: patch extraction is a reshape for stride==patch (non-overlap
fold used at training), per-patch affine sampling is a batched bilinear
gather (ops/warp.grid_sample) with patches folded into the batch axis.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .warp import grid_sample

Dtype = Any


class LocNet(nn.Module):
    """Predicts per-patch 2x3 affines (ref atg.py:8). Input: concatenated
    flattened (output 7x7, target 9x9) patches per channel."""

    patch_out: int = 7
    patch_tgt: int = 9
    hidden: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, out_patches, tgt_patches):
        """(N, 7, 7), (N, 9, 9) -> (N, 2, 3) affines (identity init)."""
        n = out_patches.shape[0]
        x = jnp.concatenate(
            [out_patches.reshape(n, -1), tgt_patches.reshape(n, -1)],
            axis=-1)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc2")(x))
        theta = nn.Dense(6, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         param_dtype=jnp.float32, name="fc3")(x)
        identity = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0],
                               jnp.float32)
        return (theta + identity).reshape(n, 2, 3)


def _extract_patches(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(b, h, w, c) -> (b * nh * nw * c, p, p), non-overlapping."""
    b, h, w, c = x.shape
    nh, nw = h // p, w // p
    x = x[:, :nh * p, :nw * p]
    x = x.reshape(b, nh, p, nw, p, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(-1, p, p)


def _fold_patches(patches: jnp.ndarray, b: int, h: int, w: int, c: int,
                  p: int) -> jnp.ndarray:
    nh, nw = h // p, w // p
    x = patches.reshape(b, nh, nw, c, p, p)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, nh * p, nw * p, c)


def _center_patches(x: jnp.ndarray, p_big: int, p_small: int
                    ) -> jnp.ndarray:
    """Extract overlapping centered p_big patches on the p_small grid."""
    b, h, w, c = x.shape
    pad = (p_big - p_small) // 2
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)],
                 mode="edge")
    nh, nw = h // p_small, w // p_small
    rows = []
    for i in range(nh):
        cols = []
        for j in range(nw):
            cols.append(xp[:, i * p_small:i * p_small + p_big,
                           j * p_small:j * p_small + p_big, :])
        rows.append(jnp.stack(cols, 1))
    grid = jnp.stack(rows, 1)  # (b, nh, nw, p, p, c)
    return grid.transpose(0, 1, 2, 5, 3, 4).reshape(-1, p_big, p_big)


def ada_target(output: jnp.ndarray, target: jnp.ndarray,
               loc_params, loc_net: LocNet,
               patch_out: int = 7, patch_tgt: int = 9) -> jnp.ndarray:
    """Warp each target patch by the LocNet-predicted affine so the pixel
    loss compares aligned patches (ref atg.py ATG:58). Returns the
    transformed target, same shape as output."""
    b, h, w, c = output.shape
    po, pt = patch_out, patch_tgt
    out_p = _extract_patches(jax.lax.stop_gradient(output), po)
    tgt_big = _center_patches(target, pt, po)  # (N, 9, 9)

    # theta stays differentiable w.r.t. LocNet params (the reference
    # trains LocNet jointly through the pixel loss, ref sr_model.py:45-47);
    # the patch inputs are detached so G cannot cheat through alignment
    theta = loc_net.apply({"params": loc_params}, out_p,
                          jax.lax.stop_gradient(tgt_big))

    # sample a po x po grid inside each 9x9 target patch via the affine
    n = out_p.shape[0]
    ys = jnp.linspace(-po / pt, po / pt, po)
    xs = jnp.linspace(-po / pt, po / pt, po)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # (po, po, 3)
    coords = jnp.einsum("nij,hwj->nhwi", theta, base)  # (n, po, po, 2)
    warped = grid_sample(tgt_big[..., None], coords,
                         align_corners=True, padding_mode="border")
    return _fold_patches(warped[..., 0], b, h, w, c, po)
