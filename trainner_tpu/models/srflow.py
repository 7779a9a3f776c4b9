"""SRFlow: normalizing-flow super-resolution (NLL training + sampling).

Behavioral equivalent of ref
codes/models/modules/architectures/SRFlowNet_arch.py:14 (SRFlowNet:
normal_flow:73 NLL with quantization noise, reverse_flow:137 sampling),
SRFlow/FlowUpsamplerNet.py:12 (L levels of squeeze + K FlowSteps + split),
glow/ActNorms.py:100 (ActNorm2d), glow/Permutations.py:9
(InvertibleConv1x1), SRFlow/FlowAffineCouplingsAblation.py:9
(CondAffineSeparatedAndCond), SRFlow/Split.py:10 (Split2d),
glow/flow.py:74 (GaussianDiag).

TPU-first design notes:
  * NHWC throughout; squeeze = space_to_depth reshape (XLA-fused).
  * logdet of the invertible 1x1 conv via jnp.linalg.slogdet (f32);
    reverse pass inverts the (c, c) matrix — tiny, host-free.
  * Level conditioning: the RRDB encoder's feature map is resized to each
    level's resolution and projected by a 1x1 conv — a static-shape
    equivalent of the reference's fea_up{k} pyramid taps
    (ref SRFlow/RRDBNet_arch.py:55-75).
  * ActNorm uses standard (zeros) init rather than data-dependent init;
    couplings use zero-init final convs so the flow starts near-identity
    (same stability mechanism the reference relies on).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import interpolate
from .rrdb import ResidualDenseBlock5C

Dtype = Any

LOG2 = math.log(2.0)


def squeeze2(x: jnp.ndarray) -> jnp.ndarray:
    """(b,h,w,c) -> (b,h/2,w/2,4c), glow ordering."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def unsqueeze2(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, 2, 2, c // 4)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, c // 4)


def gaussian_logp(x: jnp.ndarray, mean=None, logs=None) -> jnp.ndarray:
    """Sum log N(x; mean, exp(logs)^2) over all non-batch dims
    (ref glow/flow.py GaussianDiag.logp:74)."""
    if mean is None:
        ll = -0.5 * (x ** 2 + math.log(2 * math.pi))
    else:
        ll = -0.5 * ((x - mean) ** 2 / jnp.exp(2.0 * logs)
                     + math.log(2 * math.pi)) - logs
    return jnp.sum(ll, axis=(1, 2, 3))


class ActNorm(nn.Module):
    """Per-channel affine with logdet (ref glow/ActNorms.py:100)."""

    channels: int

    @nn.compact
    def __call__(self, x, logdet, reverse: bool = False):
        bias = self.param("bias", nn.initializers.zeros,
                          (self.channels,), jnp.float32)
        logs = self.param("logs", nn.initializers.zeros,
                          (self.channels,), jnp.float32)
        h, w = x.shape[1], x.shape[2]
        dlogdet = jnp.sum(logs) * h * w
        if not reverse:
            x = (x + bias) * jnp.exp(logs)
            return x, logdet + dlogdet
        x = x * jnp.exp(-logs) - bias
        return x, logdet - dlogdet


def _rot_init(key, shape, dtype=jnp.float32):
    w = jax.random.normal(key, shape, jnp.float32)
    q, _ = jnp.linalg.qr(w)
    return q.astype(dtype)


class InvConv1x1(nn.Module):
    """Invertible 1x1 convolution (ref glow/Permutations.py:9)."""

    channels: int

    @nn.compact
    def __call__(self, x, logdet, reverse: bool = False):
        w = self.param("w", _rot_init, (self.channels, self.channels))
        h, wd = x.shape[1], x.shape[2]
        _, ld = jnp.linalg.slogdet(w.astype(jnp.float32))
        dlogdet = ld * h * wd
        if not reverse:
            y = jnp.einsum("bhwc,cd->bhwd", x, w)
            return y, logdet + dlogdet
        w_inv = jnp.linalg.inv(w.astype(jnp.float32)).astype(x.dtype)
        y = jnp.einsum("bhwc,cd->bhwd", x, w_inv)
        return y, logdet - dlogdet


class _FNet(nn.Module):
    """Coupling net: conv3 -> relu -> conv1 -> relu -> zero-init conv3
    (ref FlowAffineCouplingsAblation.F + glow/flow.py Conv2dZeros)."""

    out_channels: int
    hidden_channels: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden_channels, (3, 3), padding=1,
                    param_dtype=jnp.float32, name="conv0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.hidden_channels, (1, 1),
                    param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    param_dtype=jnp.float32, name="conv_zero")(x)
        logs = self.param("logs", nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)
        return x * jnp.exp(logs * 3.0)


class CondAffine(nn.Module):
    """CondAffineSeparatedAndCond (ref FlowAffineCouplingsAblation.py:9):
    a feature-conditional affine on the full z, then a self-conditional
    affine on half of z given (z_half, features)."""

    channels: int
    hidden_channels: int = 64
    eps: float = 1e-4

    def _scale_shift(self, h):
        shift, scale = jnp.split(h, 2, axis=-1)
        scale = nn.sigmoid(scale + 2.0) + self.eps
        return scale, shift

    @nn.compact
    def __call__(self, x, ft, logdet, reverse: bool = False):
        c = self.channels
        c1 = c // 2
        f_feat = _FNet(2 * c, self.hidden_channels, name="fFeatures")
        f_aff = _FNet(2 * (c - c1), self.hidden_channels, name="fAffine")

        def ld(scale):
            return jnp.sum(jnp.log(scale), axis=(1, 2, 3))

        if not reverse:
            scale_ft, shift_ft = self._scale_shift(f_feat(ft))
            x = (x + shift_ft) * scale_ft
            logdet = logdet + ld(scale_ft)
            z1, z2 = x[..., :c1], x[..., c1:]
            scale, shift = self._scale_shift(
                f_aff(jnp.concatenate([z1, ft], axis=-1)))
            z2 = (z2 + shift) * scale
            logdet = logdet + ld(scale)
            return jnp.concatenate([z1, z2], axis=-1), logdet
        z1, z2 = x[..., :c1], x[..., c1:]
        scale, shift = self._scale_shift(
            f_aff(jnp.concatenate([z1, ft], axis=-1)))
        z2 = z2 / scale - shift
        logdet = logdet - ld(scale)
        x = jnp.concatenate([z1, z2], axis=-1)
        scale_ft, shift_ft = self._scale_shift(f_feat(ft))
        x = x / scale_ft - shift_ft
        logdet = logdet - ld(scale_ft)
        return x, logdet


class FlowStep(nn.Module):
    """ActNorm -> InvConv1x1 -> CondAffine (ref glow/Step.py:15)."""

    channels: int
    hidden_channels: int = 64

    @nn.compact
    def __call__(self, x, ft, logdet, reverse: bool = False):
        an = ActNorm(self.channels, name="actnorm")
        pc = InvConv1x1(self.channels, name="invconv")
        cp = CondAffine(self.channels, self.hidden_channels, name="affine")
        if not reverse:
            x, logdet = an(x, logdet, False)
            x, logdet = pc(x, logdet, False)
            x, logdet = cp(x, ft, logdet, False)
            return x, logdet
        x, logdet = cp(x, ft, logdet, True)
        x, logdet = pc(x, logdet, True)
        x, logdet = an(x, logdet, True)
        return x, logdet


class Split2d(nn.Module):
    """Factor out half the channels with a learned conditional prior
    (ref SRFlow/Split.py:10)."""

    channels: int  # channels BEFORE split

    @nn.compact
    def __call__(self, x, logdet, reverse: bool = False, eps=None,
                 eps_std: float = 1.0, rng: Optional[jax.Array] = None):
        c2 = self.channels // 2
        prior = _FNet(2 * c2, 64, name="prior")
        if not reverse:
            z1, z2 = x[..., :self.channels - c2], x[..., self.channels - c2:]
            h = prior(z1)
            mean, logs = jnp.split(h, 2, axis=-1)
            logdet = logdet + gaussian_logp(z2, mean, logs)
            eps = (z2 - mean) * jnp.exp(-logs)  # normalized latent
            return z1, logdet, eps
        z1 = x
        h = prior(z1)
        mean, logs = jnp.split(h, 2, axis=-1)
        if eps is None:
            assert rng is not None
            eps = jax.random.normal(rng, mean.shape) * eps_std
        z2 = mean + jnp.exp(logs) * eps
        return jnp.concatenate([z1, z2], axis=-1), logdet, None


class RRDBEncoder(nn.Module):
    """LR conditioning encoder: RRDB trunk with block feature taps
    (ref SRFlow/RRDBNet_arch.py:10 with get_steps=True)."""

    in_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    block_idxs: Sequence[int] = (1, 8, 15, 22)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        fea = nn.Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv_first")(x)
        taps = []
        t = fea
        for i in range(self.nb):
            t = ResidualDenseBlock5C(self.nf, self.gc, dtype=self.dtype,
                                     name=f"rdb{i}")(t, train)
            if i in self.block_idxs:
                taps.append(t)
        t = nn.Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="trunk_conv")(t)
        last_lr_fea = fea + t
        return jnp.concatenate([last_lr_fea] + taps, axis=-1)


class SRFlowNet(nn.Module):
    """Flow-based SR net (ref SRFlowNet_arch.py:14).

    Call forms:
      nll training:  net(gt=hr, lr=lr, reverse=False, rng=...)
                       -> (z, nll, logdet)
      sampling:      net(lr=lr, reverse=True, eps_std=tau, rng=...)
                       -> (sr, logdet)
    """

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    scale: int = 4
    K: int = 16
    L: int = 3
    hidden_channels: int = 64
    quant: int = 255
    flow_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    def _levels(self):
        # channels at each level: start 3, x4 per squeeze, minus splits
        chans = []
        c = self.out_nc
        for lv in range(1, self.L + 1):
            c = c * 4
            chans.append(c)
            if lv < self.L:
                c = c - c // 2
        return chans

    @nn.compact
    def __call__(self, gt=None, lr=None, z=None, eps_std: float = 1.0,
                 reverse: bool = False, add_gt_noise: bool = True,
                 rng: Optional[jax.Array] = None, train: bool = True,
                 return_epses: bool = False, epses=None):
        cond_full = RRDBEncoder(self.in_nc, self.nf, self.nb, self.gc,
                                dtype=self.dtype, name="RRDB")(lr, train)
        cond_full = cond_full.astype(jnp.float32)
        chans = self._levels()
        lr_h, lr_w = lr.shape[1], lr.shape[2]
        hr_h, hr_w = lr_h * self.scale, lr_w * self.scale

        # per-level conditional features (resized + projected)
        conds = []
        for lv in range(1, self.L + 1):
            h_lv, w_lv = hr_h // (2 ** lv), hr_w // (2 ** lv)
            ft = cond_full if (h_lv, w_lv) == (lr_h, lr_w) else \
                interpolate(cond_full, size=(h_lv, w_lv), mode="bilinear")
            ft = nn.Conv(self.nf, (1, 1), param_dtype=jnp.float32,
                         name=f"cond_proj{lv}")(ft)
            conds.append(nn.leaky_relu(ft, 0.2))

        steps: List[List[FlowStep]] = []
        splits: List[Optional[Split2d]] = []
        for lv in range(1, self.L + 1):
            c = chans[lv - 1]
            steps.append([FlowStep(c, self.hidden_channels,
                                   name=f"step{lv}_{k}")
                          for k in range(self.K)])
            splits.append(Split2d(c, name=f"split{lv}")
                          if lv < self.L else None)

        pixels = float(hr_h * hr_w * self.out_nc)

        if not reverse:
            assert gt is not None
            x = gt.astype(jnp.float32)
            b = x.shape[0]
            logdet = jnp.zeros((b,), jnp.float32)
            if add_gt_noise:
                if rng is not None:
                    x = x + (jax.random.uniform(rng, x.shape) - 0.5) \
                        / self.quant
                logdet = logdet + float(-math.log(self.quant) * pixels)
            epses = []
            for lv in range(1, self.L + 1):
                x = squeeze2(x)
                for stp in steps[lv - 1]:
                    x, logdet = stp(x, conds[lv - 1], logdet, False)
                if splits[lv - 1] is not None:
                    x, logdet, eps = splits[lv - 1](x, logdet, False)
                    epses.append(eps)
            epses.append(x)
            # split logps are already accumulated into logdet
            objective = logdet + gaussian_logp(x)
            nll = -objective / (LOG2 * pixels)
            if return_epses:
                return epses, nll, logdet
            return x, nll, logdet

        # reverse: sample
        b = lr.shape[0]
        logdet = jnp.zeros((b,), jnp.float32)
        h_top = hr_h // (2 ** self.L)
        w_top = hr_w // (2 ** self.L)
        c_top = chans[-1]
        if epses is not None:
            x = epses[-1]
        elif z is not None:
            x = z
        else:
            assert rng is not None
            rng, r = jax.random.split(rng)
            x = jax.random.normal(r, (b, h_top, w_top, c_top)) * eps_std
        n_split = sum(1 for s_ in splits if s_ is not None)
        eps_i = n_split - 1
        for lv in range(self.L, 0, -1):
            if splits[lv - 1] is not None:
                eps = None
                if epses is not None:
                    eps = epses[eps_i]
                    eps_i -= 1
                if rng is not None:
                    rng, r = jax.random.split(rng)
                else:
                    r = None
                x, logdet, _ = splits[lv - 1](x, logdet, True, eps=eps,
                                              eps_std=eps_std, rng=r)
            for stp in reversed(steps[lv - 1]):
                x, logdet = stp(x, conds[lv - 1], logdet, True)
            x = unsqueeze2(x)
        return x, logdet
