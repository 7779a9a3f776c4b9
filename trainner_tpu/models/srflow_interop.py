"""SRFlow with the reference's EXACT architecture for .pth interop.

A faithful NHWC mirror of ref codes/models/modules/architectures/
SRFlowNet_arch.py:14 and its stack: the SRFlow-variant RRDB encoder with
fea_up pyramid taps (SRFlow/RRDBNet_arch.py:41-101), FlowUpsamplerNet
(SRFlow/FlowUpsamplerNet.py:12 — per level: squeeze, 2 no-coupling
FlowSteps, K conditional FlowSteps, Split2d at level 1), glow primitives
(ActNorm2d ActNorms.py:100, InvertibleConv1x1 Permutations.py:9,
Conv2d/Conv2dZeros flow.py:10/54), CondAffineSeparatedAndCond
(FlowAffineCouplingsAblation.py:9) and Split2d (Split.py:10).

This module exists alongside models/srflow.py (the TPU-first redesign):
use `network_G.flow.interop: true` (or type srflow_interop) to select it
when loading reference SRFlow .pth checkpoints. Converter:
utils/torch_interop.srflow_to_params; output parity gated in
tests/test_srflow_interop.py.

Defaults mirror options/srflow/train_srflow.yml: K=16, L=3, hidden 64,
additionalFlowNoAffine=2, split enable, stackRRDB blocks [1,8,15,22]
concat, fea_up0 true, quant 255.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import interpolate, nearest_up
from .rrdb import RRDB

Dtype = Any
LOG2PI = math.log(2 * math.pi)


def squeeze2d(x: jnp.ndarray) -> jnp.ndarray:
    """torch pixel-unshuffle channel order (c, by, bx)
    (ref block.py:520 space_to_depth), NHWC."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // 2, w // 2, c * 4)


def unsqueeze2d(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, c // 4, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * 2, w * 2, c // 4)


def _split_cross(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """thops.split_feature('cross'): even / odd channels."""
    return t[..., 0::2], t[..., 1::2]


def gaussian_logp(x, mean=None, logs=None):
    if mean is None:
        ll = -0.5 * (x ** 2 + LOG2PI)
    else:
        ll = -0.5 * (logs * 2.0 + ((x - mean) ** 2)
                     / jnp.exp(logs * 2.0) + LOG2PI)
    return jnp.sum(ll, axis=(1, 2, 3))


class ActNormI(nn.Module):
    """ActNorm2d (ref ActNorms.py:100): center then scale forward."""

    features: int

    @nn.compact
    def __call__(self, x, logdet, reverse: bool = False):
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        logs = self.param("logs", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        pixels = x.shape[1] * x.shape[2]
        dld = jnp.sum(logs) * pixels
        if not reverse:
            x = (x + bias) * jnp.exp(logs)
            logdet = logdet + dld
        else:
            x = x * jnp.exp(-logs) - bias
            logdet = logdet - dld
        return x, logdet


class InvConvI(nn.Module):
    """InvertibleConv1x1 (ref Permutations.py:9)."""

    features: int

    @nn.compact
    def __call__(self, x, logdet, reverse: bool = False):
        def rot_init(key, shape, dtype=jnp.float32):
            q = jnp.linalg.qr(jax.random.normal(key, shape, dtype))[0]
            return q

        w = self.param("weight", rot_init,
                       (self.features, self.features), jnp.float32)
        pixels = x.shape[1] * x.shape[2]
        dld = jnp.linalg.slogdet(w)[1] * pixels
        if reverse:
            w = jnp.linalg.inv(w)
            logdet = logdet - dld
        else:
            logdet = logdet + dld
        # torch conv2d weight (O, I, 1, 1): y_o = sum_i w[o, i] x_i
        y = x @ w.T.astype(x.dtype)
        return y, logdet


class GlowConv(nn.Module):
    """Conv2d with post ActNorm, no bias (ref glow/flow.py:10)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=(self.kernel - 1) // 2, use_bias=False,
                    param_dtype=jnp.float32, name="conv")(x)
        y, _ = ActNormI(self.features, name="actnorm")(
            y, jnp.zeros((x.shape[0],), jnp.float32))
        return y


class GlowConvZeros(nn.Module):
    """Zero-init conv with learned logscale (ref glow/flow.py:54):
    out = conv(x) * exp(logs * 3)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=(self.kernel - 1) // 2,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    param_dtype=jnp.float32, name="conv")(x)
        logs = self.param("logs", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return y * jnp.exp(logs * 3.0)


class FNet(nn.Module):
    """The coupling's F network (ref FlowAffineCouplingsAblation.F):
    GlowConv(3x3) - ReLU - GlowConv(1x1) - ReLU - GlowConvZeros(3x3).
    Child names follow the torch Sequential indices 0/2/4."""

    out_features: int
    hidden: int = 64

    @nn.compact
    def __call__(self, x):
        h = nn.relu(GlowConv(self.hidden, 3, name="f0")(x))
        h = nn.relu(GlowConv(self.hidden, 1, name="f2")(h))
        return GlowConvZeros(self.out_features, 3, name="f4")(h)


class CondAffineI(nn.Module):
    """CondAffineSeparatedAndCond (ref FlowAffineCouplingsAblation.py:9)."""

    in_channels: int
    rrdb_channels: int = 320
    hidden: int = 64
    eps: float = 1e-4

    def setup(self):
        cnn = self.in_channels // 2
        cco = self.in_channels - cnn
        self.channels_for_nn = cnn
        self.fAffine = FNet(cco * 2, self.hidden, name="fAffine")
        self.fFeatures = FNet(self.in_channels * 2, self.hidden,
                              name="fFeatures")

    def _scale_shift(self, h):
        shift, scale = _split_cross(h)
        scale = nn.sigmoid(scale + 2.0) + self.eps
        return scale, shift

    def __call__(self, x, ft, logdet, reverse: bool = False):
        cnn = self.channels_for_nn

        def ld(scale):
            return jnp.sum(jnp.log(scale), axis=(1, 2, 3))

        if not reverse:
            scale_ft, shift_ft = self._scale_shift(self.fFeatures(ft))
            x = (x + shift_ft) * scale_ft
            logdet = logdet + ld(scale_ft)
            z1, z2 = x[..., :cnn], x[..., cnn:]
            scale, shift = self._scale_shift(
                self.fAffine(jnp.concatenate([z1, ft], axis=-1)))
            z2 = (z2 + shift) * scale
            logdet = logdet + ld(scale)
            return jnp.concatenate([z1, z2], axis=-1), logdet
        z1, z2 = x[..., :cnn], x[..., cnn:]
        scale, shift = self._scale_shift(
            self.fAffine(jnp.concatenate([z1, ft], axis=-1)))
        z2 = z2 / scale - shift
        x = jnp.concatenate([z1, z2], axis=-1)
        logdet = logdet - ld(scale)
        scale_ft, shift_ft = self._scale_shift(self.fFeatures(ft))
        x = x / scale_ft - shift_ft
        logdet = logdet - ld(scale_ft)
        return x, logdet


class FlowStepI(nn.Module):
    """actnorm -> invconv -> (conditional affine) (ref glow/Step.py:15)."""

    features: int
    coupling: bool = True
    rrdb_channels: int = 320
    hidden: int = 64

    @nn.compact
    def __call__(self, x, ft, logdet, reverse: bool = False):
        actnorm = ActNormI(self.features, name="actnorm")
        invconv = InvConvI(self.features, name="invconv")
        affine = CondAffineI(self.features, self.rrdb_channels,
                             self.hidden, name="affine") \
            if self.coupling else None
        if not reverse:
            x, logdet = actnorm(x, logdet, False)
            x, logdet = invconv(x, logdet, False)
            if affine is not None:
                x, logdet = affine(x, ft, logdet, False)
            return x, logdet
        if affine is not None:
            x, logdet = affine(x, ft, logdet, True)
        x, logdet = invconv(x, logdet, True)
        x, logdet = actnorm(x, logdet, True)
        return x, logdet


class Split2dI(nn.Module):
    """Split2d (ref SRFlow/Split.py:10): consume half via a learned
    conditional prior."""

    num_channels: int
    consume_ratio: float = 0.5
    logs_eps: float = 0.0

    @nn.compact
    def __call__(self, x, logdet, reverse: bool = False,
                 eps: Optional[jnp.ndarray] = None,
                 eps_std: float = 1.0,
                 rng: Optional[jax.Array] = None):
        n_consume = int(round(self.num_channels * self.consume_ratio))
        n_pass = self.num_channels - n_consume
        conv = GlowConvZeros(n_consume * 2, 3, name="conv")

        if not reverse:
            z1, z2 = x[..., :n_pass], x[..., n_pass:]
            mean, logs = _split_cross(conv(z1))
            out_eps = (z2 - mean) / (jnp.exp(logs) + self.logs_eps)
            logdet = logdet + gaussian_logp(z2, mean, logs)
            return z1, logdet, out_eps
        z1 = x
        mean, logs = _split_cross(conv(z1))
        if eps is None:
            eps = eps_std * jax.random.normal(rng, mean.shape, mean.dtype)
        z2 = mean + (jnp.exp(logs) + self.logs_eps) * eps
        z = jnp.concatenate([z1, z2], axis=-1)
        logdet = logdet - gaussian_logp(z2, mean, logs)
        return z, logdet, None


class SRFlowEncoderI(nn.Module):
    """The SRFlow-variant RRDB encoder with fea_up taps
    (ref SRFlow/RRDBNet_arch.py:41-101). Returns the rrdbResults dict
    AFTER stackRRDB concat (ref SRFlowNet_arch.rrdbPreprocessing:107)."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    scale: int = 4
    blocks: Sequence[int] = (1, 8, 15, 22)
    fea_up0: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> Dict[str, jnp.ndarray]:
        conv = lambda f, name: nn.Conv(
            f, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        fea = conv(self.nf, "conv_first")(x)
        block_results = {}
        h = fea
        for i in range(self.nb):
            h = RRDB(self.nf, 3, self.gc, dtype=self.dtype,
                     name=f"RRDB{i}")(h, train)
            if i in self.blocks:
                block_results[i] = h
        trunk = conv(self.nf, "trunk_conv")(h)
        # ref SRFlow/RRDBNet_arch.py:52-55 reassigns `fea` inside the block
        # loop, so the residual skip adds the LAST BLOCK output (not
        # conv_first's output like plain ESRGAN): last_lr_fea = h + trunk.
        last_lr_fea = h + trunk

        fea_up2 = conv(self.nf, "upconv1")(nearest_up(last_lr_fea, 2))
        f2 = lrelu(fea_up2)
        fea_up4 = conv(self.nf, "upconv2")(nearest_up(f2, 2))
        f4 = lrelu(fea_up4)
        out = conv(self.out_nc, "conv_last")(
            lrelu(conv(self.nf, "HRconv")(f4)))

        # ref's self.lrelu is inplace=True, so the dict's fea_up2/fea_up4
        # entries are the POST-activation tensors (RRDBNet_arch.py:58-63)
        results = {"last_lr_fea": last_lr_fea, "fea_up1": last_lr_fea,
                   "fea_up2": f2, "fea_up4": f4, "out": out}
        if self.fea_up0:
            results["fea_up0"] = interpolate(last_lr_fea, scale=0.5,
                                             mode="bilinear")
        # stackRRDB concat: every conditional key gets the 4 tapped block
        # features nearest-resized and concatenated (64 -> 320 channels)
        if self.blocks:
            concat = jnp.concatenate(
                [block_results[i] for i in self.blocks], axis=-1)
            for k in list(results.keys()):
                if k == "out":
                    continue
                hh, ww = results[k].shape[1], results[k].shape[2]
                c_res = interpolate(concat, size=(hh, ww), mode="nearest")
                results[k] = jnp.concatenate([results[k], c_res], axis=-1)
        return results


class SRFlowNetI(nn.Module):
    """Reference-exact SRFlowNet (scale 4 layout): L levels of
    [squeeze, n_noaffine plain FlowSteps, K conditional FlowSteps,
    Split2d at level 1]. forward(gt, lr) -> (z, nll, logdet);
    reverse via sample()."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    scale: int = 4
    K: int = 16
    L: int = 3
    n_noaffine: int = 2
    hidden: int = 64
    quant: float = 255.0
    blocks: Sequence[int] = (1, 8, 15, 22)
    dtype: Dtype = jnp.float32

    @property
    def level_names(self) -> Dict[int, str]:
        # ref FlowUpsamplerNet levelToName for scale 4
        return {0: "fea_up4", 1: "fea_up2", 2: "fea_up1", 3: "fea_up0",
                4: "fea_up-1"}

    def setup(self):
        self.encoder = SRFlowEncoderI(
            self.in_nc, self.out_nc, self.nf, self.nb, self.gc,
            self.scale, self.blocks, fea_up0=True, dtype=self.dtype)
        n_rrdb = (len(self.blocks) + 1) * self.nf
        layers = []
        c = self.out_nc
        idx = 0
        self._split_layers = {}
        for level in range(1, self.L + 1):
            layers.append(("squeeze", None))
            idx += 1
            c *= 4
            for _ in range(self.n_noaffine):
                layers.append((
                    "step",
                    FlowStepI(c, coupling=False, name=f"layers_{idx}")))
                idx += 1
            for _ in range(self.K):
                layers.append((
                    "step",
                    FlowStepI(c, coupling=True, rrdb_channels=n_rrdb,
                              hidden=self.hidden,
                              name=f"layers_{idx}")))
                idx += 1
            # ref arch_split: split when level < L - 1 (correction 1)
            if level < self.L - 1:
                layers.append((
                    "split", Split2dI(c, name=f"layers_{idx}")))
                idx += 1
                c = c - int(round(c * 0.5))
        self.flow_layers = layers
        self.final_c = c

    def _conditionals(self, lr):
        return self.encoder(lr)

    def _run(self, z, rrdb_results, logdet, reverse: bool,
             eps_std: float = 1.0, rng: Optional[jax.Array] = None,
             eps_list: Optional[List[jnp.ndarray]] = None):
        out_eps: List[jnp.ndarray] = []
        in_eps = list(eps_list) if eps_list else []
        seq = self.flow_layers if not reverse \
            else list(reversed(self.flow_layers))
        level = 0 if not reverse else self.L

        for kind, layer in seq:
            if kind == "squeeze":
                if not reverse:
                    z = squeeze2d(z)
                    level += 1
                else:
                    z = unsqueeze2d(z)
                    level -= 1
                continue
            ft = rrdb_results.get(self.level_names.get(level, "fea_up1"))
            if kind == "step":
                z, logdet = layer(z, ft.astype(z.dtype)
                                  if ft is not None else None,
                                  logdet, reverse)
            else:  # split
                if not reverse:
                    z, logdet, eps = layer(z, logdet, False)
                    out_eps.append(eps)
                else:
                    eps = in_eps.pop() if in_eps else None
                    r = None
                    if eps is None and rng is not None:
                        rng, r = jax.random.split(rng)
                    z, logdet, _ = layer(z, logdet, True, eps=eps,
                                         eps_std=eps_std, rng=r)
        return z, logdet, out_eps

    def __call__(self, gt=None, lr=None, z=None, eps_std: float = 1.0,
                 reverse: bool = False, rng: Optional[jax.Array] = None,
                 train: bool = True):
        """Same call surface as the TPU-redesign SRFlowNet (srflow.py:263):
        explicit `rng` kwarg (noise / sampling), so SRFlowTrainer can drive
        either net interchangeably."""
        if reverse:
            return self.sample(lr, z, eps_std, rng=rng)
        rrdb_results = self._conditionals(lr)
        b = gt.shape[0]
        pixels = gt.shape[1] * gt.shape[2]
        logdet = jnp.zeros((b,), jnp.float32)
        x = gt.astype(jnp.float32)
        if train:
            # quant noise AND its logdet term are tied to add_gt_noise in
            # the reference (SRFlowNet_arch.py:86-91); keeping them
            # together makes eval-mode NLL offset-free vs torch
            if rng is None:
                rng = self.make_rng("noise")
            noise = (jax.random.uniform(rng, x.shape) - 0.5) / self.quant
            x = x + noise
            logdet = logdet + float(-math.log(self.quant) * pixels)
        z, logdet, eps_list = self._run(x, rrdb_results, logdet,
                                        reverse=False)
        objective = logdet + gaussian_logp(z)
        nll = -objective / float(math.log(2.0) * pixels)
        return z, nll, logdet

    def encode_eps(self, gt, lr):
        """Deterministic encode (no quant noise): returns
        (z, logdet, eps_list) for invertibility round trips."""
        rrdb_results = self._conditionals(lr)
        b = gt.shape[0]
        logdet = jnp.zeros((b,), jnp.float32)
        return self._run(gt.astype(jnp.float32), rrdb_results, logdet,
                         reverse=False)

    def sample(self, lr, z=None, eps_std: float = 1.0,
               eps_list: Optional[List[jnp.ndarray]] = None,
               rng: Optional[jax.Array] = None):
        rrdb_results = self._conditionals(lr)
        b, h, w, _ = lr.shape
        fh = h * self.scale // (2 ** self.L)
        fw = w * self.scale // (2 ** self.L)
        if rng is None:
            rng = self.make_rng("sample")
        if z is None:
            rng, r = jax.random.split(rng)
            z = eps_std * jax.random.normal(
                r, (b, fh, fw, self.final_c), jnp.float32)
        logdet = jnp.zeros((b,), jnp.float32)
        sr, logdet, _ = self._run(z, rrdb_results, logdet, reverse=True,
                                  eps_std=eps_std, rng=rng,
                                  eps_list=eps_list)
        return sr, logdet
