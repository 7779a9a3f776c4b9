"""Flax building blocks (TPU-native, NHWC, bf16-friendly).

Functional equivalents of ref codes/models/modules/architectures/block.py
(act:82, norm:113, conv_block:214, Upsample:326, pixelshuffle_block:374,
upconv_block:390, DepthToSpace:407, SpaceToDepth:493, GaussianNoise:587),
re-designed for XLA: NHWC layout, static shapes, channel-last
depth_to_space/space_to_depth as reshape+transpose (XLA fuses these), and a
mixed-precision `dtype` policy on every module (params stay f32).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def kaiming_init(scale: float = 1.0, negative_slope: float = 0.0):
    """Kaiming-normal fan-in init with post-scale (ref networks.py:94-96 uses
    kaiming_normal then weight *= 0.1 for SR nets). Implemented as a single
    variance_scaling: var = scale^2 * 2/((1+a^2) * fan_in)."""
    gain = 2.0 / (1.0 + negative_slope**2)
    return nn.initializers.variance_scaling(
        scale * scale * gain, "fan_in", "normal")


default_sr_init = functools.partial(kaiming_init, 0.1)


# ---------------------------------------------------------------------------
# activations / norms (string registries like ref block.py:82,113)
# ---------------------------------------------------------------------------


def act(act_type: Optional[str], neg_slope: float = 0.2) -> Callable:
    """String -> activation callable (ref block.py:82).

    'prelu' returns a real learned-slope nn.PReLU module — all in-tree call
    sites are inside @nn.compact bodies, where inline submodule construction
    is legal. Plain-function contexts should use 'lrelu' explicitly.
    """
    if not act_type:
        return lambda x: x
    act_type = act_type.lower()
    if act_type == "prelu":
        return nn.PReLU(negative_slope_init=0.25)
    table = {
        "relu": nn.relu,
        "leakyrelu": lambda x: nn.leaky_relu(x, neg_slope),
        "lrelu": lambda x: nn.leaky_relu(x, neg_slope),
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "swish": nn.swish,
        "silu": nn.swish,
        "selu": nn.selu,
        "gelu": nn.gelu,
        "elu": nn.elu,
    }
    if act_type not in table:
        raise NotImplementedError(f"activation [{act_type}] not found")
    return table[act_type]


def finalact(mode: Optional[str]) -> Callable:
    """Output cap (ref RRDBNet_arch.py:48-60): tanh/sigmoid/clamp/scaltanh."""
    if not mode:
        return lambda x: x
    mode = mode.lower()
    if mode == "tanh":
        return jnp.tanh
    if mode == "sigmoid":
        return nn.sigmoid
    if mode in ("clamp", "clip"):
        return lambda x: jnp.clip(x, 0.0, 1.0)
    if mode == "scaltanh":  # 0.5*tanh + 0.5 -> [0,1]
        return lambda x: 0.5 * jnp.tanh(x) + 0.5
    raise NotImplementedError(f"final activation [{mode}] not found")


# ---------------------------------------------------------------------------
# padding
# ---------------------------------------------------------------------------

_PAD_MODES = {"zero": "CONSTANT", "reflect": "REFLECT", "replicate": "EDGE",
              "edge": "EDGE"}


def explicit_pad(x: jnp.ndarray, pad: int, pad_type: str = "zero") -> jnp.ndarray:
    """Spatial padding for NHWC (or NDHWC) tensors."""
    if pad == 0:
        return x
    mode = _PAD_MODES.get(pad_type, "CONSTANT")
    spatial = x.ndim - 2
    cfg = [(0, 0)] + [(pad, pad)] * spatial + [(0, 0)]
    return jnp.pad(x, cfg, mode=mode.lower() if mode != "CONSTANT" else "constant")


# ---------------------------------------------------------------------------
# pixel (un)shuffle — NHWC reshape/transpose, XLA-fusible
# ---------------------------------------------------------------------------


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC depth_to_space matching torch.pixel_shuffle channel ordering
    (C_out, r, r) so ported .pth weights reproduce identical outputs.
    (ref block.py:407 DepthToSpace)"""
    b, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c_out
    return x.reshape(b, h * r, w * r, c_out)


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of depth_to_space (torch.pixel_unshuffle ordering).
    (ref block.py:493 SpaceToDepth, used by the unshuffle wrapper)"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h/r, w/r, c, r, r
    return x.reshape(b, h // r, w // r, c * r * r)


# ---------------------------------------------------------------------------
# resize helpers (nearest/bilinear) for upsample blocks
# ---------------------------------------------------------------------------


def interpolate(x: jnp.ndarray, scale: Union[int, float] = None,
                size: Tuple[int, int] = None, mode: str = "nearest") -> jnp.ndarray:
    """torch.nn.functional.interpolate semantics (NHWC).

    nearest: src = floor(i * in/out) (torch's asymmetric convention — NOT
    jax.image's half-pixel rounding). bilinear/bicubic: half-pixel
    (align_corners=False), NO antialiasing on downscale (torch default;
    jax.image.resize antialiases by default, which diverges)."""
    b, h, w, c = x.shape
    if size is None:
        size = (int(round(h * scale)), int(round(w * scale)))
    if mode == "nearest":
        # integer factors reduce to repeat / strided-slice (same indices
        # as the general floor(i*in/out) gather, but XLA-optimal)
        if size[0] % h == 0 and size[1] % w == 0 and \
                size[0] // h == size[1] // w and size[0] > h:
            return nearest_up(x, size[0] // h)
        if h % size[0] == 0 and w % size[1] == 0 and size[0] <= h:
            return x[:, :: h // size[0], :: w // size[1]]
        iy = jnp.floor(jnp.arange(size[0]) * (h / size[0])).astype(jnp.int32)
        ix = jnp.floor(jnp.arange(size[1]) * (w / size[1])).astype(jnp.int32)
        return x[:, iy][:, :, ix]
    if mode in ("bilinear", "linear"):
        method = jax.image.ResizeMethod.LINEAR
    elif mode in ("bicubic", "cubic"):
        method = jax.image.ResizeMethod.CUBIC
    else:
        raise NotImplementedError(f"interpolate mode {mode}")
    return jax.image.resize(x, (b, size[0], size[1], c), method=method,
                            antialias=False)


def wire_to_f01(x: jnp.ndarray, znorm: bool = False) -> jnp.ndarray:
    """Device-side normalization of wire batches: uint8 -> [0,1] float32
    (/255), float dtypes pass through as float32. znorm remaps to [-1,1]
    for uint8 wires (float wires are assumed already normalized by the
    dataset)."""
    if x.dtype == jnp.uint8:
        y = x.astype(jnp.float32) * (1.0 / 255.0)
        return y * 2.0 - 1.0 if znorm else y
    return x.astype(jnp.float32)


def nearest_up(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Exact nearest 2x/3x/... upsample as repeat (cheaper + exact vs resize)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, r, w, r, c))
    return x.reshape(b, h * r, w * r, c)


# ---------------------------------------------------------------------------
# core conv block
# ---------------------------------------------------------------------------


class ConvBlock(nn.Module):
    """conv(+norm)(+act) in CNA / NAC / CNAC layouts (ref block.py:214).

    NHWC; `spectral_norm` wraps the conv with power-iteration SN (uses the
    'batch_stats' collection); `norm_type` batch|instance|layer|none.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    pad_type: str = "zero"
    norm_type: Optional[str] = None
    act_type: Optional[str] = "relu"
    mode: str = "CNA"
    spectral_norm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32
    conv_dims: int = 2  # 2 = Conv2D, 3 = Conv3D
    convtype: str = "Conv2D"  # Conv2D | PartialConv2D (ref block.py:214)

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.mode in ("CNA", "NAC", "CNAC")
        pad = (self.kernel_size - 1) // 2 * self.dilation
        ks = (self.kernel_size,) * self.conv_dims
        partial = self.convtype.lower() == "partialconv2d"

        def make_conv():
            if partial:
                from .partial_conv import PartialConv
                # partial conv owns its (zero) padding: the mask must be
                # padded with invalid zeros alongside x
                return PartialConv(
                    self.features, self.kernel_size, self.stride,
                    self.dilation, use_bias=self.use_bias, pad=pad,
                    kernel_init=self.kernel_init, dtype=self.dtype)
            conv = nn.Conv(
                self.features, ks, strides=(self.stride,) * self.conv_dims,
                padding="VALID", kernel_dilation=(self.dilation,) * self.conv_dims,
                feature_group_count=self.groups, use_bias=self.use_bias,
                kernel_init=self.kernel_init, dtype=self.dtype,
                param_dtype=jnp.float32)
            if self.spectral_norm:
                conv = nn.SpectralNorm(conv)
            return conv

        def make_norm(n_features):
            if not self.norm_type:
                return None
            nt = self.norm_type.lower()
            if nt == "batch":
                return nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, param_dtype=jnp.float32)
            if nt == "instance":
                return nn.GroupNorm(num_groups=n_features, epsilon=1e-5,
                                    use_bias=False,
                                    use_scale=False, dtype=self.dtype)
            if nt == "layer":
                return nn.LayerNorm(dtype=self.dtype)
            raise NotImplementedError(f"norm [{self.norm_type}] not found")

        a = act(self.act_type)
        if self.mode in ("CNA", "CNAC"):
            if not partial:
                x = explicit_pad(x, pad, self.pad_type)
            conv = make_conv()
            x = conv(x, update_stats=train) if self.spectral_norm else conv(x)
            norm = make_norm(self.features)
            if norm is not None:
                x = norm(x)
            if self.act_type and self.mode == "CNA":
                x = a(x)
            elif self.act_type and self.mode == "CNAC":  # CNAC: act w/o norm
                x = a(x)
            return x
        # NAC: norm -> act -> pad -> conv
        norm = make_norm(x.shape[-1])
        if norm is not None:
            x = norm(x)
        if self.act_type:
            x = a(x)
        if not partial:
            x = explicit_pad(x, pad, self.pad_type)
        conv = make_conv()
        return conv(x, update_stats=train) if self.spectral_norm else conv(x)


class GaussianNoise(nn.Module):
    """Train-time additive gaussian noise on the latent (ref block.py:587;
    ESRGAN+ uses sigma=0.1 relative)."""

    sigma: float = 0.1
    is_relative_detach: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        if not train or self.sigma == 0:
            return x
        rng = self.make_rng("noise")
        scale = self.sigma * jax.lax.stop_gradient(x) if self.is_relative_detach \
            else self.sigma * x
        # rebase the key onto the TPU's hardware RNG (rbg): threefry
        # normals for 23 RDB latents cost ~6 ms/step on the nb=23 bench
        # (round-3 trace); the noise is a regularizer, not a reproducible
        # stream, so the cheaper generator is statistically equivalent.
        # Default ON; TRAINNER_RBG_NOISE=0 restores the threefry path
        # (bit-reproduces the earlier-round traced graphs).
        import os

        kd = jax.random.key_data(rng)
        # rbg keys are 4 uint32 words; rebasing assumes a 2-word
        # threefry source key. Under jax_default_prng_impl=rbg (or any
        # wide-key impl) make_rng already hands us cheap keys — skip.
        if (os.environ.get("TRAINNER_RBG_NOISE", "1") != "0"
                and kd.shape[-1] == 2):
            rng = jax.random.wrap_key_data(
                jnp.concatenate([kd, kd]).astype(jnp.uint32), impl="rbg")
        return x + scale * jax.random.normal(rng, x.shape, x.dtype)


class PixelShuffleBlock(nn.Module):
    """conv(C -> C*r^2) + depth_to_space + (norm) + act (ref block.py:374)."""

    features: int
    upscale: int = 2
    kernel_size: int = 3
    act_type: Optional[str] = "relu"
    norm_type: Optional[str] = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        r = self.upscale
        x = ConvBlock(self.features * r * r, self.kernel_size, act_type=None,
                      norm_type=None, kernel_init=self.kernel_init,
                      dtype=self.dtype)(x, train)
        x = depth_to_space(x, r)
        if self.norm_type:
            x = ConvBlock(self.features, 1, act_type=None,
                          norm_type=self.norm_type, dtype=self.dtype)(x, train)
        return act(self.act_type)(x)


class _UpconvP(nn.Module):
    """Param shim for UpconvBlock's LR-space fast path: declares the
    same ConvBlock_0/Conv_0/{kernel,bias} leaves (names, shapes, init)
    as the naive nearest+ConvBlock path, so checkpoints and .pth
    interop are layout-identical across both paths."""

    features: int
    in_features: int
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        class _P(nn.Module):
            features: int
            in_features: int
            kernel_init: Callable

            @nn.compact
            def __call__(self):
                k = self.param("kernel", self.kernel_init,
                               (3, 3, self.in_features, self.features),
                               jnp.float32)
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                return k, b

        return _P(self.features, self.in_features, self.kernel_init,
                  name="Conv_0")()


class UpconvBlock(nn.Module):
    """nearest-upsample + conv + act (ref block.py:390, ESRGAN upsampler).

    For the (nearest, 2x, 3x3) configuration the naive order materializes
    the 4x-size upsampled tensor and runs the conv at HR resolution with
    only `features`(=64) output lanes. The fast path computes the EXACT
    same function in LR space: nearest-up followed by a 3x3 SAME conv is
    algebraically a 3x3 LR conv whose per-output-phase kernels are sums
    of the original taps (floor((a+u)/2) row mapping), emitting 4x wider
    channels, then depth_to_space. Same FLOPs, MXU-wide output, no HR
    intermediate (saves writing+reading the upsampled tensor). Measured
    on v5e (r5 infer trace): the 512-px 64->64 conv + its broadcast cost
    10.8 + 2.7 ms/step at b=16; the LR form replaces both.
    Measured neutral on step time (189.1 vs 189.3 ms/step trace total —
    the depth_to_space transposes eat the conv gain) but it removes the
    4x-size pre-conv intermediates, so big-image single-pass inference
    fits larger tiles per chip. Applied at eval only: the train graph
    stays byte-identical to round 4 (compile-cache stability through
    the remote relay). TRAINNER_UPCONV_LR=0 disables; =1 forces it in
    train too (bit-identical in exact arithmetic; bf16 rounding differs
    in the last ulp)."""

    features: int
    upscale: int = 2
    kernel_size: int = 3
    act_type: Optional[str] = "relu"
    mode: str = "nearest"
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        import os

        knob = os.environ.get("TRAINNER_UPCONV_LR", "")
        fast = (self.mode == "nearest" and self.upscale == 2
                and self.kernel_size == 3 and knob != "0"
                and (not train or knob == "1"))
        if fast:
            w, b = _UpconvP(self.features, x.shape[-1],
                            self.kernel_init, name="ConvBlock_0")()
            # phase row-maps: out HR row 2i+a reads LR rows
            # floor((a+u)/2), u in {-1,0,1} relative taps
            m0 = jnp.asarray([[1., 0., 0.], [0., 1., 1.], [0., 0., 0.]],
                             w.dtype)
            m1 = jnp.asarray([[0., 0., 0.], [1., 1., 0.], [0., 0., 1.]],
                             w.dtype)
            ms = (m0, m1)
            wp = jnp.stack(
                [jnp.einsum("ru,sv,uvio->rsio", ms[a], ms[bb], w)
                 for a in (0, 1) for bb in (0, 1)], axis=-1)
            cin, f = w.shape[2], w.shape[3]
            # (3,3,cin,f,4) -> (3,3,cin,4f): channel f*4 + a*2 + b matches
            # depth_to_space's (c_out, r, r) ordering
            wp = wp.reshape(3, 3, cin, 4 * f)
            dt = self.dtype
            xp = jnp.pad(x.astype(dt), [(0, 0), (1, 1), (1, 1), (0, 0)])
            y = jax.lax.conv_general_dilated(
                xp, wp.astype(dt), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt)
            y = y + jnp.repeat(b, 4).astype(dt)
            return act(self.act_type)(depth_to_space(y, 2))
        if self.mode == "nearest" and float(self.upscale).is_integer():
            x = nearest_up(x, int(self.upscale))
        else:
            x = interpolate(x, scale=self.upscale, mode=self.mode)
        return ConvBlock(self.features, self.kernel_size,
                         act_type=self.act_type, kernel_init=self.kernel_init,
                         dtype=self.dtype)(x, train)


class SelfAttentionBlock(nn.Module):
    """SAGAN-style self-attention over spatial positions
    (ref block.py:647 SelfAttentionBlock). Query/key at C/8, learned gamma."""

    max_pool: bool = False
    poolsize: int = 4
    spectral_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, w, c = x.shape
        inp = x
        if self.max_pool:
            x = nn.max_pool(x, (self.poolsize,) * 2, strides=(self.poolsize,) * 2)
            h, w = x.shape[1], x.shape[2]

        def conv1x1(feats, name):
            # bias on: the reference's f/g/h are default-bias Conv1d
            # (ref ASRResNet_arch.py:81-83, block.py:682-691)
            conv = nn.Conv(feats, (1, 1), dtype=self.dtype, name=name)
            if self.spectral_norm:
                conv = nn.SpectralNorm(conv)
                return lambda y: conv(y, update_stats=train)
            return conv

        f = conv1x1(c // 8, "f")(x).reshape(b, h * w, -1)
        g = conv1x1(c // 8, "g")(x).reshape(b, h * w, -1)
        v = conv1x1(c, "h")(x).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", f, g,
                       preferred_element_type=jnp.float32), axis=-1)
        o = jnp.einsum("bij,bjc->bic", attn.astype(x.dtype), v)
        o = o.reshape(b, h, w, c)
        if self.max_pool:
            o = interpolate(o, size=(inp.shape[1], inp.shape[2]),
                            mode="bilinear")
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return inp + gamma.astype(x.dtype) * o


class MinibatchStdConcat(nn.Module):
    """Minibatch std-dev feature map concat (ref block.py:607)."""

    averaging: str = "all"

    @nn.compact
    def __call__(self, x):
        # std across batch per-pixel-channel, averaged to a single map
        s = jnp.std(x, axis=0, keepdims=True)
        if self.averaging == "all":
            s = jnp.mean(s, keepdims=True)
            s = jnp.broadcast_to(s, (x.shape[0], x.shape[1], x.shape[2], 1))
        else:
            s = jnp.broadcast_to(jnp.mean(s, axis=-1, keepdims=True),
                                 (x.shape[0], x.shape[1], x.shape[2], 1))
        return jnp.concatenate([x, s.astype(x.dtype)], axis=-1)


class TorchDeconv(nn.Module):
    """ConvTranspose2d with torch's exact semantics (stride s, padding p,
    output_padding op): dilate-by-s + pad (k-1-p, k-1-p+op) + correlate
    with the spatially-flipped kernel. flax's nn.ConvTranspose places its
    SAME padding differently, which breaks .pth weight interop — this
    module is verified output-exact against torch (test_esrgan_output_
    parity.py). Kernel stored (kh, kw, in, out) like the transposed torch
    layout."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_c = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, in_c, self.features), jnp.float32)
        kf = kernel[::-1, ::-1].astype(self.dtype)
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kf, (1, 1),
            padding=((pad, pad + self.output_padding),) * 2,
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def _separable_resize(x: jnp.ndarray, size, weight_fn) -> jnp.ndarray:
    """Resize via two static 1-D gather-matmul weight matrices (one per
    spatial axis) built by `weight_fn(n_out, n_in)` — XLA folds the
    constant matrices onto the MXU. Shared engine for the torch-exact
    resize conventions below."""
    oh, ow = size
    wh = weight_fn(oh, x.shape[1]).astype(x.dtype)
    ww = weight_fn(ow, x.shape[2]).astype(x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bhwc->bhpc", ww, y)


def _resolve_size(x, scale, size):
    if size is None:
        size = (int(round(x.shape[1] * scale)),
                int(round(x.shape[2] * scale)))
    return size


def _linear_weights(pos: jnp.ndarray, n_out: int,
                    n_in: int) -> jnp.ndarray:
    """2-tap linear weight matrix from precomputed source positions."""
    pos = jnp.clip(pos, 0.0, n_in - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.clip(lo + 1, 0, n_in - 1)
    frac = pos - lo.astype(jnp.float32)
    rows = jnp.arange(n_out)
    wm = jnp.zeros((n_out, n_in), jnp.float32)
    wm = wm.at[rows, lo].add(1.0 - frac)
    wm = wm.at[rows, hi].add(frac)
    return wm


def bilinear_align_corners(x: jnp.ndarray, scale: float = None,
                           size: Tuple[int, int] = None) -> jnp.ndarray:
    """Bilinear resize with torch's align_corners=True convention
    (corner pixels map to corner pixels; jax.image only offers the
    half-pixel convention). Used where the reference explicitly passes
    align_corners=True (e.g. PAN's ILR skip, ref PAN_arch.py:223)."""
    size = _resolve_size(x, scale, size)

    def weights(n_out, n_in):
        if n_out == 1 or n_in == 1:
            return jnp.ones((n_out, n_in), jnp.float32) / n_in
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) \
            / (n_out - 1)
        return _linear_weights(pos, n_out, n_in)

    return _separable_resize(x, size, weights)


def bilinear_torch(x: jnp.ndarray, scale: float = None,
                   size: Tuple[int, int] = None) -> jnp.ndarray:
    """Bilinear resize matching torch F.interpolate(mode='bilinear',
    align_corners=False) exactly (half-pixel coords, edge clamping, no
    antialiasing) — jax.image.resize differs at the borders."""
    size = _resolve_size(x, scale, size)

    def weights(n_out, n_in):
        pos = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) \
            * (n_in / n_out) - 0.5
        return _linear_weights(pos, n_out, n_in)

    return _separable_resize(x, size, weights)


def bicubic_torch(x: jnp.ndarray, scale: float = None,
                  size: Tuple[int, int] = None) -> jnp.ndarray:
    """Bicubic resize matching torch F.interpolate(mode='bicubic',
    align_corners=False): half-pixel coords, cubic-convolution kernel
    with a = -0.75 (jax.image's CUBIC uses a = -0.5), edge clamping."""
    size = _resolve_size(x, scale, size)
    a = -0.75

    def cubic(t):
        at = jnp.abs(t)
        w1 = ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0
        w2 = (((at - 5.0) * at + 8.0) * at - 4.0) * a
        return jnp.where(at <= 1.0, w1,
                         jnp.where(at < 2.0, w2, 0.0))

    def weights(n_out, n_in):
        pos = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) \
            * (n_in / n_out) - 0.5
        base = jnp.floor(pos).astype(jnp.int32)
        wm = jnp.zeros((n_out, n_in), jnp.float32)
        rows = jnp.arange(n_out)
        for k in range(-1, 3):
            idx = jnp.clip(base + k, 0, n_in - 1)
            wm = wm.at[rows, idx].add(
                cubic(pos - (base + k).astype(jnp.float32)))
        return wm

    return _separable_resize(x, size, weights)
