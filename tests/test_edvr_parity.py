"""EDVR .pth output parity (VERDICT r1 missing #3).

The reference EDVR (ref codes/models/modules/architectures/EDVR_arch.py:340)
calls torch.ops.torchvision.deform_conv2d; torchvision isn't installed
here, so the test provides a faithful pure-torch implementation of that
op's documented semantics (interleaved (dy, dx) per (offset-group, tap),
bilinear sampling with zero padding, modulation mask) and patches it in.
A reference-initialized torch EDVR is converted via edvr_to_params and
must match our flax EDVR output with real (non-zero) offsets exercised.

Note: the reference's default 'pixelshuffle' tail double-applies
PixelShuffle and crashes upstream (EDVR_arch.py:449 pixelshuffle_block
already shuffles, then forward :485 shuffles again) — parity uses the
working 'upconv' mode.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/codes"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


def torch_deform_conv2d(x, weight, offset, mask, bias, stride_h, stride_w,
                        pad_h, pad_w, dil_h, dil_w, n_weight_grps,
                        n_offset_grps, use_mask):
    """Pure-torch torchvision.deform_conv2d (modulated, DCNv2).

    offset: (b, 2*G*kh*kw, Ho, Wo), channel layout
    ((g*kh*kw + tap)*2 + {0: dy, 1: dx}); mask: (b, G*kh*kw, Ho, Wo).
    """
    b, c, h, w = x.shape
    c_out, c_in_g, kh, kw = weight.shape
    G = n_offset_grps
    taps = kh * kw
    ho = (h + 2 * pad_h - (dil_h * (kh - 1) + 1)) // stride_h + 1
    wo = (w + 2 * pad_w - (dil_w * (kw - 1) + 1)) // stride_w + 1

    off = offset.view(b, G, taps, 2, ho, wo)
    msk = mask.view(b, G, taps, ho, wo) if use_mask else \
        torch.ones(b, G, taps, ho, wo, dtype=x.dtype)

    ys = torch.arange(ho, dtype=x.dtype) * stride_h - pad_h
    xs = torch.arange(wo, dtype=x.dtype) * stride_w - pad_w
    base_y = ys.view(1, 1, ho, 1)
    base_x = xs.view(1, 1, 1, wo)

    x_g = x.view(b, G, c // G, h, w)
    cols = []
    for t in range(taps):
        ky, kx = divmod(t, kw)
        py = base_y + ky * dil_h + off[:, :, t, 0]   # (b, G, ho, wo)
        px = base_x + kx * dil_w + off[:, :, t, 1]
        y0 = torch.floor(py)
        x0 = torch.floor(px)
        wy = (py - y0).unsqueeze(2)
        wx = (px - x0).unsqueeze(2)

        def gather(yy, xx):
            ok = ((yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1))
            yi = yy.clamp(0, h - 1).long()
            xi = xx.clamp(0, w - 1).long()
            idx = (yi * w + xi).view(b, G, 1, -1).expand(-1, -1, c // G, -1)
            v = torch.gather(x_g.reshape(b, G, c // G, h * w), 3, idx)
            v = v.view(b, G, c // G, ho, wo)
            return v * ok.unsqueeze(2).to(v.dtype)

        v00 = gather(y0, x0)
        v01 = gather(y0, x0 + 1)
        v10 = gather(y0 + 1, x0)
        v11 = gather(y0 + 1, x0 + 1)
        v = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
             + v10 * wy * (1 - wx) + v11 * wy * wx)
        v = v * msk[:, :, t].unsqueeze(2).to(v.dtype)
        cols.append(v.reshape(b, c, ho, wo))
    col = torch.stack(cols, dim=2)  # (b, c, taps, ho, wo)

    wg = c_out // n_weight_grps
    cg = c // n_weight_grps
    col = col.view(b, n_weight_grps, cg, taps, ho, wo)
    wmat = weight.view(n_weight_grps, wg, c_in_g, taps)
    out = torch.einsum("bgctyx,goct->bgoyx", col, wmat)
    out = out.reshape(b, c_out, ho, wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def _patch_torchvision():
    from test_esrgan_output_parity import _stub_torchvision_full

    _stub_torchvision_full()
    tv_ops = sys.modules["torchvision.ops"]

    class _StubDeformConv2d(torch.nn.Module):
        pass

    if not hasattr(tv_ops, "DeformConv2d") or not isinstance(
            getattr(tv_ops, "DeformConv2d", None), type):
        tv_ops.DeformConv2d = _StubDeformConv2d
    torch.ops.torchvision.deform_conv2d = torch_deform_conv2d


def test_torch_deform_conv_matches_plain_conv():
    """Sanity: zero offsets + unit mask == plain convolution."""
    torch.manual_seed(0)
    x = torch.randn(1, 8, 10, 10)
    w = torch.randn(6, 8, 3, 3)
    bias = torch.randn(6)
    offset = torch.zeros(1, 2 * 2 * 9, 10, 10)
    mask = torch.ones(1, 2 * 9, 10, 10)
    out = torch_deform_conv2d(x, w, offset, mask, bias, 1, 1, 1, 1, 1, 1,
                              1, 2, True)
    ref = torch.nn.functional.conv2d(x, w, bias, padding=1)
    assert (out - ref).abs().max().item() < 1e-5


def test_flax_dcn_matches_torch_deform_conv():
    """Our modulated_deform_conv2d vs the torch op with REAL random
    offsets and masks (not the zero-offset plain-conv case)."""
    import jax.numpy as jnp

    from trainner_tpu.ops.deform_conv import modulated_deform_conv2d

    torch.manual_seed(1)
    b, h, w, c, G = 2, 8, 8, 16, 4
    x = torch.randn(b, c, h, w)
    weight = torch.randn(c, c, 3, 3) * 0.1
    bias = torch.randn(c) * 0.1
    offset = torch.randn(b, 2 * G * 9, h, w) * 1.5
    mask = torch.sigmoid(torch.randn(b, G * 9, h, w))
    ref = torch_deform_conv2d(x, weight, offset, mask, bias, 1, 1, 1, 1,
                              1, 1, 1, G, True)

    ours = modulated_deform_conv2d(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(offset.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(mask.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(weight.numpy().transpose(2, 3, 1, 0)),
        jnp.asarray(bias.numpy()), kernel_size=(3, 3),
        deformable_groups=G)
    err = np.abs(np.asarray(ours).transpose(0, 3, 1, 2)
                 - ref.numpy()).max()
    assert err < 1e-4, err


def test_edvr_output_matches_reference_torch():
    import jax.numpy as jnp

    from trainner_tpu.models.edvr import EDVR
    from trainner_tpu.utils.torch_interop import edvr_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _patch_torchvision()
    import models.modules.architectures.EDVR_arch as ref_arch

    torch.manual_seed(3)
    net = ref_arch.EDVR(num_in_ch=3, num_out_ch=3, num_feat=16,
                        num_frame=5, deformable_groups=4,
                        num_extract_block=2, num_reconstruct_block=2,
                        center_frame_idx=2, with_tsa=True,
                        upsample_mode="upconv", upscale=4).eval()
    # make conv_offset nets produce real offsets (they init to zero)
    with torch.no_grad():
        for name, mod in net.named_modules():
            if name.endswith("conv_offset"):
                mod.weight.normal_(0, 0.05)
                mod.bias.normal_(0, 0.2)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}

    x = np.random.default_rng(7).random((1, 5, 3, 16, 16), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    variables = edvr_to_params(sd)
    flax_net = EDVR(num_in_ch=3, num_out_ch=3, num_feat=16, num_frame=5,
                    deformable_groups=4, num_extract_block=2,
                    num_reconstruct_block=2, center_frame_idx=2,
                    with_tsa=True, upsample_mode="upconv", upscale=4,
                    dtype=jnp.float32)
    ours = np.asarray(flax_net.apply(
        variables, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
        train=False)).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_out).max()
    assert err < 1e-3, err
