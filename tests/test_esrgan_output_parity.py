"""End-to-end ESRGAN network parity: the reference's torch RRDBNet
(ref codes/models/modules/architectures/RRDBNet_arch.py:14) with random
weights, exported through our .pth converter, must produce the same
output as our Flax RRDBNet on the same input — the strongest parity
statement available without pretrained weights (none ship in-tree)."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/codes"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


def _stub_torchvision_full():
    mods = {
        "torchvision": {},
        "torchvision.models": {},
        "torchvision.models.vgg": {},
        "torchvision.models.resnet": {},
        "torchvision.utils": {"make_grid": lambda *a, **k: None},
        "torchvision.ops": {"deform_conv2d": lambda *a, **k: None},
        "torchvision.transforms": {},
    }
    for name, attrs in mods.items():
        mod = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            if not hasattr(mod, k):
                setattr(mod, k, v)
        sys.modules[name] = mod
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
    sys.modules["torchvision.models"].vgg = \
        sys.modules["torchvision.models.vgg"]
    sys.modules["torchvision.models"].resnet = \
        sys.modules["torchvision.models.resnet"]


@pytest.mark.parametrize("upscale,upsample_mode",
                         [(4, "upconv"), (2, "pixelshuffle")])
def test_esrgan_output_matches_reference_torch(upscale, upsample_mode):
    import jax.numpy as jnp

    from trainner_tpu.models.rrdb import RRDBNet as FlaxRRDB
    from trainner_tpu.utils.torch_interop import esrgan_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.RRDBNet_arch as ref_arch

    torch.manual_seed(0)
    # note: the reference hardcodes gc=32 inside its RRDB blocks
    net = ref_arch.RRDBNet(in_nc=3, out_nc=3, nf=16, nb=2, upscale=upscale,
                           upsample_mode=upsample_mode).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}

    x = np.random.default_rng(1).random((1, 3, 12, 12), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    params = esrgan_to_params(sd)
    flax_net = FlaxRRDB(nf=16, nb=2, gc=32, upscale=upscale,
                        upsample_mode=upsample_mode, gaussian_noise=False,
                        dtype=jnp.float32)
    ours = flax_net.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    assert ours.shape == ref_out.shape
    err = np.abs(ours - ref_out).max()
    assert err < 1e-4, err


def test_srresnet_output_matches_reference_torch():
    """Published-layout SRResNet (noBN, pixelshuffle) through
    srresnet_to_params reproduces the torch output (the layout of the
    reference's pretrained PSNR-table models, ref docs/pretrained.md)."""
    import jax.numpy as jnp

    from trainner_tpu.models.srresnet import SRResNet as FlaxSRResNet
    from trainner_tpu.utils.torch_interop import srresnet_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.SRResNet_arch as ref_arch

    torch.manual_seed(1)
    net = ref_arch.SRResNet(3, 3, 16, 4, upscale=4, norm_type=None,
                            act_type="relu", mode="CNA",
                            upsample_mode="pixelshuffle").eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(2).random((1, 3, 12, 12), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    params = srresnet_to_params(sd)
    flax_net = FlaxSRResNet(nf=16, nb=4, upscale=4, norm_type=None,
                            act_type="relu", mode="CNA",
                            upsample_mode="pixelshuffle",
                            dtype=jnp.float32)
    ours = flax_net.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_out).max()
    assert err < 1e-4, err


def test_discriminator_vgg_output_matches_reference_torch():
    """Discriminator_VGG_128 .pth (features/classifier Sequential, ref
    discriminators.py:149) through discriminator_vgg_to_params matches
    our DiscriminatorVGG logits — D checkpoints resume too."""
    import jax.numpy as jnp

    from trainner_tpu.models.discriminators import DiscriminatorVGG
    from trainner_tpu.utils.torch_interop import discriminator_vgg_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.discriminators as ref_d

    torch.manual_seed(2)
    # ref Discriminator_VGG_128 hardcodes the classifier for base_nf=64
    net = ref_d.Discriminator_VGG_128(3, 64).eval()
    # randomize BN running stats so the mapping is actually exercised
    for mod in net.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.3, 0.3)
            mod.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}

    x = np.random.default_rng(3).random((2, 3, 128, 128), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    variables = discriminator_vgg_to_params(sd)
    flax_net = DiscriminatorVGG(size=128, base_nf=64, dtype=jnp.float32)
    ours = np.asarray(flax_net.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False))
    err = np.abs(ours - ref_out).max()
    assert err < 2e-4 * max(1.0, np.abs(ref_out).max()), (err, ref_out)


def test_ppon_outputs_match_reference_torch():
    """PPON .pth (CFEM/CRM/SFEM/SRM/PFEM/PRM) through ppon_to_params
    reproduces all three branch outputs (ref PPON_arch.py:18)."""
    import jax.numpy as jnp

    from trainner_tpu.models.ppon import PPON as FlaxPPON
    from trainner_tpu.utils.torch_interop import ppon_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.PPON_arch as ref_arch

    torch.manual_seed(3)
    # ref RRBlock_32 hardcodes 64 channels, so nf must be 64
    net = ref_arch.PPON(3, 64, 2, 3, upscale=4).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(4).random((1, 3, 12, 12), np.float32)
    with torch.no_grad():
        ref_c, ref_s, ref_p = [t.numpy() for t in net(torch.from_numpy(x))]

    params = ppon_to_params(sd)
    flax_net = FlaxPPON(nf=64, nb=2, upscale=4, dtype=jnp.float32)
    outs = flax_net.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
    for ours, ref in zip(outs, (ref_c, ref_s, ref_p)):
        ours = np.asarray(ours).transpose(0, 3, 1, 2)
        err = np.abs(ours - ref).max()
        assert err < 1e-4, err


def test_pan_output_matches_reference_torch():
    """PAN .pth (SCPA trunk + pixel-attention upsample Sequential, ref
    PAN_arch.py:109) through pan_to_params reproduces the torch output."""
    import jax.numpy as jnp

    from trainner_tpu.models.pan import PAN as FlaxPAN
    from trainner_tpu.utils.torch_interop import pan_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.PAN_arch as ref_arch

    torch.manual_seed(4)
    net = ref_arch.PAN(3, 3, 16, 8, 2, scale=4,
                       self_attention=False).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(5).random((1, 3, 12, 12), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    params = pan_to_params(sd)
    flax_net = FlaxPAN(nf=16, unf=8, nb=2, scale=4, dtype=jnp.float32)
    ours = np.asarray(flax_net.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False)).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_out).max()
    assert err < 1e-4, err


def test_sftnet_output_matches_reference_torch():
    """SFT_Net .pth through sftnet_to_params reproduces the torch output
    (ref sft_arch.py:40)."""
    import jax.numpy as jnp

    from trainner_tpu.models.sft import SFTNet
    from trainner_tpu.utils.torch_interop import sftnet_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.sft_arch as ref_arch

    torch.manual_seed(5)
    net = ref_arch.SFT_Net().eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    rng = np.random.default_rng(6)
    x = rng.random((1, 3, 16, 16), np.float32)
    seg = rng.random((1, 8, 64, 64), np.float32)
    with torch.no_grad():
        ref_out = net((torch.from_numpy(x),
                       torch.from_numpy(seg))).numpy()

    params = sftnet_to_params(sd)
    flax_net = SFTNet(dtype=jnp.float32)
    ours = np.asarray(flax_net.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(seg.transpose(0, 2, 3, 1)),
        train=False)).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_out).max()
    assert err < 1e-4, err


def test_resnet_generator_output_matches_reference_torch():
    """CycleGAN ResnetGenerator (instance norm) .pth through
    resnet_g_to_params reproduces the torch output (ref ResNet_arch.py:11)."""
    import jax.numpy as jnp

    from trainner_tpu.models.resnet_g import ResnetGenerator
    from trainner_tpu.utils.torch_interop import resnet_g_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.ResNet_arch as ref_arch

    torch.manual_seed(6)
    net = ref_arch.ResnetGenerator(3, 3, 16, norm_type="instance",
                                   n_blocks=2).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(7).random((1, 3, 32, 32), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    params = resnet_g_to_params(sd)
    flax_net = ResnetGenerator(ngf=16, n_blocks=2, dtype=jnp.float32)
    ours = np.asarray(flax_net.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False)).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_out).max()
    assert err < 1e-4, err


def test_sofvsr_output_matches_reference_torch():
    """SOFVSR .pth (Y-mode, the reference's supported configuration)
    through sofvsr_to_params reproduces SR output and all flow levels
    (ref SOFVSR_arch.py:20)."""
    import jax.numpy as jnp

    from trainner_tpu.models.sofvsr import SOFVSR
    from trainner_tpu.utils.torch_interop import sofvsr_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.SOFVSR_arch as ref_arch

    # the reference OFRnet hardcodes .cuda() (SOFVSR_arch.py:155);
    # neutralize it for the CPU run
    monkey_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.manual_seed(7)
    net = ref_arch.SOFVSR(scale=4, n_frames=3).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(8).random((1, 3, 1, 16, 16), np.float32)
    with torch.no_grad():
        f1, f2, f3, sr_ref = net(torch.from_numpy(x))

    params = sofvsr_to_params(sd)
    flax_net = SOFVSR(scale=4, n_frames=3, channels=320, img_ch=1,
                      dtype=jnp.float32)
    xj = jnp.asarray(x.transpose(0, 1, 3, 4, 2))  # b,t,c,h,w -> b,t,h,w,c
    o1, o2, o3, sr = flax_net.apply({"params": params}, xj)
    err = np.abs(np.asarray(sr).transpose(0, 3, 1, 2)
                 - sr_ref.numpy()).max()
    assert err < 2e-4, err
    # flow level 3 (HR flows), first neighbor
    ours_f3 = np.asarray(o3[0]).transpose(0, 3, 1, 2)
    ref_f3 = (f3[0] if isinstance(f3, (list, tuple)) else f3).numpy()
    ref_f3 = ref_f3.reshape(1, 2, 64, 64)
    assert np.abs(ours_f3 - ref_f3).max() < 2e-4
    torch.Tensor.cuda = monkey_cuda


@pytest.mark.parametrize("mode", ["pt", "tf"])
def test_wbc_unet_output_matches_reference_torch(mode):
    """UnetGeneratorWBC .pth (white-box cartoonization, both the torch
    and the TF-parity upsample modes) through named_to_params reproduces
    the torch output (ref WBCNet_arch.py:24)."""
    import jax.numpy as jnp

    from trainner_tpu.models.wbcunet import UnetGeneratorWBC
    from trainner_tpu.utils.torch_interop import named_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.WBCNet_arch as ref_arch

    torch.manual_seed(8)
    net = ref_arch.UnetGeneratorWBC(nf=32, mode=mode).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(9).random((1, 3, 32, 32), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    params = named_to_params(sd)
    flax_net = UnetGeneratorWBC(nf=32, mode=mode, dtype=jnp.float32)
    ours = np.asarray(flax_net.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False)).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_out).max()
    assert err < 1e-4, err


def test_dvdnet_outputs_match_reference_torch():
    """DVDNet .pth through dvdnet_to_params reproduces both deinterlaced
    fields (ref DVDNet_arch.py:37)."""
    import jax.numpy as jnp

    from trainner_tpu.models.dvd import DVDNet
    from trainner_tpu.utils.torch_interop import dvdnet_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.DVDNet_arch as ref_arch

    torch.manual_seed(9)
    net = ref_arch.DVDNet().eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(10).random((1, 3, 16, 16), np.float32)
    with torch.no_grad():
        ref_y, ref_z = [t.numpy() for t in net(torch.from_numpy(x))]

    params = dvdnet_to_params(sd)
    flax_net = DVDNet(dtype=jnp.float32)
    y, z = flax_net.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)))
    for ours, ref in ((y, ref_y), (z, ref_z)):
        ours = np.asarray(ours).transpose(0, 3, 1, 2)
        err = np.abs(ours - ref).max()
        assert err < 1e-4, err


def test_aan_output_matches_reference_torch():
    """A2N/AAN .pth through aan_to_params reproduces the torch output
    (ref PAN_arch.py:323)."""
    import jax.numpy as jnp

    from trainner_tpu.models.pan import AAN
    from trainner_tpu.utils.torch_interop import aan_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.PAN_arch as ref_arch

    torch.manual_seed(10)
    net = ref_arch.AAN(3, 3, 16, 8, 2, scale=4).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(11).random((1, 3, 12, 12), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    params = aan_to_params(sd)
    flax_net = AAN(nf=16, unf=8, nb=2, scale=4, dtype=jnp.float32)
    ours = np.asarray(flax_net.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False)).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_out).max()
    assert err < 1e-4, err


def test_sr3dnet_output_matches_reference_torch():
    """SR3DNet .pth through named_to_params (tied conv_c) reproduces the
    torch output incl. the a=-0.75 bicubic skip (ref SR3DNet_arch.py:8)."""
    import jax.numpy as jnp

    from trainner_tpu.models.sr3d import SR3DNet
    from trainner_tpu.utils.torch_interop import named_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.SR3DNet_arch as ref_arch

    torch.manual_seed(11)
    net = ref_arch.SR3DNet(nf=8, scale=4, n_frames=5).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(12).random((1, 3, 5, 12, 12), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    # torch Conv3d weights are (O, I, D, H, W) -> flax (D, H, W, I, O)
    sd = {k: (v.transpose(2, 3, 4, 1, 0) if v.ndim == 5 else v)
          for k, v in sd.items()}
    params = {}
    for k, v in sd.items():
        name, leaf = k.split(".")
        params.setdefault(name, {})[
            "kernel" if leaf == "weight" else "bias"] = v

    flax_net = SR3DNet(nf=8, scale=4, n_frames=5, dtype=jnp.float32)
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # b,c,t,h,w -> b,t,h,w,c
    ours = np.asarray(flax_net.apply({"params": params}, xj))
    ours = ours.transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_out).max()
    assert err < 2e-4, err


def test_unet_generator_output_matches_reference_torch():
    """pix2pix UnetGenerator (instance norm) .pth through unet_to_params
    reproduces the torch output (ref UNet_arch.py:11)."""
    import jax.numpy as jnp

    from trainner_tpu.models.unet import UnetGenerator
    from trainner_tpu.utils.torch_interop import unet_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.UNet_arch as ref_arch

    torch.manual_seed(12)
    net = ref_arch.UnetGenerator(3, 3, 5, 64,
                                 norm_type="instance").eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(13).random((1, 3, 32, 32), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    params = unet_to_params(sd)
    flax_net = UnetGenerator(num_downs=5, ngf=64, norm_type="instance",
                             dtype=jnp.float32)
    ours = np.asarray(flax_net.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False)).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_out).max()
    assert err < 1e-4, err


def test_esrgan_psnr_parity_on_real_image():
    """BASELINE acceptance: PSNR of ESRGAN outputs (same weights, real
    image) computed through our pipeline vs the torch reference must
    agree within 0.1 dB (measured: ~0.001 dB, since the outputs agree
    to <1e-4)."""
    import jax.numpy as jnp

    from trainner_tpu.data.common import read_img
    from trainner_tpu.models.rrdb import RRDBNet as FlaxRRDB
    from trainner_tpu.ops.imresize import imresize_np
    from trainner_tpu.utils.metrics import calculate_psnr
    from trainner_tpu.utils.torch_interop import esrgan_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.RRDBNet_arch as ref_arch

    img = read_img("/root/reference/data_samples/samples/OST_013.png")
    hr = img[:96, :96].astype(np.float32)
    lr = imresize_np(hr, 0.25).astype(np.float32)

    torch.manual_seed(13)
    net = ref_arch.RRDBNet(in_nc=3, out_nc=3, nf=16, nb=2,
                           upscale=4).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    with torch.no_grad():
        sr_ref = net(torch.from_numpy(
            lr.transpose(2, 0, 1)[None])).numpy()[0].transpose(1, 2, 0)

    params = esrgan_to_params(sd)
    flax_net = FlaxRRDB(nf=16, nb=2, gc=32, upscale=4,
                        gaussian_noise=False, dtype=jnp.float32)
    sr_ours = np.asarray(flax_net.apply(
        {"params": params}, jnp.asarray(lr[None]), train=False))[0]

    p_ref = calculate_psnr(np.clip(sr_ref[4:-4, 4:-4], 0, 1) * 255,
                           hr[4:-4, 4:-4] * 255)
    p_ours = calculate_psnr(np.clip(sr_ours[4:-4, 4:-4], 0, 1) * 255,
                            hr[4:-4, 4:-4] * 255)
    assert abs(p_ref - p_ours) < 0.1, (p_ref, p_ours)
    assert abs(p_ref - p_ours) < 0.01  # actually ~identical


def test_abpn_output_matches_reference_torch():
    """ABPN_v5 .pth through abpn_to_params reproduces the torch output
    (ref ABPN_arch.py:108; its down10/SA10/weight_down8 are dead)."""
    import jax.numpy as jnp

    from trainner_tpu.models.abpn import ABPN
    from trainner_tpu.utils.torch_interop import abpn_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.ABPN_arch as ref_arch

    torch.manual_seed(14)
    net = ref_arch.ABPN_v5(3, 8).eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(17).random((1, 3, 16, 16), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x), isTest=False).numpy()

    params = abpn_to_params(sd)
    flax_net = ABPN(dim=8, dtype=jnp.float32)
    ours = np.asarray(flax_net.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False)).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_out).max()
    assert err < 2e-4, err


def test_seg_output_matches_reference_torch():
    """OutdoorSceneSeg .pth through seg_to_params reproduces the torch
    segmentation probabilities (ref seg_arch.py:29) — SFTGAN can run
    end-to-end with the published segmentation model."""
    import jax.numpy as jnp

    from trainner_tpu.models.seg import OutdoorSceneSeg
    from trainner_tpu.utils.torch_interop import seg_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.seg_arch as ref_arch

    torch.manual_seed(15)
    net = ref_arch.OutdoorSceneSeg().eval()
    for mod in net.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.6, 1.4)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(18).random((1, 3, 32, 32), np.float32)
    with torch.no_grad():
        # the reference's forward already applies softmax (seg_arch:41)
        ref_prob = net(torch.from_numpy(x)).numpy()

    variables = seg_to_params(sd)
    flax_net = OutdoorSceneSeg(dtype=jnp.float32)
    ours = np.asarray(flax_net.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False)).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_prob).max()
    assert err < 1e-4, err


def test_asrresnet_output_matches_reference_torch():
    """A-SRResNet .pth through asrresnet_to_params (spectral norms
    folded into effective weights) reproduces the torch output
    (ref ASRResNet_arch.py:145)."""
    import jax.numpy as jnp

    from trainner_tpu.models.asrresnet import ASRResNet
    from trainner_tpu.utils.torch_interop import asrresnet_to_params

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision_full()
    import models.modules.architectures.ASRResNet_arch as ref_arch

    torch.manual_seed(16)
    net = ref_arch.ASRResNet()
    # settle spectral-norm power iteration: a fresh net's (u, v) give
    # sigma ~ -0.003, so eval-mode weights blow up ~300x and the whole
    # net runs at 1e14 scale where fp noise swamps any tolerance; 30
    # train-mode forwards converge sigma to the true spectral norm
    net.train()
    with torch.no_grad():
        for _ in range(30):
            net(torch.randn(1, 3, 16, 16))
    net.eval()
    torch.manual_seed(21)
    for mod in net.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.6, 1.4)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    x = np.random.default_rng(19).random((1, 3, 16, 16), np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    variables = asrresnet_to_params(sd)
    flax_net = ASRResNet(spectral_norm=False, dtype=jnp.float32)
    ours = np.asarray(flax_net.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False)).transpose(0, 3, 1, 2)
    err = np.abs(ours - ref_out).max()
    assert err < 2e-4, err
