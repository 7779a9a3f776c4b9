"""Network factory: string registry -> Flax module builders.

Equivalent of ref codes/models/networks.py:107-255 (get_network registry),
define_G:267, define_D:283, define_F:316. Returns linen Modules; parameter
init happens in the trainers (functional, explicit rngs).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from .discriminators import (
    DiscriminatorVGG,
    MultiscaleDiscriminator,
    NLayerDiscriminator,
    PixelDiscriminator,
    UNetDiscriminator,
)
from .rrdb import MRRDBNet, RRDBNet
from .srresnet import SRResNet

# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------


def _build_rrdb(cfg: dict, dtype) -> RRDBNet:
    return RRDBNet(
        in_nc=cfg.get("in_nc", 3), out_nc=cfg.get("out_nc", 3),
        nf=cfg.get("nf", 64), nb=cfg.get("nb", 23), nr=cfg.get("nr", 3),
        gc=cfg.get("gc", 32), upscale=cfg.get("upscale", 4),
        norm_type=cfg.get("norm_type"), act_type=cfg.get("act_type", "leakyrelu"),
        mode=cfg.get("mode", "CNA"),
        upsample_mode=cfg.get("upsample_mode", "upconv"),
        final_act=cfg.get("finalact"),
        gaussian_noise=bool(cfg.get("gaussian_noise", True)),
        plus=bool(cfg.get("plus", False)),
        conv3d=str(cfg.get("convtype", "")).lower() == "conv3d",
        convtype=("PartialConv2D"
                  if str(cfg.get("convtype", "")).lower() == "partialconv2d"
                  else "Conv2D"),
        scan_blocks=bool(cfg.get("scan_blocks", False)),
        dtype=dtype)


def _build_mrrdb(cfg: dict, dtype) -> MRRDBNet:
    return MRRDBNet(in_nc=cfg.get("in_nc", 3), out_nc=cfg.get("out_nc", 3),
                    nf=cfg.get("nf", 64), nb=cfg.get("nb", 23),
                    gc=cfg.get("gc", 32), upscale=cfg.get("upscale", 4),
                    scan_blocks=bool(cfg.get("scan_blocks", False)),
                    dtype=dtype)


def _build_srresnet(cfg: dict, dtype) -> SRResNet:
    return SRResNet(
        in_nc=cfg.get("in_nc", 3), out_nc=cfg.get("out_nc", 3),
        nf=cfg.get("nf", 64), nb=cfg.get("nb", 16),
        upscale=cfg.get("upscale", 4), norm_type=cfg.get("norm_type"),
        act_type=cfg.get("act_type", "relu"), mode=cfg.get("mode", "CNA"),
        res_scale=cfg.get("res_scale", 1),
        upsample_mode=cfg.get("upsample_mode", "pixelshuffle"),
        final_act=cfg.get("finalact"), dtype=dtype)


def _build_ppon(cfg: dict, dtype):
    from .ppon import PPON

    return PPON(in_nc=cfg.get("in_nc", 3), out_nc=cfg.get("out_nc", 3),
                nf=cfg.get("nf", 64), nb=cfg.get("nb", 24),
                upscale=cfg.get("upscale", 4), dtype=dtype)


def _build_pan(cfg: dict, dtype):
    from .pan import PAN

    return PAN(in_nc=cfg.get("in_nc", 3), out_nc=cfg.get("out_nc", 3),
               nf=cfg.get("nf", 40), unf=cfg.get("unf", 24),
               nb=cfg.get("nb", 16), scale=cfg.get("scale", 4),
               self_attention=bool(cfg.get("self_attention", False)),
               double_scpa=bool(cfg.get("double_scpa", False)),
               ups_inter_mode=cfg.get("ups_inter_mode", "nearest"),
               dtype=dtype)


def _build_unet(cfg: dict, dtype):
    from .unet import UnetGenerator

    return UnetGenerator(
        input_nc=cfg.get("input_nc", 3), output_nc=cfg.get("output_nc", 3),
        num_downs=cfg.get("num_downs", 8), ngf=cfg.get("ngf", 64),
        norm_type=cfg.get("norm_type", "batch"),
        use_dropout=bool(cfg.get("use_dropout", False)),
        upsample_mode=cfg.get("upsample_mode", "deconv"), dtype=dtype)


def _build_resnet_g(cfg: dict, dtype):
    from .resnet_g import ResnetGenerator

    return ResnetGenerator(
        input_nc=cfg.get("input_nc", 3), output_nc=cfg.get("output_nc", 3),
        n_blocks=cfg.get("n_blocks", 9), ngf=cfg.get("ngf", 64),
        norm_type=cfg.get("norm_type", "instance"),
        use_dropout=bool(cfg.get("use_dropout", False)),
        upsample_mode=cfg.get("upsample_mode", "deconv"),
        padding_type=cfg.get("padding_type", "reflect"), dtype=dtype)


def _build_wbcunet(cfg: dict, dtype):
    from .wbcunet import UnetGeneratorWBC

    return UnetGeneratorWBC(nf=cfg.get("nf", 32),
                            mode=cfg.get("mode", "pt"), dtype=dtype)


def _build_sofvsr(cfg: dict, dtype):
    from .sofvsr import SOFVSR

    return SOFVSR(n_frames=cfg.get("n_frames", 3),
                  channels=cfg.get("channels", 320),
                  scale=cfg.get("scale", 4), img_ch=cfg.get("img_ch", 3),
                  sr_net=cfg.get("SR_net", "rrdb"),
                  sr_nf=cfg.get("sr_nf", 64), sr_nb=cfg.get("sr_nb", 23),
                  dtype=dtype)


def _build_sr3d(cfg: dict, dtype):
    from .sr3d import SR3DNet

    return SR3DNet(in_nc=cfg.get("in_nc", 3), out_nc=cfg.get("out_nc", 3),
                   nf=cfg.get("nf", 64), nb=cfg.get("nb", 23),
                   scale=cfg.get("scale", 4),
                   n_frames=cfg.get("n_frames", 5), dtype=dtype)


def _build_dvd(cfg: dict, dtype):
    from .dvd import DVDNet

    return DVDNet(in_nc=cfg.get("in_nc", 3), out_nc=cfg.get("out_nc", 3),
                  nf=cfg.get("nf", 64), dtype=dtype)


def _build_srflow(cfg: dict, dtype):
    flow = cfg.get("flow") or {}
    if flow.get("interop") or cfg.get("type") == "srflow_interop":
        return _build_srflow_interop(cfg, dtype)
    from .srflow import SRFlowNet

    return SRFlowNet(in_nc=cfg.get("in_nc", 3), out_nc=cfg.get("out_nc", 3),
                     nf=cfg.get("nf", 64), nb=cfg.get("nb", 23),
                     gc=cfg.get("gc", 32), scale=cfg.get("scale", 4),
                     K=cfg.get("K", 16), L=flow.get("L", 3),
                     hidden_channels=flow.get("hidden_channels", 64),
                     flow_cfg=flow, dtype=dtype)


def _build_srflow_interop(cfg: dict, dtype):
    """Reference-exact SRFlowNet mirror (loads ref SRFlow .pth via
    utils/torch_interop.srflow_to_params). Select with network_G.flow.
    interop: true or type: srflow_interop."""
    from .srflow_interop import SRFlowNetI

    flow = cfg.get("flow") or {}
    stack = flow.get("stackRRDB") or {}
    coupling = flow.get("CondAffineSeparatedAndCond") or {}
    return SRFlowNetI(
        in_nc=cfg.get("in_nc", 3), out_nc=cfg.get("out_nc", 3),
        nf=cfg.get("nf", 64), nb=cfg.get("nb", 23), gc=cfg.get("gc", 32),
        scale=cfg.get("scale", 4), K=cfg.get("K", 16), L=flow.get("L", 3),
        n_noaffine=int(flow.get("additionalFlowNoAffine", 2)),
        hidden=int(coupling.get("hidden_channels",
                                flow.get("hidden_channels", 64)) or 64),
        quant=float(cfg.get("quant", 255.0) or 255.0),
        blocks=tuple(stack.get("blocks", (1, 8, 15, 22))),
        dtype=dtype)


def _build_edvr(cfg: dict, dtype):
    from .edvr import EDVR

    return EDVR(num_in_ch=cfg.get("num_in_ch", 3),
                num_out_ch=cfg.get("num_out_ch", 3),
                num_feat=cfg.get("num_feat", 64),
                num_frame=cfg.get("num_frame", 5),
                upscale=cfg.get("upscale", 4),
                deformable_groups=cfg.get("deformable_groups", 8),
                num_extract_block=cfg.get("num_extract_block", 5),
                num_reconstruct_block=cfg.get("num_reconstruct_block", 10),
                center_frame_idx=cfg.get("center_frame_idx"),
                with_predeblur=bool(cfg.get("with_predeblur", False)),
                with_tsa=bool(cfg.get("with_tsa", True)), dtype=dtype)


def _build_sft(cfg: dict, dtype):
    from .sft import SFTNet

    return SFTNet(dtype=dtype)


def _build_abpn(cfg: dict, dtype):
    from .abpn import ABPN

    return ABPN(input_dim=cfg.get("input_dim", cfg.get("in_nc", 3)),
                dim=cfg.get("dim", cfg.get("nf", 32)), dtype=dtype)


def _build_asr_resnet(cfg: dict, dtype):
    from .asrresnet import ASRResNet

    return ASRResNet(
        scale_factor=cfg.get("scale_factor", cfg.get("scale", 4)),
        spectral_norm=bool(cfg.get("spectral_norm", True)),
        self_attention=bool(cfg.get("self_attention", True)),
        max_pool=bool(cfg.get("max_pool", False)),
        poolsize=cfg.get("poolsize", 4), dtype=dtype)


def _build_asr_cnn(cfg: dict, dtype):
    from .asrresnet import ASRCNN

    return ASRCNN(
        upscale_factor=cfg.get("upscale_factor", cfg.get("scale", 4)),
        spectral_norm=bool(cfg.get("spectral_norm", True)),
        self_attention=bool(cfg.get("self_attention", True)),
        max_pool=bool(cfg.get("max_pool", True)),
        poolsize=cfg.get("poolsize", 4),
        finalact=cfg.get("finalact"), dtype=dtype)


def _build_rife(cfg: dict, dtype):
    from .rife import RIFE

    return RIFE(c=cfg.get("c", 16), dtype=dtype)


def _build_seg(cfg: dict, dtype):
    from .seg import OutdoorSceneSeg

    return OutdoorSceneSeg(n_classes=cfg.get("n_classes", 8), dtype=dtype)


def _build_a2n(cfg: dict, dtype):
    from .pan import AAN

    return AAN(in_nc=cfg.get("in_nc", 3), out_nc=cfg.get("out_nc", 3),
               nf=cfg.get("nf", 40), unf=cfg.get("unf", 24),
               nb=cfg.get("nb", 16), scale=cfg.get("scale", 4),
               dtype=dtype)


_G_REGISTRY: Dict[str, Callable] = {
    "rrdb_net": _build_rrdb,
    "a2n_net": _build_a2n,
    "mrrdb_net": _build_mrrdb,
    "sr_resnet": _build_srresnet,
    "ppon": _build_ppon,
    "pan_net": _build_pan,
    "unet_net": _build_unet,
    "resnet_net": _build_resnet_g,
    "wbcunet_net": _build_wbcunet,
    "sofvsr_net": _build_sofvsr,
    "sr3d_net": _build_sr3d,
    "dvd_net": _build_dvd,
    "srflow_net": _build_srflow,
    "srflow_interop": _build_srflow_interop,
    "edvr_net": _build_edvr,
    "sft_arch": _build_sft,
    "abpn_net": _build_abpn,
    "asr_resnet": _build_asr_resnet,
    "asr_cnn": _build_asr_cnn,
    "rife_net": _build_rife,
    "seg_arch": _build_seg,
}


def define_G(opt: dict, dtype=jnp.bfloat16):
    """Build the generator module from parsed options (ref networks.py:267)."""
    cfg = dict(opt["network_G"])
    kind = cfg.get("type")
    if kind not in _G_REGISTRY:
        raise NotImplementedError(f"Generator model [{kind}] not recognized")
    return _G_REGISTRY[kind](cfg, dtype)


# ---------------------------------------------------------------------------
# discriminators
# ---------------------------------------------------------------------------


def define_D(opt: dict, dtype=jnp.bfloat16):
    """Build the discriminator module (ref networks.py:283)."""
    cfg = dict(opt["network_D"])
    kind = (cfg.get("type") or "").lower()
    if kind.startswith("discriminator_vgg"):
        # fixed-size variants carry the size in the name
        size = cfg.get("size")
        for tok in ("96", "128", "192", "256"):
            if tok in kind:
                size = int(tok)
        sn = kind.endswith("_sn") or bool(cfg.get("spectral_norm"))
        return DiscriminatorVGG(
            size=int(size), in_nc=cfg.get("in_nc", 3),
            base_nf=cfg.get("base_nf", 64),
            norm_type=None if sn else cfg.get("norm_type", "batch"),
            act_type=cfg.get("act_type", "leakyrelu"),
            mode=cfg.get("mode", "CNA"), arch=cfg.get("arch", "ESRGAN"),
            spectral_norm=sn, dtype=dtype)
    if kind in ("patchgan", "nlayerdiscriminator"):
        return NLayerDiscriminator(
            ndf=cfg.get("ndf", 64), n_layers=cfg.get("n_layers", 3),
            norm_type=cfg.get("norm_type", "batch"),
            patch=bool(cfg.get("patch", True)),
            use_spectral_norm=bool(cfg.get("use_spectral_norm", False)),
            dtype=dtype)
    if kind == "multiscale":
        return MultiscaleDiscriminator(
            ndf=cfg.get("ndf", 64), n_layers=cfg.get("n_layers", 3),
            norm_type=cfg.get("norm_type", "batch"),
            num_D=cfg.get("num_D", 3), dtype=dtype)
    if kind in ("pixelgan", "pixeldiscriminator"):
        return PixelDiscriminator(ndf=cfg.get("ndf", 64),
                                  norm_type=cfg.get("norm_type", "batch"),
                                  dtype=dtype)
    if kind == "unet":
        return UNetDiscriminator(
            nf=cfg.get("nf", 64),
            skip_connection=bool(cfg.get("skip_connection", True)),
            spectral_norm=bool(cfg.get("spectral_norm", True)), dtype=dtype)
    raise NotImplementedError(f"Discriminator model [{kind}] not recognized")
