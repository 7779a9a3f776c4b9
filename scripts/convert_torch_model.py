"""Convert reference PyTorch checkpoints to TPU-native .ckpt / .npz.

Covers (one tool instead of the reference's scattered converters):
  * ESRGAN/RRDB generators, both key layouts
    (ref codes/models/networks.py mod2normal/normal2mod:401-481)
    -> flax RRDBNet param .ckpt
  * torchvision VGG feature weights -> npz for the perceptual loss
    (trainner_tpu/models/perceptual.py load_vgg_npz)
  * LPIPS linear-calibration weights (the files the reference bundles at
    codes/models/modules/LPIPS/lpips_weights/) -> npz lin vectors
  * the reverse direction: our .ckpt -> reference-layout .pth
    (swa/ema-averaged params export — the swa2normal.py equivalent)

Usage:
  python scripts/convert_torch_model.py esrgan  in.pth out.ckpt
  python scripts/convert_torch_model.py vgg     vgg19.pth out.npz
  python scripts/convert_torch_model.py lpips   squeeze.pth out.npz
  python scripts/convert_torch_model.py export  in.ckpt out.pth --nb 23
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def convert_esrgan(src: str, dst: str) -> None:
    from trainner_tpu.utils.checkpoint import save_params
    from trainner_tpu.utils.torch_interop import (esrgan_to_params,
                                                  load_state_dict)

    sd = load_state_dict(src)
    params = esrgan_to_params(sd)
    save_params(params, dst, backup=False)
    print(f"ESRGAN params -> {dst}")


def convert_srresnet(src: str, dst: str) -> None:
    from trainner_tpu.utils.checkpoint import save_params
    from trainner_tpu.utils.torch_interop import (load_state_dict,
                                                  srresnet_to_params)

    sd = load_state_dict(src)
    params = srresnet_to_params(sd)
    save_params(params, dst, backup=False)
    print(f"SRResNet params -> {dst}")


def convert_discriminator(src: str, dst: str) -> None:
    from trainner_tpu.utils.checkpoint import save_params
    from trainner_tpu.utils.torch_interop import (
        discriminator_vgg_to_params, load_state_dict)

    sd = load_state_dict(src)
    variables = discriminator_vgg_to_params(sd)
    save_params(variables, dst, backup=False)
    print(f"Discriminator variables (params+batch_stats) -> {dst}")


def convert_ppon(src: str, dst: str) -> None:
    from trainner_tpu.utils.checkpoint import save_params
    from trainner_tpu.utils.torch_interop import (load_state_dict,
                                                  ppon_to_params)

    sd = load_state_dict(src)
    params = ppon_to_params(sd)
    save_params(params, dst, backup=False)
    print(f"PPON params -> {dst}")


def convert_sofvsr(src: str, dst: str) -> None:
    from trainner_tpu.utils.checkpoint import save_params
    from trainner_tpu.utils.torch_interop import (load_state_dict,
                                                  sofvsr_to_params)

    sd = load_state_dict(src)
    params = sofvsr_to_params(sd)
    save_params(params, dst, backup=False)
    print(f"SOFVSR params -> {dst}")


def convert_vgg(src: str, dst: str) -> None:
    """torchvision vgg .pth ('features.N.weight') -> conv{b}_{c} npz."""
    from trainner_tpu.losses.lpips import LPIPS  # noqa: F401 (env check)
    from trainner_tpu.models.perceptual import VGG_CFGS
    from trainner_tpu.utils.torch_interop import (conv_to_hwio,
                                                  load_state_dict)

    sd = load_state_dict(src)
    n_convs = sorted(int(k.split(".")[1]) for k in sd
                     if k.startswith("features.") and k.endswith(".weight")
                     and sd[k].ndim == 4)
    arch = {8: "vgg11", 10: "vgg13", 13: "vgg16", 16: "vgg19"}[
        len(n_convs)]
    out = {}
    it = iter(n_convs)
    for b, reps in enumerate(VGG_CFGS[arch], start=1):
        for c in range(1, reps + 1):
            idx = next(it)
            out[f"conv{b}_{c}/kernel"] = conv_to_hwio(
                sd[f"features.{idx}.weight"])
            out[f"conv{b}_{c}/bias"] = sd[f"features.{idx}.bias"]
    np.savez(dst, **out)
    print(f"{arch} features -> {dst}")


def convert_lpips(src: str, dst: str) -> None:
    from trainner_tpu.utils.torch_interop import load_state_dict

    sd = load_state_dict(src)
    out = {}
    for k, v in sd.items():
        if ".model.1.weight" in k or (k.startswith("lin")
                                      and k.endswith("weight")):
            i = k.split(".")[0].replace("lin", "")
            out[f"lin{i}"] = v.reshape(-1)
    np.savez(dst, **out)
    print(f"LPIPS lin weights ({len(out)} layers) -> {dst}")


# torchvision state-dict conv prefixes -> our flax layer names, per backbone
_LPIPS_BACKBONE_MAPS = {
    "squeeze": [("features.0", "conv1")] + [
        (f"features.{idx}.{part}", f"fire{n}_{tag}")
        for n, idx in enumerate((3, 4, 6, 7, 9, 10, 11, 12), start=1)
        for part, tag in (("squeeze", "s"), ("expand1x1", "e1"),
                          ("expand3x3", "e3"))],
    "alex": [(f"features.{idx}", f"conv{n}")
             for n, idx in enumerate((0, 3, 6, 8, 10), start=1)],
    "vgg": [(f"features.{idx}", f"conv{b}_{c}")
            for (b, c), idx in zip(
                [(b, c) for b, reps in enumerate((2, 2, 3, 3, 3), start=1)
                 for c in range(1, reps + 1)],
                (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28))],
}


def convert_lpips_full(src: str, dst: str, net: str,
                       lin_src: str = None) -> None:
    """torchvision backbone .pth (squeezenet1_1 | alexnet | vgg16 state
    dict) -> full LPIPS npz ('net/<layer>/kernel|bias' HWIO). Lin vectors
    come from --lin (a reference lpips_weights .pth) when given, else the
    bundled in-repo calibrated set is merged at load time."""
    from trainner_tpu.utils.torch_interop import (conv_to_hwio,
                                                  load_state_dict)

    sd = load_state_dict(src)
    out = {}
    for prefix, name in _LPIPS_BACKBONE_MAPS[net]:
        out[f"net/{name}/kernel"] = conv_to_hwio(sd[f"{prefix}.weight"])
        out[f"net/{name}/bias"] = np.asarray(sd[f"{prefix}.bias"])
    if lin_src:
        lin_sd = load_state_dict(lin_src)
        for k, v in lin_sd.items():
            if ".model.1.weight" in k or (k.startswith("lin")
                                          and k.endswith("weight")):
                i = k.split(".")[0].replace("lin", "")
                out[f"lin{i}"] = np.asarray(v).reshape(-1)
    np.savez(dst, **out)
    print(f"LPIPS {net} backbone ({len(out)} arrays) -> {dst}")


def export_esrgan(src: str, dst: str, nb: int) -> None:
    import torch

    from trainner_tpu.utils.checkpoint import load_params
    from trainner_tpu.utils.torch_interop import params_to_esrgan

    params = load_params(src)
    sd = params_to_esrgan(params, nb=nb)
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in sd.items()}, dst)
    print(f"exported reference-layout state_dict -> {dst}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["esrgan", "srresnet", "discriminator",
                                    "ppon", "pan", "resnet_g", "sftnet",
                                    "sofvsr", "unet", "aan", "dvd",
                                    "wbcunet", "abpn", "seg", "srflow",
                                    "edvr", "vgg",
                                    "lpips", "lpips-full", "export"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--nb", type=int, default=23)
    p.add_argument("--net", choices=["squeeze", "alex", "vgg"],
                   default="squeeze", help="lpips-full backbone kind")
    p.add_argument("--lin", default=None,
                   help="lpips-full: reference lin-weights .pth to embed")
    args = p.parse_args()
    if args.kind == "esrgan":
        convert_esrgan(args.src, args.dst)
    elif args.kind == "srresnet":
        convert_srresnet(args.src, args.dst)
    elif args.kind == "discriminator":
        convert_discriminator(args.src, args.dst)
    elif args.kind == "ppon":
        convert_ppon(args.src, args.dst)
    elif args.kind in ("pan", "resnet_g", "sftnet", "sofvsr", "unet",
                       "aan", "dvd", "wbcunet", "abpn", "seg", "srflow",
                       "edvr"):
        from trainner_tpu.utils import torch_interop as ti
        from trainner_tpu.utils.checkpoint import save_params
        from trainner_tpu.utils.torch_interop import load_state_dict

        fn = {"pan": ti.pan_to_params, "resnet_g": ti.resnet_g_to_params,
              "sftnet": ti.sftnet_to_params,
              "sofvsr": ti.sofvsr_to_params,
              "unet": ti.unet_to_params, "aan": ti.aan_to_params,
              "dvd": ti.dvdnet_to_params,
              "wbcunet": ti.named_to_params,
              "abpn": ti.abpn_to_params,
              "seg": ti.seg_to_params,
              "srflow": ti.srflow_to_params,
              "edvr": ti.edvr_to_params}[args.kind]
        save_params(fn(load_state_dict(args.src)), args.dst, backup=False)
        print(f"{args.kind} params -> {args.dst}")
    elif args.kind == "vgg":
        convert_vgg(args.src, args.dst)
    elif args.kind == "lpips":
        convert_lpips(args.src, args.dst)
    elif args.kind == "lpips-full":
        convert_lpips_full(args.src, args.dst, args.net, lin_src=args.lin)
    else:
        export_esrgan(args.src, args.dst, args.nb)


if __name__ == "__main__":
    main()
