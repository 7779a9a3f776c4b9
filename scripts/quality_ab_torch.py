"""Torch half of the from-scratch quality A/B: trains the REFERENCE's own
SRResNet (ref codes/models/modules/architectures/SRResNet_arch.py:16) with
the reference's init (ref codes/models/networks.py:71 'kaiming') and the
reference's resizer for LR generation, under the shared protocol in
quality_ab_common.py. CPU torch; run in the background (~1-2 s/step on
one core).

Usage: python scripts/quality_ab_torch.py [out.jsonl]

Checkpoints net+optimizer every VAL_FREQ steps next to the log
(<out>.ckpt) and resumes from it automatically: the crop stream is
deterministic, so resume fast-forwards the sampler to the saved step and
the trajectory is identical to an uninterrupted run.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import quality_ab_common as C  # noqa: E402

REF = "/root/reference/codes"


def _stub_torchvision():
    mods = ["torchvision", "torchvision.models", "torchvision.models.vgg",
            "torchvision.models.resnet", "torchvision.utils",
            "torchvision.ops", "torchvision.transforms"]
    for name in mods:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
    if not hasattr(sys.modules["torchvision.utils"], "make_grid"):
        sys.modules["torchvision.utils"].make_grid = lambda *a, **k: None
    if not hasattr(sys.modules["torchvision.ops"], "deform_conv2d"):
        sys.modules["torchvision.ops"].deform_conv2d = lambda *a, **k: None


def main(out_path: str = "/tmp/qa_torch.jsonl") -> None:
    import torch

    torch.set_num_threads(max(1, os.cpu_count()))
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND (reference has top-level clashes)
    _stub_torchvision()
    import models.modules.architectures.SRResNet_arch as ref_arch
    import models.networks as ref_networks
    from dataops.imresize import resize as ref_resize

    torch.manual_seed(0)
    net = ref_arch.SRResNet(3, 3, 64, 16, upscale=C.SCALE, norm_type=None,
                            act_type="relu", mode="CNA",
                            upsample_mode="pixelshuffle")
    # scale=0.1 is the reference's generator default (networks.py:118
    # init_scale = opt_net_pass.pop('init_scale', 0.1)) and matches the
    # jax side's kaiming_init(0.1)
    ref_networks.init_weights(net, init_type="kaiming", scale=0.1)
    # betas: the reference's Adam defaults (models/optimizers.py:96-98
    # beta1 0.9, beta2 0.999), matching the jax side's optax.adam defaults
    opt = torch.optim.Adam(net.parameters(), lr=C.BASE_LR,
                           betas=(0.9, 0.999))
    l1 = torch.nn.L1Loss()

    imgs = C.load_train_images()
    val = C.load_val_pairs()
    stream = C.crop_stream(imgs, seed=0)

    ckpt_path = out_path + ".ckpt"
    start_step = 0
    if os.path.exists(ckpt_path):
        ck = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        net.load_state_dict(ck["net"])
        opt.load_state_dict(ck["opt"])
        start_step = int(ck["step"])
        # exact RNG repositioning without materializing crops
        stream = C.crop_stream(imgs, seed=0, skip=start_step)
        # drop rows logged after the checkpoint (duplicate-step guard)
        C.truncate_curve(out_path, start_step)

    log = C.CurveLog(out_path, {
        "side": "torch-reference", "batch": C.BATCH, "crop": C.CROP,
        "niter": C.NITER, "base_lr": C.BASE_LR, "sched": C.LR_SCHED,
        "resumed_from": start_step}, append=start_step > 0)

    def validate() -> float:
        net.eval()
        ps = []
        with torch.no_grad():
            for lr_img, hr_img in val:
                x = torch.from_numpy(
                    (lr_img.astype(np.float32) / 255.0
                     ).transpose(2, 0, 1)[None])
                sr = net(x).numpy()[0].transpose(1, 2, 0)
                ps.append(C.psnr_rgb(C.to_uint8(sr), hr_img))
        net.train()
        return float(np.mean(ps))

    net.train()
    for step in range(start_step + 1, C.NITER + 1):
        for g in opt.param_groups:
            g["lr"] = C.lr_at(step)
        hr_u8 = next(stream)
        hr = hr_u8.astype(np.float32) / 255.0
        lr = np.stack([np.asarray(ref_resize(h, 1.0 / C.SCALE,
                                             interpolation="cubic",
                                             antialiasing=True))
                       for h in hr]).astype(np.float32)
        x = torch.from_numpy(
            np.ascontiguousarray(lr.transpose(0, 3, 1, 2)))
        y = torch.from_numpy(
            np.ascontiguousarray(hr.transpose(0, 3, 1, 2)))
        opt.zero_grad()
        loss = l1(net(x), y)
        loss.backward()
        opt.step()
        if step % 50 == 0:
            log.log(step, loss=round(float(loss.item()), 5),
                    lr=C.lr_at(step))
        if step % C.VAL_FREQ == 0 or step == C.NITER:
            log.log(step, val_psnr=round(validate(), 4))
            torch.save({"net": net.state_dict(),
                        "opt": opt.state_dict(), "step": step},
                       ckpt_path + ".tmp")
            os.replace(ckpt_path + ".tmp", ckpt_path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/qa_torch.jsonl")
