"""Final quality-A/B report: load BOTH sides' checkpoints (jax .ckpt
from quality_ab_jax.py, torch .ckpt from quality_ab_torch.py), run the
shared held-out val tiles through each, and print a PSNR/SSIM table
(MATLAB-parity metrics, shave=scale — ref utils/metrics.py:110,204).

Usage: python scripts/quality_ab_report.py \
    [--jax /tmp/qa_jax_10k_v2.jsonl.ckpt ...] \
    [--torch /tmp/qa_torch_10k_v2.jsonl.ckpt] [--json out.json]
Each --jax/--torch may repeat; rows are labeled by filename.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import quality_ab_common as C  # noqa: E402


def _score(sr_fn, val) -> dict:
    from trainner_tpu.utils.metrics import calculate_psnr, calculate_ssim

    ps, ss = [], []
    for lr_img, hr_img in val:
        sr = sr_fn(lr_img.astype(np.float32) / 255.0)
        sr8 = C.to_uint8(sr)
        sh = C.SCALE
        a = sr8[sh:-sh, sh:-sh].astype(np.float64)
        b = hr_img[sh:-sh, sh:-sh].astype(np.float64)
        ps.append(calculate_psnr(a, b))
        ss.append(calculate_ssim(a, b))
    return {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss)),
            "n_tiles": len(val)}


def jax_side(ckpt_path: str, val, f32: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from trainner_tpu.train.sr_trainer import SRTrainer

    dtype = jnp.float32 if f32 else jnp.bfloat16
    opt = {
        "is_train": True, "scale": C.SCALE,
        "network_G": {"type": "sr_resnet", "nf": 64, "nb": 16,
                      "upscale": C.SCALE, "norm_type": None,
                      "act_type": "relu", "mode": "CNA",
                      "upsample_mode": "pixelshuffle"},
        "train": {"lr_G": C.BASE_LR, "pixel_criterion": "l1",
                  "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                  "lr_steps": [100], "niter": 100},
    }
    trainer = SRTrainer(opt, dtype=dtype)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               (1, C.CROP // C.SCALE, C.CROP // C.SCALE,
                                3))
    with open(ckpt_path, "rb") as f:
        blob = f.read()
    step = int.from_bytes(blob[:8], "little")
    state = serialization.from_bytes(state, blob[8:])

    def sr_fn(lr01):
        out = trainer.eval_step(state, jnp.asarray(lr01[None]))
        return np.asarray(out[0], np.float32)

    res = _score(sr_fn, val)
    res["step"] = step
    return res


def torch_side(ckpt_path: str, val) -> dict:
    import torch

    ref = "/root/reference/codes"
    if ref not in sys.path:
        sys.path.append(ref)
    from quality_ab_torch import _stub_torchvision

    _stub_torchvision()
    import models.modules.architectures.SRResNet_arch as ref_arch

    net = ref_arch.SRResNet(3, 3, 64, 16, upscale=C.SCALE,
                            norm_type=None, act_type="relu", mode="CNA",
                            upsample_mode="pixelshuffle")
    ck = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    net.load_state_dict(ck["net"])
    net.eval()

    def sr_fn(lr01):
        with torch.no_grad():
            x = torch.from_numpy(lr01.transpose(2, 0, 1)[None].copy())
            return net(x).numpy()[0].transpose(1, 2, 0)

    res = _score(sr_fn, val)
    res["step"] = int(ck["step"])
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--jax", action="append", default=[])
    ap.add_argument("--torch", dest="torch_", action="append", default=[])
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    val = C.load_val_pairs()

    rows = {}
    for p in args.jax:
        f32 = "f32" in os.path.basename(p)
        rows[os.path.basename(p)] = jax_side(p, val, f32=f32)
    for p in args.torch_:
        rows[os.path.basename(p)] = torch_side(p, val)
    print(f"{'side':44s} {'step':>6s} {'PSNR':>8s} {'SSIM':>8s}")
    for name, r in rows.items():
        print(f"{name:44s} {r['step']:6d} {r['psnr']:8.3f} "
              f"{r['ssim']:8.4f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
