"""Offline MATLAB-parity PSNR/SSIM evaluation over result folders.

Equivalent of ref metrics/calculate_PSNR_SSIM.py:11-40 (and its .m twin):
compare a folder of SR results against a GT folder, RGB and Y-channel,
with `crop_border = scale` shave.

Usage:
  python scripts/calculate_psnr_ssim.py GT_dir SR_dir --scale 4
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("gt_dir")
    p.add_argument("sr_dir")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--y_only", action="store_true")
    args = p.parse_args()

    from trainner_tpu.data.common import read_img, scan_images
    from trainner_tpu.utils.metrics import MetricsDict

    gt_paths = scan_images(args.gt_dir)
    sr_by_name = {os.path.splitext(os.path.basename(p))[0]: p
                  for p in scan_images(args.sr_dir)}
    rgb = MetricsDict("psnr,ssim")
    ych = MetricsDict("psnr,ssim")
    n = 0
    for gp in gt_paths:
        name = os.path.splitext(os.path.basename(gp))[0]
        sp = sr_by_name.get(name) or sr_by_name.get(name + "_rlt")
        if sp is None:
            continue
        gt = read_img(gp)
        sr = read_img(sp)
        h = min(gt.shape[0], sr.shape[0])
        w = min(gt.shape[1], sr.shape[1])
        gt, sr = gt[:h, :w], sr[:h, :w]
        r = rgb.calculate_metrics(sr, gt, crop_size=args.scale)
        y = ych.calculate_metrics(sr, gt, crop_size=args.scale,
                                  only_y=True)
        n += 1
        print(f"{n:4d} {name:30s} PSNR: {r['psnr']:.4f} dB  "
              f"SSIM: {r['ssim']:.6f}  PSNR_Y: {y['psnr']:.4f} dB  "
              f"SSIM_Y: {y['ssim']:.6f}")
    for tag, m in (("RGB", rgb), ("Y", ych)):
        avg = {a["name"]: a["average"] for a in m.get_averages()}
        if avg:
            print(f"Average {tag}: PSNR: {avg['psnr']:.4f} dB, "
                  f"SSIM: {avg['ssim']:.6f}")


if __name__ == "__main__":
    main()
