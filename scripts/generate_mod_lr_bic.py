"""Generate modcropped HR + MATLAB-bicubic LR (+ bicubic-upscaled LR).

Equivalent of ref codes/scripts/generate_mod_LR_bic.py: prepares
HR_mod / LR_bicx{s} / Bic_x{s} folders from a source image dir using the
MATLAB-parity resizer.

Usage:
  python scripts/generate_mod_lr_bic.py src_dir out_dir --scale 4
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src_dir")
    p.add_argument("out_dir")
    p.add_argument("--scale", type=int, default=4)
    args = p.parse_args()

    from trainner_tpu.data.common import (modcrop, read_img, save_img,
                                          scan_images, tensor2img)
    from trainner_tpu.ops.imresize import imresize_np

    s = args.scale
    hr_dir = os.path.join(args.out_dir, "HR_mod")
    lr_dir = os.path.join(args.out_dir, f"LR_bicx{s}")
    bic_dir = os.path.join(args.out_dir, f"Bic_x{s}")
    for d in (hr_dir, lr_dir, bic_dir):
        os.makedirs(d, exist_ok=True)

    paths = scan_images(args.src_dir)
    for i, path in enumerate(paths):
        name = os.path.basename(path)
        hr = modcrop(read_img(path), s)
        lr = imresize_np(hr, 1.0 / s)
        bic = imresize_np(lr, float(s))
        save_img(tensor2img(hr), os.path.join(hr_dir, name))
        save_img(tensor2img(lr), os.path.join(lr_dir, name))
        save_img(tensor2img(bic), os.path.join(bic_dir, name))
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(paths)}")
    print(f"done: {len(paths)} images -> {args.out_dir}")


if __name__ == "__main__":
    main()
