"""Build the from-scratch quality-parity corpus (zero-egress environment).

No DIV2K/Set5/Set14 exists in this image, so the trained-from-scratch
quality gate is a CONTROLLED A/B instead: identical data, identical model
(SRResNet x4), identical schedule — this framework vs the reference torch
framework — compared on a held-out val set (see scripts/quality_ab_*.py).

Corpus sources (all real, shipped inside installed packages):
  * natural photos: reference OST_013.png, sklearn china/flower,
    matplotlib grace_hopper, pygame camera_rgb
  * texture volume: labmaze wall/floor/sky art (1024x1024), high-frequency
    detail that SR training feeds on

Split is SPATIAL for the natural photos (left 75% train / right 25% val)
so the val distribution matches train while staying pixel-disjoint.
Val LR is generated ONCE here with the reference's own MATLAB-parity
imresize (ref codes/dataops/imresize.py:381) so both frameworks score
against the identical oracle pairs.
"""

from __future__ import annotations

import glob
import os
import sys

import cv2
import numpy as np

SITE = "/opt/venv/lib/python3.12/site-packages"
NATURAL = {
    "ost013": "/root/reference/data_samples/samples/OST_013.png",
    "china": f"{SITE}/sklearn/datasets/images/china.jpg",
    "flower": f"{SITE}/sklearn/datasets/images/flower.jpg",
    "hopper": f"{SITE}/matplotlib/mpl-data/sample_data/grace_hopper.jpg",
    "cam_rgb": f"{SITE}/pygame/docs/generated/_images/camera_rgb.jpg",
}
SCALE = 4
VAL_CROP = 128  # HR px


def _ref_imresize():
    """The reference's live resizer: `dataops.imresize.resize`
    (ResizeRight-style; the MATLAB `imresize` at :381 is string-disabled
    in the reference source). Our ops/imresize matches it <1e-5
    (tests/test_reference_parity.py::test_resize_parity_all_kernels)."""
    ref = "/root/reference/codes"
    if ref not in sys.path:
        sys.path.append(ref)  # APPEND: reference has top-level clashes
    from dataops.imresize import resize

    def imresize(img, scale, antialiasing=True):
        return resize(img, scale_factors=scale, interpolation="cubic",
                      antialiasing=antialiasing)

    return imresize


def _mod(img: np.ndarray, m: int) -> np.ndarray:
    h, w = img.shape[:2]
    return img[: h - h % m, : w - w % m]


def build(root: str = "/tmp/qa_corpus", n_textures: int = 48,
          texture_val: int = 6) -> str:
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return root
    for sub in ("train_hr", "val_hr", "val_lr"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    imresize = _ref_imresize()

    val_hr = []
    for name, path in NATURAL.items():
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        assert img is not None, path
        h, w = img.shape[:2]
        split = int(w * 0.75) // SCALE * SCALE
        train = _mod(img[:, :split], SCALE)
        cv2.imwrite(os.path.join(root, "train_hr", f"{name}.png"), train)
        strip = _mod(img[:, split:], SCALE)
        # non-overlapping VAL_CROP tiles from the val strip
        for yi in range(strip.shape[0] // VAL_CROP):
            for xi in range(strip.shape[1] // VAL_CROP):
                tile = strip[yi * VAL_CROP:(yi + 1) * VAL_CROP,
                             xi * VAL_CROP:(xi + 1) * VAL_CROP]
                val_hr.append((f"{name}_{yi}{xi}", tile))

    textures = sorted(glob.glob(f"{SITE}/labmaze/assets/*/*.png"))
    rng = np.random.default_rng(0)
    picked = list(rng.permutation(len(textures))[:n_textures + texture_val])
    for j, idx in enumerate(picked):
        img = cv2.imread(textures[idx], cv2.IMREAD_COLOR)
        if img is None:
            continue
        if j < texture_val:
            c = img[:VAL_CROP, :VAL_CROP]
            val_hr.append((f"tex{j}", c))
            rest = _mod(img[VAL_CROP:], SCALE)  # keep rows below val tile
            cv2.imwrite(os.path.join(root, "train_hr", f"tex{j}.png"), rest)
        else:
            cv2.imwrite(os.path.join(root, "train_hr", f"tex{j}.png"),
                        _mod(img, SCALE))

    for name, tile in val_hr:
        cv2.imwrite(os.path.join(root, "val_hr", f"{name}.png"), tile)
        lr = imresize(tile.astype(np.float32) / 255.0, 1.0 / SCALE,
                      antialiasing=True)
        lr8 = np.clip(np.round(np.asarray(lr) * 255.0), 0, 255)
        cv2.imwrite(os.path.join(root, "val_lr", f"{name}.png"),
                    lr8.astype(np.uint8))
    with open(done, "w") as f:
        f.write(f"val_tiles={len(val_hr)}\n")
    print(f"corpus at {root}: {len(os.listdir(os.path.join(root, 'train_hr')))} "
          f"train imgs, {len(val_hr)} val tiles")
    return root


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/qa_corpus")
