"""Build the from-scratch quality-parity corpus (zero-egress environment).

No DIV2K/Set5/Set14 exists in this image, so the trained-from-scratch
quality gate is a CONTROLLED A/B instead: identical data, identical model
(SRResNet x4), identical schedule — this framework vs the reference torch
framework — compared on a held-out val set (see scripts/quality_ab_*.py).

Corpus sources (all real, shipped inside installed packages / in-tree):
  * natural photos: reference OST_013.png, augmennt cat.jpg, sklearn
    china/flower, matplotlib grace_hopper, pygame camera shots
  * texture volume: labmaze wall/floor/sky art (1024x1024), high-frequency
    detail that SR training feeds on

Two protocols:
  v1 (round 3): SPATIAL split — left 75% of each photo trains, right 25%
     yields val tiles. Pixel-disjoint but image-correlated: a long
     schedule can overfit the corpus statistics (round-3 10k torch run
     saturated at 34.9 dB).
  v2 (round 4, default): IMAGE-disjoint split — whole images are held
     out for val (flower, grace_hopper + 6 texture files); train never
     sees any pixels from a val image, so long schedules measure
     generalization, not memorization.

Val LR is generated ONCE here with the reference's own resizer
(ref codes/dataops/imresize.py) so both frameworks score against the
identical oracle pairs.
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
# v2 additions (train-side volume) and the held-out val images
V2_EXTRA_TRAIN = {
    "cat": "/root/reference/codes/dataops/augmennt/cat.jpg",
    "cam_bg": f"{SITE}/pygame/docs/generated/_images/camera_background.jpg",
    "freedom": f"{SITE}/pygame/docs/generated/_images/intro_freedom.jpg",
}
V2_VAL_IMAGES = ("flower", "hopper")
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


def _tiles(img: np.ndarray, name: str) -> list:
    out = []
    for yi in range(img.shape[0] // VAL_CROP):
        for xi in range(img.shape[1] // VAL_CROP):
            out.append((f"{name}_{yi}{xi}",
                        img[yi * VAL_CROP:(yi + 1) * VAL_CROP,
                            xi * VAL_CROP:(xi + 1) * VAL_CROP]))
    return out


def _write(root: str, val_hr: list, n_train: int) -> str:
    imresize = _ref_imresize()
    for name, tile in val_hr:
        cv2.imwrite(os.path.join(root, "val_hr", f"{name}.png"), tile)
        lr = imresize(tile.astype(np.float32) / 255.0, 1.0 / SCALE,
                      antialiasing=True)
        lr8 = np.clip(np.round(np.asarray(lr) * 255.0), 0, 255)
        cv2.imwrite(os.path.join(root, "val_lr", f"{name}.png"),
                    lr8.astype(np.uint8))
    with open(os.path.join(root, ".done"), "w") as f:
        f.write(f"val_tiles={len(val_hr)}\n")
    print(f"corpus at {root}: {n_train} train imgs, "
          f"{len(val_hr)} val tiles")
    return root


def build_v1(root: str = "/tmp/qa_corpus", n_textures: int = 48,
             texture_val: int = 6) -> str:
    """Round-3 protocol (spatial split) — kept for provenance of the
    committed 3k curves in docs/qa_curves/."""
    if os.path.exists(os.path.join(root, ".done")):
        return root
    for sub in ("train_hr", "val_hr", "val_lr"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    val_hr = []
    for name, path in NATURAL.items():
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        assert img is not None, path
        h, w = img.shape[:2]
        split = int(w * 0.75) // SCALE * SCALE
        train = _mod(img[:, :split], SCALE)
        cv2.imwrite(os.path.join(root, "train_hr", f"{name}.png"), train)
        val_hr.extend(_tiles(_mod(img[:, split:], SCALE), name))

    textures = sorted(glob.glob(f"{SITE}/labmaze/assets/*/*.png"))
    rng = np.random.default_rng(0)
    picked = list(rng.permutation(len(textures))[:n_textures + texture_val])
    for j, idx in enumerate(picked):
        img = cv2.imread(textures[idx], cv2.IMREAD_COLOR)
        if img is None:
            continue
        if j < texture_val:
            val_hr.append((f"tex{j}", img[:VAL_CROP, :VAL_CROP]))
            rest = _mod(img[VAL_CROP:], SCALE)  # keep rows below val tile
            cv2.imwrite(os.path.join(root, "train_hr", f"tex{j}.png"), rest)
        else:
            cv2.imwrite(os.path.join(root, "train_hr", f"tex{j}.png"),
                        _mod(img, SCALE))

    n = len(os.listdir(os.path.join(root, "train_hr")))
    return _write(root, val_hr, n)


def build_v2(root: str = "/tmp/qa_corpus_v2", n_textures: int = 48,
             texture_val: int = 6) -> str:
    """Round-4 protocol: IMAGE-disjoint val. flower + grace_hopper and
    6 whole texture files are val-only; train never sees their pixels."""
    if os.path.exists(os.path.join(root, ".done")):
        return root
    for sub in ("train_hr", "val_hr", "val_lr"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    val_hr = []
    sources = dict(NATURAL, **V2_EXTRA_TRAIN)
    for name, path in sources.items():
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        assert img is not None, path
        if name in V2_VAL_IMAGES:
            val_hr.extend(_tiles(_mod(img, SCALE), name))
        else:
            cv2.imwrite(os.path.join(root, "train_hr", f"{name}.png"),
                        _mod(img, SCALE))

    textures = sorted(glob.glob(f"{SITE}/labmaze/assets/*/*.png"))
    rng = np.random.default_rng(0)
    picked = list(rng.permutation(len(textures))[:n_textures + texture_val])
    for j, idx in enumerate(picked):
        img = cv2.imread(textures[idx], cv2.IMREAD_COLOR)
        if img is None:
            continue
        if j < texture_val:
            # whole file held out; one val tile from its center
            h, w = img.shape[:2]
            y = (h - VAL_CROP) // 2
            x = (w - VAL_CROP) // 2
            val_hr.append((f"tex{j}", img[y:y + VAL_CROP, x:x + VAL_CROP]))
        else:
            cv2.imwrite(os.path.join(root, "train_hr", f"tex{j}.png"),
                        _mod(img, SCALE))

    n = len(os.listdir(os.path.join(root, "train_hr")))
    return _write(root, val_hr, n)


def build(root: str = None, protocol: str = "v2") -> str:
    if protocol == "v1":
        return build_v1(root or "/tmp/qa_corpus")
    return build_v2(root or "/tmp/qa_corpus_v2")


if __name__ == "__main__":
    proto = "v1" if "--v1" in sys.argv else "v2"
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    build(paths[0] if paths else None, protocol=proto)
