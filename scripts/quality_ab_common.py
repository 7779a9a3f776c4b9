"""Shared protocol for the from-scratch quality A/B
(scripts/quality_ab_torch.py vs scripts/quality_ab_jax.py).

Both trainers consume byte-identical HR crop sequences (same seeded
sampler), train SRResNet x4 (in3 nf64 nb16, noBN, pixelshuffle — the
reference's published PSNR-table layout, ref docs/pretrained.md:252) with
L1 + Adam(2e-4) + MultiStep[2000,2750] for 3000 iters, and score RGB PSNR
(shave=scale, MATLAB convention, ref codes/utils/metrics.py:110) on the
same held-out tiles. The only variable is the training framework.
"""

from __future__ import annotations

import glob
import json
import os
import time

import cv2
import numpy as np

SCALE = 4
CROP = 128          # HR crop
BATCH = 8
NITER = int(os.environ.get("QA_NITER", 3000))
VAL_FREQ = int(os.environ.get("QA_VAL_FREQ", 250))
# multiplicative decays; override: QA_SCHED="5000:0.5,7500:0.5"
LR_SCHED = {int(k): float(v) for k, v in
            (kv.split(":") for kv in os.environ["QA_SCHED"].split(","))} \
    if os.environ.get("QA_SCHED") else {2000: 0.5, 2750: 0.5}
BASE_LR = 2e-4
# round-4 default: v2 corpus (IMAGE-disjoint val — long schedules
# measure generalization, not memorization); QA_CORPUS overrides
CORPUS = os.environ.get("QA_CORPUS", "/tmp/qa_corpus_v2")


def load_train_images(root: str = CORPUS) -> list:
    imgs = []
    for p in sorted(glob.glob(os.path.join(root, "train_hr", "*.png"))):
        im = cv2.imread(p, cv2.IMREAD_COLOR)  # BGR uint8
        if im.shape[0] >= CROP and im.shape[1] >= CROP:
            imgs.append(im)
    assert imgs, root
    return imgs


def load_val_pairs(root: str = CORPUS) -> list:
    pairs = []
    for hp in sorted(glob.glob(os.path.join(root, "val_hr", "*.png"))):
        lp = os.path.join(root, "val_lr", os.path.basename(hp))
        pairs.append((cv2.imread(lp, cv2.IMREAD_COLOR),
                      cv2.imread(hp, cv2.IMREAD_COLOR)))
    assert pairs, root
    return pairs


def crop_stream(imgs: list, seed: int = 0, skip: int = 0):
    """Deterministic HR-crop batch generator: uniform image pick, uniform
    crop offset, random flip/rot90 (paired augment semantics, ref
    dataops/common.py:410). Yields uint8 (B, CROP, CROP, 3) BGR.

    skip: fast-forward that many batches by replaying ONLY the RNG draw
    sequence (no crops materialized) — exact resume positioning at
    negligible cost (the draws per sample are: image pick, y, x, flip
    coin, rot count; the crop/flip/rot array ops consume no RNG)."""
    rng = np.random.default_rng(seed)
    for _ in range(skip):
        for _ in range(BATCH):
            i = int(rng.integers(len(imgs)))
            rng.integers(imgs[i].shape[0] - CROP + 1)
            rng.integers(imgs[i].shape[1] - CROP + 1)
            rng.random()
            rng.integers(4)
    while True:
        out = np.empty((BATCH, CROP, CROP, 3), np.uint8)
        for b in range(BATCH):
            im = imgs[int(rng.integers(len(imgs)))]
            y = int(rng.integers(im.shape[0] - CROP + 1))
            x = int(rng.integers(im.shape[1] - CROP + 1))
            c = im[y:y + CROP, x:x + CROP]
            if rng.random() < 0.5:
                c = c[:, ::-1]
            k = int(rng.integers(4))
            c = np.rot90(c, k)
            out[b] = c
        yield out


def lr_at(step: int) -> float:
    lr = BASE_LR
    for milestone, mult in LR_SCHED.items():
        if step >= milestone:
            lr *= mult
    return lr


def psnr_rgb(sr: np.ndarray, hr: np.ndarray, shave: int = SCALE) -> float:
    """MATLAB-convention RGB PSNR on uint8-rounded images with border
    shave (ref metrics/calculate_PSNR_SSIM.py:11, utils/metrics.py:110)."""
    a = sr[shave:-shave, shave:-shave].astype(np.float64)
    b = hr[shave:-shave, shave:-shave].astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return 99.0
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def to_uint8(img01: np.ndarray) -> np.ndarray:
    return np.clip(np.round(img01 * 255.0), 0, 255).astype(np.uint8)


def truncate_curve(path: str, max_step: int) -> None:
    """Drop curve rows logged AFTER the checkpoint being resumed from,
    so a crash-between-checkpoint-and-now cannot leave duplicate step
    entries when the rows are re-appended."""
    if not os.path.exists(path):
        return
    kept = []
    for ln in open(path):
        try:
            rec = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if "meta" in rec or rec.get("step", 0) <= max_step:
            kept.append(ln)
    with open(path, "w") as f:
        f.writelines(kept)


class CurveLog:
    def __init__(self, path: str, meta: dict, append: bool = False):
        self.path = path
        self.t0 = time.time()
        with open(path, "a" if append else "w") as f:
            f.write(json.dumps({"meta": meta}) + "\n")

    def log(self, step: int, **kv):
        rec = {"step": step, "t": round(time.time() - self.t0, 1), **kv}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{os.path.basename(self.path)}] {rec}", flush=True)
