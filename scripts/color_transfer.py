"""Image color-statistics transfer.

Equivalent of ref codes/scripts/color_transfer.py (statistical color
transfer between a source image and a target reference). Implements the
main algorithms the reference exposes: 'lab' (Reinhard mean/std in Lab),
'mean_std' (RGB mean/std), 'pdf' (iterative marginal PDF/histogram
transfer), 'sot' (approximated by the pdf method with more rotations).

Usage:
  python scripts/color_transfer.py source.png target.png out.png \
      [--algo lab|mean_std|pdf]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_RGB2LMS = np.array([[0.3811, 0.5783, 0.0402],
                     [0.1967, 0.7244, 0.0782],
                     [0.0241, 0.1288, 0.8444]], np.float64)
_LMS2LAB_A = np.diag([1 / np.sqrt(3), 1 / np.sqrt(6), 1 / np.sqrt(2)])
_LMS2LAB_B = np.array([[1, 1, 1], [1, 1, -2], [1, -1, 0]], np.float64)


def _rgb_to_lab(img):
    lms = np.clip(img.reshape(-1, 3) @ _RGB2LMS.T, 1e-6, None)
    lms = np.log10(lms)
    return (lms @ (_LMS2LAB_A @ _LMS2LAB_B).T).reshape(img.shape)


def _lab_to_rgb(lab):
    lms = lab.reshape(-1, 3) @ np.linalg.inv(
        (_LMS2LAB_A @ _LMS2LAB_B).T)
    rgb = (10.0 ** lms) @ np.linalg.inv(_RGB2LMS.T)
    return np.clip(rgb.reshape(lab.shape), 0.0, 1.0)


def transfer_mean_std(src, tgt, space="rgb"):
    """Reinhard-style per-channel mean/std matching."""
    if space == "lab":
        s, t = _rgb_to_lab(src), _rgb_to_lab(tgt)
    else:
        s, t = src, tgt
    ms, ss = s.mean((0, 1)), s.std((0, 1)) + 1e-8
    mt, st = t.mean((0, 1)), t.std((0, 1)) + 1e-8
    out = (s - ms) / ss * st + mt
    return _lab_to_rgb(out) if space == "lab" else np.clip(out, 0, 1)


def _match_1d(src, tgt):
    """Exact marginal histogram matching via sorted quantile mapping."""
    order = np.argsort(src)
    ranks = np.empty_like(order)
    ranks[order] = np.arange(len(src))
    tgt_sorted = np.sort(tgt)
    idx = np.minimum((ranks * len(tgt) / len(src)).astype(int),
                     len(tgt) - 1)
    return tgt_sorted[idx]


def transfer_pdf(src, tgt, n_iter=10, seed=0):
    """Iterative distribution transfer: match marginals along random
    orthonormal bases (Pitie et al.)."""
    rng = np.random.default_rng(seed)
    s = src.reshape(-1, 3).astype(np.float64)
    t = tgt.reshape(-1, 3).astype(np.float64)
    for _ in range(n_iter):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        s_r, t_r = s @ q, t @ q
        for c in range(3):
            s_r[:, c] = _match_1d(s_r[:, c], t_r[:, c])
        s = s_r @ q.T
    return np.clip(s.reshape(src.shape), 0.0, 1.0).astype(np.float32)


def color_transfer(src, tgt, algo="lab"):
    if algo == "lab":
        return transfer_mean_std(src, tgt, "lab")
    if algo == "mean_std":
        return transfer_mean_std(src, tgt, "rgb")
    if algo in ("pdf", "sot"):
        return transfer_pdf(src, tgt, n_iter=20 if algo == "sot" else 10)
    raise ValueError(f"unknown algo {algo}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("source")
    p.add_argument("target")
    p.add_argument("out")
    p.add_argument("--algo", default="lab",
                   choices=["lab", "mean_std", "pdf", "sot"])
    args = p.parse_args()
    from trainner_tpu.data.common import read_img, save_img, tensor2img

    src = read_img(args.source)
    tgt = read_img(args.target)
    out = color_transfer(src, tgt, args.algo)
    save_img(tensor2img(out), args.out)
    print(f"{args.algo} transfer -> {args.out}")


if __name__ == "__main__":
    main()
