"""Video / deinterlacing datasets (host-side IO, numpy HWC float32).

Behavioral equivalents of ref codes/data/Vid_dataset.py:20
(VidTrainsetLoader: random video dir, num_frames window with random
frameskip <= max_frameskip, random temporal reverse, paired crop, OTF
per-frame downscale, Y-channel (SOFVSR) or RGB output, optional
LR_bicubic/HR_center for srcolors), :308 (VidTestsetLoader), and
codes/data/DVD_dataset.py:12 (DVDDataset: interlaced input from two
consecutive frames + top/bottom field targets).

Outputs: LR/HR clips shaped (t, h, w, c) — NHWC per frame, frame axis
leading (the TPU-native layout the VSR trainers consume; the reference's
TCHW/CTHW switch collapses to this single canonical layout).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from ..ops.imresize import imresize_np
from .common import modcrop, read_img, rgb2ycbcr, scan_images


def _list_videos(root: str) -> List[str]:
    return sorted(d for d in os.listdir(root)
                  if os.path.isdir(os.path.join(root, d)))


class VidTrainDataset:
    """Training clips from per-video frame directories
    (ref Vid_dataset.py:20)."""

    def __init__(self, dataset_opt: dict):
        self.opt = dataset_opt
        self.scale = int(dataset_opt.get("scale", 4) or 4)
        self.num_frames = int(dataset_opt.get("num_frames", 3) or 3)
        assert self.num_frames % 2 == 1, "num_frames must be odd"
        self.hr_size = int(dataset_opt.get("crop_size",
                                           dataset_opt.get("HR_size", 128))
                           or 128)
        self.y_only = bool(dataset_opt.get("y_only", False))
        self.random_reverse = bool(dataset_opt.get("random_reverse", False))
        self.max_frameskip = int(dataset_opt.get("max_frameskip", 0) or 0)
        self.srcolors = bool(dataset_opt.get("srcolors", False))
        hr_root = dataset_opt.get("dataroot_HR")
        if not hr_root:
            raise ValueError("VidTrainDataset needs dataroot_HR")
        self.hr_root = hr_root if isinstance(hr_root, str) else hr_root[0]
        self.videos = _list_videos(self.hr_root)
        if not self.videos:
            raise ValueError(f"no video dirs under [{self.hr_root}]")
        self.frames = {v: scan_images(os.path.join(self.hr_root, v))
                       for v in self.videos}
        self.n_samples = int(dataset_opt.get("n_samples", 1000) or 1000)

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng()
        video = self.videos[int(rng.integers(0, len(self.videos)))]
        paths = self.frames[video]
        n = self.num_frames

        frameskip = 1
        if self.max_frameskip > 0:
            mfs = min(self.max_frameskip, max(1, len(paths) // max(n - 1, 1)))
            frameskip = int(rng.integers(1, mfs + 1))
        max_start = len(paths) - 1 - (n - 1) * frameskip
        start = int(rng.integers(0, max(max_start, 0) + 1))
        idxs = [start + i * frameskip for i in range(n)]
        if self.random_reverse and rng.random() < 0.5:
            idxs = idxs[::-1]

        hrs = [modcrop(read_img(paths[i]), self.scale) for i in idxs]
        h, w = hrs[0].shape[:2]
        cs = min(self.hr_size, h, w)
        cs -= cs % self.scale
        y0 = int(rng.integers(0, h - cs + 1))
        x0 = int(rng.integers(0, w - cs + 1))
        hrs = [f[y0:y0 + cs, x0:x0 + cs] for f in hrs]
        if rng.random() < 0.5:  # paired horizontal flip
            hrs = [np.ascontiguousarray(f[:, ::-1]) for f in hrs]

        lrs = [imresize_np(f, 1.0 / self.scale) for f in hrs]
        if self.y_only:
            center = (n - 1) // 2
            lr_bic = imresize_np(lrs[center], self.scale)
            hr_center_rgb = hrs[center]
            hrs = [rgb2ycbcr(f, only_y=True)[..., None] for f in hrs]
            lr_ycc = [rgb2ycbcr(f, only_y=False) for f in lrs]
            lrs = [f[..., :1] for f in lr_ycc]
            out = {"LR": np.stack(lrs).astype(np.float32),
                   "HR": np.stack(hrs).astype(np.float32)}
            if self.srcolors:
                out["LR_bicubic"] = rgb2ycbcr(
                    lr_bic, only_y=False).astype(np.float32)
                out["HR_center"] = hr_center_rgb.astype(np.float32)
            return out
        return {"LR": np.stack(lrs).astype(np.float32),
                "HR": np.stack(hrs).astype(np.float32)}


class VidTestDataset:
    """Sliding-window test clips over one video dir
    (ref Vid_dataset.py:308)."""

    def __init__(self, dataset_opt: dict):
        self.opt = dataset_opt
        self.scale = int(dataset_opt.get("scale", 4) or 4)
        self.num_frames = int(dataset_opt.get("num_frames", 3) or 3)
        self.y_only = bool(dataset_opt.get("y_only", False))
        root = dataset_opt.get("dataroot_LR") or \
            dataset_opt.get("dataroot_HR")
        self.paths = scan_images(root if isinstance(root, str) else root[0])
        self.has_hr = bool(dataset_opt.get("dataroot_HR"))
        self.hr_paths = scan_images(dataset_opt["dataroot_HR"]) \
            if self.has_hr and dataset_opt.get("dataroot_LR") else None

    def __len__(self) -> int:
        return max(0, len(self.paths) - self.num_frames + 1)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        n = self.num_frames
        frames = [read_img(self.paths[index + i]) for i in range(n)]
        frames = [modcrop(f, self.scale) for f in frames]
        if self.hr_paths:
            hrs = [modcrop(read_img(self.hr_paths[index + i]), self.scale)
                   for i in range(n)]
            lrs = frames
        else:
            hrs = frames
            lrs = [imresize_np(f, 1.0 / self.scale) for f in frames]
        if self.y_only:
            hrs = [rgb2ycbcr(f, only_y=True)[..., None] for f in hrs]
            lrs = [rgb2ycbcr(f, only_y=True)[..., None] for f in lrs]
        return {"LR": np.stack(lrs).astype(np.float32),
                "HR": np.stack(hrs).astype(np.float32),
                "LR_path": self.paths[index + (n - 1) // 2]}


def interlace(top_frame: np.ndarray, bottom_frame: np.ndarray
              ) -> np.ndarray:
    """Even rows from the top-field frame, odd rows from the bottom-field
    frame (ref DVD_dataset.py)."""
    out = top_frame.copy()
    out[1::2] = bottom_frame[1::2]
    return out


class DVDDataset:
    """Deinterlacing pairs: interlaced input built from two consecutive
    frames + both full frames as field targets (ref DVD_dataset.py:12)."""

    def __init__(self, dataset_opt: dict):
        self.opt = dataset_opt
        root = dataset_opt.get("dataroot_HR") or \
            dataset_opt.get("dataroot_B")
        if not root:
            raise ValueError("DVDDataset needs dataroot_HR")
        self.paths = scan_images(root if isinstance(root, str) else root[0])
        self.crop = int(dataset_opt.get("crop_size", 128) or 128)
        self.phase = dataset_opt.get("phase", "train")

    def __len__(self) -> int:
        return max(0, len(self.paths) - 1)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(
            None if self.phase == "train" else index)
        a = read_img(self.paths[index])
        b = read_img(self.paths[index + 1])
        h = min(a.shape[0], b.shape[0]) // 2 * 2
        w = min(a.shape[1], b.shape[1])
        a, b = a[:h, :w], b[:h, :w]
        if self.phase == "train":
            cs = min(self.crop, h, w) // 2 * 2
            y0 = int(rng.integers(0, h - cs + 1)) // 2 * 2
            x0 = int(rng.integers(0, w - cs + 1))
            a = a[y0:y0 + cs, x0:x0 + cs]
            b = b[y0:y0 + cs, x0:x0 + cs]
        return {"in": interlace(a, b).astype(np.float32),
                "top": a.astype(np.float32),
                "bottom": b.astype(np.float32),
                "LR_path": self.paths[index]}
