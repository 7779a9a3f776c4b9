"""Datasets: host-side sample producers (paths -> numpy HWC float32 RGB).

Behavioral equivalents of ref codes/data/: aligned_dataset.py:12
(AlignedDataset with pair validation, LR auto-generation, paired geometric
transform, OTF degradations), single_dataset.py:7 (inference-only),
unaligned_dataset.py:8 (CycleGAN A/B), and base_dataset.py path resolution
(read_dataroots:134, get_dataroots_paths:233).

TPU-first split of responsibilities: datasets here do IO + crop/flip only
(cheap, per-sample, CPU); the heavy degradation pipeline runs BATCHED
ON-DEVICE (data/degradations.py) inside the input step — the north-star
redesign of ref dataops/augmentations.py aug_pipeline:1666. A host-side
exact pipeline (data/host_degradations.py) remains for parity testing and
for ops that resist batching.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..ops.imresize import imresize_np
from .common import (
    augment_pair,
    channel_convert,
    img2tensor,
    modcrop,
    paired_random_crop,
    read_img,
    scan_images,
)


def _dataroot(dataset_opt: dict, *keys: str) -> Optional[str]:
    for k in keys:
        v = dataset_opt.get(k)
        if v:
            return v if isinstance(v, str) else v[0]
    return None


class AlignedDataset:
    """Paired LR/HR dataset (ref aligned_dataset.py:12).

    If no LR root is given (or a pair is missing), LR is generated on the
    fly by MATLAB-parity downscale (ref paired_imgs_check/generate_A_fn,
    augmentations.py:1237).
    """

    def __init__(self, dataset_opt: dict):
        self.opt = dataset_opt
        self.scale = int(dataset_opt.get("scale", 4) or 4)
        self.hr_crop = int(dataset_opt.get("crop_size",
                                           dataset_opt.get("HR_size", 128))
                           or 128)
        self.phase = dataset_opt.get("phase", "train")
        hr_root = _dataroot(dataset_opt, "dataroot_HR", "dataroot_B",
                            "dataroot_gt")
        lr_root = _dataroot(dataset_opt, "dataroot_LR", "dataroot_A",
                            "dataroot_lq")
        if not hr_root:
            raise ValueError("AlignedDataset needs dataroot_HR/B/gt")
        self.hr_paths = scan_images(hr_root)
        if not self.hr_paths:
            raise ValueError(f"no images found under [{hr_root}]")
        self.lr_paths: Optional[List[str]] = None
        if lr_root and os.path.isdir(lr_root):
            lr = scan_images(lr_root)
            if len(lr) == len(self.hr_paths):
                self.lr_paths = lr
        self.znorm = bool(dataset_opt.get("znorm"))
        # uint8 wire format: 4x less host->device traffic, lossless for
        # 8-bit sources; device normalizes (ops/blocks.wire_to_f01)
        self.wire_u8 = str(dataset_opt.get("wire_dtype", "")
                           ).lower() in ("u8", "uint8")
        self.color = dataset_opt.get("color")
        self.use_flip = bool(dataset_opt.get("use_flip", True))
        self.use_rot = bool(dataset_opt.get("use_rot", True))
        self.seed_base = int(dataset_opt.get("seed", 0) or 0)
        # random HR pre-downscale probability (ref base_dataset
        # aug_downscale / augmentations.random_downscale_B:1054)
        self.aug_downscale = float(dataset_opt.get("aug_downscale", 0)
                                   or 0)
        # host-exact OTF degradations (otf_mode: host): real codec
        # round-trips / cv2 blurs per sample in the loader workers —
        # the parity-exact alternative to the on-device pipeline
        self.host_otf = (dataset_opt.get("otf_mode") == "host")
        # when the on-device pipeline regenerates LR from HR (blind-SR
        # presets have a resize stage), the host's MATLAB downscale of
        # the full HR per sample is discarded work — replace it with a
        # free strided subsample placeholder of the right shape
        self.skip_host_lr = False
        if self.phase == "train" and self.lr_paths is None and \
                not self.host_otf:
            try:
                from .pipeline import BatchDegrader, get_unpaired_params

                lr_p, _ = get_unpaired_params(dataset_opt)
                if lr_p:
                    deg = BatchDegrader(dataset_opt, "lr", lr_p)
                    # same condition train.make_otf_degradation uses to
                    # decide that LR is regenerated from the HR batch
                    self.skip_host_lr = any(n == "resize"
                                            for n, _ in deg.stages)
            except Exception:
                self.skip_host_lr = False
        # optional subset file: one relative path per line
        # (ref base_dataset read_dataroots:134 subset support)
        subset = dataset_opt.get("subset_file")
        if subset and os.path.isfile(subset):
            with open(subset) as f:
                wanted = {ln.strip() for ln in f if ln.strip()}
            self.hr_paths = [p for p in self.hr_paths
                             if os.path.basename(p) in wanted or
                             p in wanted]
        # decoded-tile cache (uint8, bounded): PNG/JPEG decode dominated
        # the producer profile (2.4 ms/sample of the 4.6 ms total on the
        # 1-core host — docs/performance.md round 5); repeated epochs over
        # the same files re-decoded every access like the reference's
        # DataLoader workers do (ref dataops/common.py:130). 0 disables.
        self.cache_mb = float(dataset_opt.get("img_cache_mb", 512) or 0)
        self._cache: Dict[int, np.ndarray] = {}
        self._cache_bytes = 0
        # uint8 fast path: when the wire is uint8 and LR is a strided
        # placeholder (blind-SR regenerates LR on device), decode/crop/
        # flip all stay uint8 — bitwise-identical wire bytes to the f32
        # path (u8 -> f32/255 -> *255+0.5 round-trips exactly) at ~4x
        # less memory traffic and no full-tile float conversion.
        self._fast_u8 = (self.phase == "train" and self.wire_u8
                         and self.lr_paths is None and self.skip_host_lr
                         and not self.color and not self.aug_downscale
                         and not self.host_otf)

    def __len__(self) -> int:
        return len(self.hr_paths)

    def _read_u8(self, index: int) -> Optional[np.ndarray]:
        """Decode path -> uint8 RGB HWC, modcropped; None if the file
        isn't a plain 8-bit image (caller falls back to read_img)."""
        img = self._cache.get(index)
        if img is not None:
            return img
        path = self.hr_paths[index]
        if "::" in path and ".lmdb" in path:
            return None
        import cv2
        raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if raw is None or raw.dtype != np.uint8:
            return None
        if raw.ndim == 2:
            raw = np.repeat(raw[:, :, None], 3, axis=2)
        elif raw.shape[2] == 4:
            raw = raw[:, :, :3]
        img = np.ascontiguousarray(raw[:, :, ::-1])  # BGR -> RGB
        if self._cache_bytes + img.nbytes <= self.cache_mb * 2**20:
            self._cache[index] = img
            self._cache_bytes += img.nbytes
        return img

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(
            None if self.phase == "train" else self.seed_base + index)
        if self._fast_u8:
            hr_u8 = self._read_u8(index)
            if hr_u8 is not None:
                s = self.scale
                hr_u8 = modcrop(hr_u8, s)  # cheap view slice
                hr_c, _ = paired_random_crop(
                    hr_u8, hr_u8[::s, ::s], self.hr_crop, s, rng)
                hr_c = augment_pair([hr_c], self.use_flip, self.use_rot,
                                    rng)[0]
                return {"LR": np.ascontiguousarray(hr_c[::s, ::s]),
                        "HR": hr_c,
                        "LR_path": self.hr_paths[index],
                        "HR_path": self.hr_paths[index]}
        if self.cache_mb and not self._fast_u8:
            # cached-decode path for the general case: decode uint8 once,
            # convert to f32 per access (identical output to read_img)
            u8 = self._read_u8(index)
            hr = (u8.astype(np.float32) / 255.0) if u8 is not None \
                else read_img(self.hr_paths[index])
        else:
            hr = read_img(self.hr_paths[index])
        if self.color:
            hr = channel_convert(hr, self.color)
        if self.lr_paths is not None:
            lr = read_img(self.lr_paths[index])
            if self.color:
                lr = channel_convert(lr, self.color)
        else:
            hr = modcrop(hr, self.scale)
            # strided placeholder when the on-device pipeline regenerates
            # LR from HR anyway (blind-SR) — the MATLAB downscale of the
            # full image per sample would be discarded host work
            lr = (np.ascontiguousarray(hr[:: self.scale, :: self.scale])
                  if self.skip_host_lr
                  else imresize_np(hr, 1.0 / self.scale, kernel="cubic"))
        if self.phase == "train":
            if self.aug_downscale and rng.random() < self.aug_downscale:
                # shrink HR (and regenerate LR) to diversify effective
                # scales (ref random_downscale_B:1054)
                f = float(rng.uniform(0.5, 0.95))
                new_h = max(int(hr.shape[0] * f) // self.scale * self.scale,
                            self.hr_crop)
                new_w = max(int(hr.shape[1] * f) // self.scale * self.scale,
                            self.hr_crop)
                if new_h < hr.shape[0] and new_w < hr.shape[1]:
                    hr = imresize_np(hr, out_shape=(new_h, new_w))
                    lr = (np.ascontiguousarray(
                        hr[:: self.scale, :: self.scale])
                        if self.skip_host_lr
                        else imresize_np(hr, 1.0 / self.scale))
            hr, lr = paired_random_crop(hr, lr, self.hr_crop, self.scale,
                                        rng)
            hr, lr = augment_pair([hr, lr], self.use_flip, self.use_rot,
                                  rng)
        else:
            hr = modcrop(hr, self.scale)
            lr = lr[: hr.shape[0] // self.scale,
                    : hr.shape[1] // self.scale]
        if self.host_otf and self.phase == "train":
            lr = self._host_degrade(lr, rng)
        return {"LR": img2tensor(lr, self.znorm, self.wire_u8),
                "HR": img2tensor(hr, self.znorm, self.wire_u8),
                "LR_path": self.lr_paths[index] if self.lr_paths
                else self.hr_paths[index],
                "HR_path": self.hr_paths[index]}

    def _host_degrade(self, lr: np.ndarray, rng) -> np.ndarray:
        """cv2/codec-exact degradations driven by the same option keys as
        the device pipeline (data/host_degradations.py)."""
        from . import host_degradations as H

        o = self.opt
        if o.get("lr_blur") and rng.random() < float(
                o.get("blur_prob", 1) or 1):
            types = [str(t) for t in (o.get("lr_blur_types") or
                                      ["gaussian"])]
            t = types[int(rng.integers(0, len(types)))]
            if t in ("motion", "complexmotion"):
                lr = H.motion_blur_exact(lr, 7,
                                         float(rng.uniform(0, 180)))
            else:
                lr = H.gaussian_blur_exact(
                    lr, 11, float(rng.uniform(0.2, 2.8)))
        if o.get("lr_noise"):
            types = [str(t).lower() for t in (o.get("lr_noise_types") or
                                              ["gaussian"])]
            t = types[int(rng.integers(0, len(types)))]
            if t in ("jpeg", "webp"):
                q = int(rng.integers(30, 96))
                lr = (H.jpeg_compress_exact(lr, q) if t == "jpeg"
                      else H.webp_compress_exact(lr, q))
            elif t == "clahe":
                lr = H.clahe_exact(lr)
            elif t == "superpixels":
                from .host_superpixels import superpixels as _sp

                n_seg = int(o.get("sp_n_segments", 200))
                p_rep = float(o.get("sp_p_replace", 1.0))
                lr = _sp(lr, n_segments=n_seg,
                         algo=str(o.get("sp_algo", "slic")),
                         kind=str(o.get("sp_kind", "mix")),
                         reduction=o.get("sp_reduction"),
                         replace_samples=(rng.random(n_seg) < p_rep
                                          ).tolist())
            else:
                lr = H.gaussian_noise_exact(
                    lr, float(rng.uniform(1, 25)), rng)
        if o.get("compression"):
            lr = H.jpeg_compress_exact(lr, int(rng.integers(30, 96)))
        return lr.astype(np.float32)


class SingleDataset:
    """Inference-only LR dataset (ref single_dataset.py:7)."""

    def __init__(self, dataset_opt: dict):
        root = _dataroot(dataset_opt, "dataroot_LR", "dataroot_A",
                         "dataroot_lq", "dataroot_HR")
        if not root:
            raise ValueError("SingleDataset needs dataroot_LR/A/lq")
        self.paths = scan_images(root)
        self.znorm = bool(dataset_opt.get("znorm"))
        self.color = dataset_opt.get("color")

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        img = read_img(self.paths[index])
        if self.color:
            img = channel_convert(img, self.color)
        return {"LR": img2tensor(img, self.znorm),
                "LR_path": self.paths[index]}


class UnalignedDataset:
    """Unpaired A/B dataset for CycleGAN/WBC (ref unaligned_dataset.py:8)."""

    def __init__(self, dataset_opt: dict):
        self.opt = dataset_opt
        a_root = _dataroot(dataset_opt, "dataroot_A", "dataroot_LR")
        b_root = _dataroot(dataset_opt, "dataroot_B", "dataroot_HR")
        if not a_root or not b_root:
            raise ValueError("UnalignedDataset needs dataroot_A and _B")
        self.a_paths = scan_images(a_root)
        self.b_paths = scan_images(b_root)
        self.serial = bool(dataset_opt.get("serial_batches"))
        self.crop = int(dataset_opt.get("crop_size", 256) or 256)
        self.phase = dataset_opt.get("phase", "train")
        self.znorm = bool(dataset_opt.get("znorm", True))
        self.wire_u8 = str(dataset_opt.get("wire_dtype", "")
                           ).lower() in ("u8", "uint8")
        self.use_flip = bool(dataset_opt.get("use_flip", True))

    def __len__(self) -> int:
        return max(len(self.a_paths), len(self.b_paths))

    def _load(self, path: str, rng) -> np.ndarray:
        img = read_img(path)
        if self.phase == "train":
            h, w = img.shape[:2]
            if h < self.crop or w < self.crop:
                img = np.pad(img, ((0, max(0, self.crop - h)),
                                   (0, max(0, self.crop - w)), (0, 0)),
                             "reflect")
                h, w = img.shape[:2]
            y = int(rng.integers(0, h - self.crop + 1))
            x = int(rng.integers(0, w - self.crop + 1))
            img = img[y: y + self.crop, x: x + self.crop]
            if self.use_flip and rng.random() < 0.5:
                img = np.ascontiguousarray(img[:, ::-1])
        return img2tensor(img, self.znorm, self.wire_u8)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng()
        a = self.a_paths[index % len(self.a_paths)]
        if self.serial:
            b = self.b_paths[index % len(self.b_paths)]
        else:
            b = self.b_paths[int(rng.integers(0, len(self.b_paths)))]
        return {"A": self._load(a, rng), "B": self._load(b, rng),
                "A_path": a, "B_path": b}


class SyntheticDataset:
    """Random-data dataset for smoke tests / benchmarks (no reference
    equivalent; replaces the need for disk fixtures in CI).

    kind: 'sr' (LR/HR pairs), 'ab' (unaligned A/B), 'video' (clips),
    'dvd' (interlaced + fields)."""

    def __init__(self, dataset_opt: dict):
        self.scale = int(dataset_opt.get("scale", 4) or 4)
        self.hr = int(dataset_opt.get("crop_size", 128) or 128)
        self.n = int(dataset_opt.get("n_samples", 64) or 64)
        self.kind = dataset_opt.get("kind", "sr")
        self.num_frames = int(dataset_opt.get("num_frames", 3) or 3)

    def __len__(self):
        return self.n

    def __getitem__(self, index: int):
        rng = np.random.default_rng(index)
        if self.kind == "ab":
            return {"A": rng.random((self.hr, self.hr, 3), np.float32),
                    "B": rng.random((self.hr, self.hr, 3), np.float32),
                    "A_path": str(index), "B_path": str(index)}
        if self.kind == "video":
            hr = rng.random((self.num_frames, self.hr, self.hr, 3),
                            np.float32)
            lr = np.stack([imresize_np(f, 1.0 / self.scale) for f in hr])
            return {"LR": lr.astype(np.float32), "HR": hr,
                    "LR_path": str(index)}
        if self.kind == "dvd":
            a = rng.random((self.hr, self.hr, 3), np.float32)
            b = rng.random((self.hr, self.hr, 3), np.float32)
            mixed = a.copy()
            mixed[1::2] = b[1::2]
            return {"in": mixed, "top": a, "bottom": b,
                    "LR_path": str(index)}
        hr = rng.random((self.hr, self.hr, 3), np.float32)
        lr = imresize_np(hr, 1.0 / self.scale)
        return {"LR": lr, "HR": hr, "LR_path": str(index),
                "HR_path": str(index)}


def _lazy(name):
    def build(dataset_opt):
        if name == "vid_train":
            from .video_datasets import VidTrainDataset

            return VidTrainDataset(dataset_opt)
        if name == "vid_test":
            from .video_datasets import VidTestDataset

            return VidTestDataset(dataset_opt)
        if name == "dvd":
            from .video_datasets import DVDDataset

            return DVDDataset(dataset_opt)
        if name == "pbr":
            from .pbr_dataset import PBRDataset

            return PBRDataset(dataset_opt)
        if name == "seg":
            from .seg_dataset import SegDataset

            return SegDataset(dataset_opt)
        raise KeyError(name)

    return build


_DATASETS = {
    "aligned": AlignedDataset,
    "single": SingleDataset,
    "unaligned": UnalignedDataset,
    "synthetic": SyntheticDataset,
    "vid_train": _lazy("vid_train"),
    "vid_test": _lazy("vid_test"),
    "dvd": _lazy("dvd"),
    "pbr": _lazy("pbr"),
    "seg": _lazy("seg"),
}


def create_dataset(dataset_opt: dict):
    """Dataset factory (ref data/__init__.py create_dataset:49). Reference
    mode strings map onto the TPU-native dataset classes."""
    mode = (dataset_opt.get("mode") or "aligned").lower()
    phase = dataset_opt.get("phase", "train")
    aliases = {"lrhr": "aligned", "lrhroft": "aligned", "aligned": "aligned",
               "lr": "single", "single": "single",
               "unaligned": "unaligned", "lrhrc": "aligned",
               "synthetic": "synthetic",
               # video modes (ref data/__init__.py dataset_mode video)
               "video": "vid_train" if phase == "train" else "vid_test",
               "vlrhr": "vid_train" if phase == "train" else "vid_test",
               "dvd": "dvd", "dvdi": "dvd",
               "lrhrpbr": "pbr", "pbr": "pbr",
               "lrhrseg_bg": "seg", "seg": "seg"}
    key = aliases.get(mode, mode)
    if key not in _DATASETS:
        raise NotImplementedError(f"dataset mode [{mode}] not recognized")
    return _DATASETS[key](dataset_opt)
