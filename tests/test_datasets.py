"""Tests for the dataset zoo: video, DVD, PBR, packed format
(SURVEY.md §2.3)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("videos")
    for v in ("vid0", "vid1"):
        d = root / v
        d.mkdir()
        for i in range(8):
            img = np.random.default_rng(i).integers(
                0, 255, (48, 64, 3), np.uint8)
            cv2.imwrite(str(d / f"{i:03d}.png"), img)
    return str(root)


@pytest.fixture(scope="module")
def pbr_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("pbr")
    d = root / "mat0"
    d.mkdir()
    rng = np.random.default_rng(0)
    for suffix in ("diffuse", "normal", "height"):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        cv2.imwrite(str(d / f"mat0_{suffix}.png"), img)
    return str(root)


def test_vid_train_dataset(video_root):
    from trainner_tpu.data.video_datasets import VidTrainDataset

    ds = VidTrainDataset({"dataroot_HR": video_root, "scale": 4,
                          "num_frames": 3, "crop_size": 32,
                          "max_frameskip": 2, "random_reverse": True,
                          "phase": "train", "n_samples": 4})
    s = ds[0]
    assert s["HR"].shape == (3, 32, 32, 3)
    assert s["LR"].shape == (3, 8, 8, 3)


def test_vid_train_dataset_y_only(video_root):
    from trainner_tpu.data.video_datasets import VidTrainDataset

    ds = VidTrainDataset({"dataroot_HR": video_root, "scale": 4,
                          "num_frames": 3, "crop_size": 32,
                          "y_only": True, "srcolors": True,
                          "phase": "train", "n_samples": 2})
    s = ds[0]
    assert s["HR"].shape == (3, 32, 32, 1)
    assert s["LR"].shape == (3, 8, 8, 1)
    assert s["LR_bicubic"].shape == (32, 32, 3)
    assert s["HR_center"].shape == (32, 32, 3)


def test_vid_test_dataset(video_root):
    from trainner_tpu.data.video_datasets import VidTestDataset

    ds = VidTestDataset({"dataroot_HR": os.path.join(video_root, "vid0"),
                         "scale": 4, "num_frames": 3, "phase": "test"})
    assert len(ds) == 6
    s = ds[0]
    assert s["LR"].shape[0] == 3


def test_dvd_dataset(video_root):
    from trainner_tpu.data.video_datasets import DVDDataset, interlace

    ds = DVDDataset({"dataroot_HR": os.path.join(video_root, "vid0"),
                     "crop_size": 32, "phase": "train"})
    s = ds[0]
    assert s["in"].shape == s["top"].shape == s["bottom"].shape
    # interlace correctness: even rows from top, odd from bottom
    a = np.zeros((4, 4, 3), np.float32)
    b = np.ones((4, 4, 3), np.float32)
    mixed = interlace(a, b)
    assert mixed[0::2].sum() == 0 and (mixed[1::2] == 1).all()


def test_pbr_dataset(pbr_root):
    from trainner_tpu.data.pbr_dataset import PBRDataset

    ds = PBRDataset({"dataroot_HR": pbr_root, "scale": 4,
                     "crop_size": 32, "phase": "train"})
    s = ds[0]
    assert s["HR_diffuse"].shape == (32, 32, 3)
    assert s["HR_normal"].shape == (32, 32, 3)
    assert s["HR_height"].shape == (32, 32, 1)
    assert s["LR_diffuse"].shape == (8, 8, 3)
    assert np.allclose(s["HR"], s["HR_diffuse"])


def test_packed_roundtrip(tmp_path, video_root):
    from trainner_tpu.data.packed import PackedReader, pack_folder

    out = str(tmp_path / "vid0.tpak")
    n = pack_folder(os.path.join(video_root, "vid0"), out)
    assert n == 8
    r = PackedReader(out)
    assert len(r) == 8
    img = r.read(r.keys[0])
    assert img.shape == (48, 64, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    # bitwise-exact roundtrip vs the original file
    from trainner_tpu.data.common import read_img

    orig = read_img(os.path.join(video_root, "vid0", "000.png"))
    assert np.allclose(img, orig, atol=1 / 255.0)
    r.close()


def test_create_dataset_video_modes(video_root):
    from trainner_tpu.data.datasets import create_dataset

    ds = create_dataset({"mode": "video", "phase": "train",
                         "dataroot_HR": video_root, "scale": 4,
                         "num_frames": 3, "crop_size": 32,
                         "n_samples": 2})
    assert type(ds).__name__ == "VidTrainDataset"
    ds = create_dataset({"mode": "video", "phase": "val",
                         "dataroot_HR": os.path.join(video_root, "vid0"),
                         "scale": 4, "num_frames": 3})
    assert type(ds).__name__ == "VidTestDataset"


def test_concat_dataset_and_weighted_loader():
    from trainner_tpu.data.datasets import SyntheticDataset
    from trainner_tpu.data.loader import (ConcatDataset, WeightedMultiLoader,
                                          create_dataloader)

    a = SyntheticDataset({"n_samples": 4, "crop_size": 16, "scale": 2})
    b = SyntheticDataset({"n_samples": 8, "crop_size": 16, "scale": 2})
    cat = ConcatDataset([a, b])
    assert len(cat) == 12
    assert cat[0]["HR"].shape == cat[11]["HR"].shape

    ld = create_dataloader([a, b], {"phase": "train", "batch_size": 2,
                                    "sampler_weights": [4, 1],
                                    "n_workers": 0})
    assert isinstance(ld, WeightedMultiLoader)
    batches = list(ld)
    assert batches
    assert all(b_["HR"].shape[0] == 2 for b_ in batches)
    # each batch comes wholly from one dataset (has dataset_index)
    assert all("dataset_index" in b_ for b_ in batches)


def test_seg_dataset(video_root, tmp_path):
    from trainner_tpu.data.seg_dataset import SegDataset

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    # one .npy prob map matching an HR stem
    rng = np.random.default_rng(0)
    probs = rng.random((48, 64, 8)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    np.save(str(seg_dir / "000.npy"), probs)

    ds = SegDataset({"dataroot_HR": os.path.join(video_root, "vid0"),
                     "dataroot_seg": str(seg_dir), "scale": 4,
                     "crop_size": 32, "phase": "train"})
    s = ds[0]
    assert s["HR"].shape == (32, 32, 3)
    assert s["LR"].shape == (8, 8, 3)
    assert s["seg"].shape == (32, 32, 8)
    assert 0 <= int(s["category"]) < 8
    # missing seg file -> uniform fallback
    s2 = ds[1]
    assert np.allclose(s2["seg"], 1.0 / 8)


def test_uint8_wire_format(tmp_path):
    """wire_dtype: uint8 ships u8 batches (lossless for 8-bit sources);
    the trainer-side wire_to_f01 restores the float values exactly."""
    import cv2
    import jax.numpy as jnp

    from trainner_tpu.data.datasets import AlignedDataset
    from trainner_tpu.ops.blocks import wire_to_f01

    hr_dir = tmp_path / "hr"
    hr_dir.mkdir()
    src = (np.random.default_rng(0).random((64, 64, 3)) * 255
           ).astype(np.uint8)
    cv2.imwrite(str(hr_dir / "a.png"), src)
    base = {"phase": "train", "dataroot_HR": str(hr_dir), "scale": 2,
            "crop_size": 32, "use_flip": False, "use_rot": False}
    ds_u8 = AlignedDataset({**base, "wire_dtype": "uint8"})
    ds_f32 = AlignedDataset(base)
    s8, sf = ds_u8[0], ds_f32[0]
    assert s8["HR"].dtype == np.uint8
    assert sf["HR"].dtype == np.float32
    back = np.asarray(wire_to_f01(jnp.asarray(s8["HR"])))
    # crops are random; compare value SETS of the source image instead
    vals8 = set(np.unique(s8["HR"]).tolist())
    assert vals8 <= set(np.unique(src).tolist())
    assert np.abs(back * 255.0 - s8["HR"].astype(np.float32)).max() < 1e-4
    # znorm composes on device
    z = np.asarray(wire_to_f01(jnp.asarray(s8["HR"]), znorm=True))
    assert -1.0 <= z.min() and z.max() <= 1.0
