"""Data layer: host-side datasets + loaders feeding the on-device batched
degradation pipeline (TPU-native redesign of ref codes/data/ +
codes/dataops/ — see SURVEY.md §2.3-2.4, §7.1)."""

from .common import (
    img2tensor,
    modcrop,
    paired_random_crop,
    read_img,
    tensor2img,
)
from .datasets import AlignedDataset, SingleDataset, UnalignedDataset, create_dataset
from .loader import DataLoader, create_dataloader

__all__ = [
    "read_img", "img2tensor", "tensor2img", "modcrop", "paired_random_crop",
    "AlignedDataset", "SingleDataset", "UnalignedDataset", "create_dataset",
    "DataLoader", "create_dataloader",
]
