"""Host-exact superpixel transform (data/host_superpixels.py) — mirrors
ref codes/dataops/augmennt/augmennt/superpixels.py: felzenszwalb/slic
segmentation, avg/median/mix coloring (label2rgb:33), and the
selective/cluster/rag reduction strategies (segmentation_reduction:270).
Reference parity for label2rgb is gated directly against the reference
module (numpy-only, importable without skimage)."""

import os
import sys

import numpy as np
import pytest

from trainner_tpu.data import host_superpixels as SP

REF = "/root/reference/codes"


def _img(h=48, w=48, seed=0):
    rng = np.random.default_rng(seed)
    # piecewise-constant + noise so segmenters find real structure
    img = np.zeros((h, w, 3), np.float32)
    img[: h // 2, : w // 2] = (0.8, 0.2, 0.2)
    img[: h // 2, w // 2:] = (0.2, 0.8, 0.3)
    img[h // 2:, : w // 2] = (0.1, 0.3, 0.9)
    img[h // 2:, w // 2:] = (0.9, 0.9, 0.1)
    return np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1
                   ).astype(np.float32)


def test_felzenszwalb_finds_blocks():
    labels = SP.felzenszwalb(_img(), scale=10.0, sigma=0.8, min_size=20)
    assert labels.shape == (48, 48)
    n = len(np.unique(labels))
    assert 2 <= n <= 40
    # with aggressive merging the four quadrants become internally
    # uniform (k=10 over-segments by design — the reduction step's job)
    labels = SP.felzenszwalb(_img(), scale=500.0, sigma=0.8,
                             min_size=200)
    q = labels[:24, :24]
    assert (q == np.bincount(q.ravel()).argmax()).mean() > 0.9


def test_slic_segment_count_and_coverage():
    labels = SP.slic(_img(), n_segments=16, n_iters=5)
    n = len(np.unique(labels))
    assert 4 <= n <= 36
    assert labels.min() == 0 and labels.max() == n - 1


def test_label2rgb_matches_reference_module():
    """Our label2rgb == the reference's (avg / median / mix kinds),
    including the std-threshold adaptive mix path."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    sys.path.append(REF)
    from dataops.augmennt.augmennt import superpixels as ref_sp

    img = (_img() * 255).astype(np.float64)  # ref works in 0..255 units
    labels = SP.slic(_img(), n_segments=12, n_iters=4)
    for kind in ("avg", "median", "mix"):
        ours = SP.label2rgb(labels, img.astype(np.float32) / 255.0,
                            kind=kind)
        ref = ref_sp.label2rgb(labels, img, kind=kind, bg_label=-1,
                               replace_samples=(True,))
        assert np.abs(ours * 255.0 - ref).max() < 1e-3, kind


def test_reduction_cluster_reduces_colors():
    img = _img()
    labels = SP.slic(img, n_segments=32, n_iters=4)
    out = SP.segmentation_reduction(img, labels, n_segments=4,
                                    reduction="cluster", kind="avg")
    # palette collapsed to <= 4 distinct colors
    colors = np.unique(out.reshape(-1, 3), axis=0)
    assert len(colors) <= 4 + 1


def test_reduction_rag_merges_similar_regions():
    img = _img()
    labels = SP.slic(img, n_segments=32, n_iters=4)
    merged = SP.rag_merge(img, labels, thresh=35.0)
    assert len(np.unique(merged)) < len(np.unique(labels))
    out = SP.segmentation_reduction(img, labels, n_segments=4,
                                    reduction="rag", kind="mix")
    assert out.shape == img.shape and np.isfinite(out).all()


def test_reduction_selective_reaches_target():
    img = _img(32, 32)
    labels = SP.slic(img, n_segments=24, n_iters=4)
    n0 = len(np.unique(labels))
    merged = SP.selective_search(img, labels, seg_num=5, ada_regions=False)
    assert len(np.unique(merged)) < n0
    out = SP.segmentation_reduction(img, labels, n_segments=5,
                                    reduction="selective", kind="avg")
    assert out.shape == img.shape


def test_superpixels_end_to_end_all_algos():
    img = _img()
    for algo in ("slic", "sk_slic", "sk_felzenszwalb", "seeds"):
        out = SP.superpixels(img, n_segments=20, algo=algo, kind="mix",
                             reduction="rag", max_size=32)
        assert out.shape == img.shape
        assert out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() <= 1.0
    # partial replacement keeps some original pixels
    rs = [True, False] * 10
    out = SP.superpixels(img, n_segments=20, algo="slic", kind="avg",
                         replace_samples=rs, max_size=None)
    assert not np.allclose(out, SP.superpixels(
        img, n_segments=20, algo="slic", kind="avg", max_size=None))


def test_lbp_codes_range():
    layer = np.random.default_rng(0).random((16, 16))
    code = SP._lbp_channel(layer)
    assert code.min() >= 0 and code.max() <= 255
