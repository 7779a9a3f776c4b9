"""Smoke tests for the checkpoint-surgery / dataset-prep scripts
(SURVEY.md §2.8: net_interp, net_splice, dir_interp, swa2normal,
transfer_params, rename, color2gray)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_script(name, argv, monkeypatch):
    path = os.path.join(REPO, "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"script_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [path] + argv)
    mod.main()


def _toy_params(seed):
    rng = np.random.default_rng(seed)
    return {"conv0": {"kernel": rng.normal(size=(3, 3, 4, 8))
                      .astype(np.float32),
                      "bias": np.zeros((8,), np.float32)},
            "body": {"conv1": {"kernel": rng.normal(size=(1, 1, 8, 8))
                               .astype(np.float32)}}}


@pytest.fixture()
def ckpts(tmp_path):
    from trainner_tpu.utils.checkpoint import save_params

    pa, pb = _toy_params(0), _toy_params(1)
    a, b = str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt")
    save_params(pa, a, backup=False)
    save_params(pb, b, backup=False)
    return pa, pb, a, b, tmp_path


def test_net_interp_and_splice(ckpts, monkeypatch):
    from trainner_tpu.utils.checkpoint import load_params

    pa, pb, a, b, tmp = ckpts
    out = str(tmp / "mix.ckpt")
    _run_script("net_interp", [a, b, out, "--alpha", "0.25"], monkeypatch)
    mixed = load_params(out)
    want = 0.75 * pa["conv0"]["kernel"] + 0.25 * pb["conv0"]["kernel"]
    assert np.allclose(mixed["conv0"]["kernel"], want, atol=1e-6)

    out2 = str(tmp / "spliced.ckpt")
    _run_script("net_splice", [a, b, out2, "-s", "1.0"], monkeypatch)
    spliced = load_params(out2)
    assert np.allclose(spliced["conv0"]["kernel"], pb["conv0"]["kernel"])


def test_dir_interp_averages(ckpts, monkeypatch):
    from trainner_tpu.utils.checkpoint import load_params

    pa, pb, a, b, tmp = ckpts
    out = str(tmp / "soup.ckpt")
    _run_script("dir_interp", ["--intdir", str(tmp), "--savepath", out],
                monkeypatch)
    soup = load_params(out)
    want = 0.5 * (pa["conv0"]["kernel"] + pb["conv0"]["kernel"])
    assert np.allclose(soup["conv0"]["kernel"], want, atol=1e-6)


def test_swa2normal_from_state(ckpts, monkeypatch):
    from flax import serialization

    from trainner_tpu.utils.checkpoint import load_params

    pa, _, _, _, tmp = ckpts
    state_path = str(tmp / "latest.state")
    raw = {"state": {"swa_params": pa, "swa_n": np.int32(7)}}
    with open(state_path, "wb") as f:
        f.write(serialization.msgpack_serialize(raw))
    out = str(tmp / "swa_G.ckpt")
    _run_script("swa2normal", [state_path, out], monkeypatch)
    got = load_params(out)
    assert np.allclose(got["conv0"]["kernel"], pa["conv0"]["kernel"])


def test_transfer_params_copies_matching(ckpts, monkeypatch):
    from trainner_tpu.utils.checkpoint import save_params, load_params

    pa, _, a, _, tmp = ckpts
    # destination: same conv0 shapes, extra head that must stay fresh
    dst = _toy_params(9)
    dst["head"] = {"kernel": np.ones((1, 1, 8, 3), np.float32)}
    dpath = str(tmp / "fresh.ckpt")
    save_params(dst, dpath, backup=False)
    out = str(tmp / "warm.ckpt")
    _run_script("transfer_params", [a, dpath, out], monkeypatch)
    got = load_params(out)
    assert np.allclose(got["conv0"]["kernel"], pa["conv0"]["kernel"])
    assert np.allclose(got["head"]["kernel"], 1.0)


def test_rename_and_color2gray(tmp_path, monkeypatch):
    import cv2

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(src / f"im_{i}.png"),
                    rng.integers(0, 255, (8, 8, 3)).astype(np.uint8))
    out = tmp_path / "renamed"
    _run_script("rename", [str(src / "*.png"), str(out),
                           "--prefix", "f"], monkeypatch)
    assert sorted(os.listdir(out)) == ["f001.png", "f002.png", "f003.png"]

    gray = tmp_path / "gray"
    _run_script("color2gray", [str(src), str(gray), "--workers", "1"],
                monkeypatch)
    g = cv2.imread(str(gray / "im_0.png"), cv2.IMREAD_UNCHANGED)
    assert g is not None and g.ndim == 2


def test_extract_enlarge_patches(tmp_path, monkeypatch):
    import cv2

    src = tmp_path / "ori"
    src.mkdir()
    rng = np.random.default_rng(1)
    cv2.imwrite(str(src / "a.png"),
                rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
    out = tmp_path / "figs"
    _run_script("extract_enlarge_patches",
                [str(src / "*.png"), str(out), "--rect", "4", "6", "8",
                 "10", "--ratio", "2"], monkeypatch)
    patch = cv2.imread(str(out / "a_patch.png"))
    assert patch.shape == (16, 20, 3)
    assert os.path.exists(out / "a_rect.png")


def test_back_projection_improves_lr_consistency(tmp_path, monkeypatch):
    """ref scripts/back_projection/backprojection.m + main_bp.m: 20 BP
    iterations must reduce ||down(SR) - LR|| on a synthetic pair; the
    'if' reverse-filter mode must run and stay bounded."""
    import cv2

    from trainner_tpu.ops.imresize import imresize_np

    rng = np.random.default_rng(0)
    hr = rng.random((64, 64, 3)).astype(np.float32)
    lr = np.clip(imresize_np(hr, 0.25, kernel="cubic"), 0, 1)
    sr0 = np.clip(imresize_np(lr, 4.0, kernel="linear"), 0, 1)
    for d in ("lr", "sr", "out_bp", "out_if"):
        (tmp_path / d).mkdir()
    cv2.imwrite(str(tmp_path / "lr" / "a.png"),
                (lr * 255).astype(np.uint8))
    cv2.imwrite(str(tmp_path / "sr" / "a.png"),
                (sr0 * 255).astype(np.uint8))

    def cons(img01):
        d = np.clip(imresize_np(img01, 0.25, kernel="cubic"), 0, 1)
        return float(np.abs(d - lr).mean())

    _run_script("back_projection",
                ["--lr", str(tmp_path / "lr"), "--sr", str(tmp_path / "sr"),
                 "--out", str(tmp_path / "out_bp"), "--mode", "bp",
                 "--iters", "20"], monkeypatch)
    out = cv2.imread(str(tmp_path / "out_bp" / "a.png")
                     ).astype(np.float32) / 255.0
    before = cons(cv2.imread(str(tmp_path / "sr" / "a.png")
                             ).astype(np.float32) / 255.0)
    assert cons(out) < before * 0.75

    _run_script("back_projection",
                ["--lr", str(tmp_path / "lr"), "--sr", str(tmp_path / "sr"),
                 "--out", str(tmp_path / "out_if"), "--mode", "if",
                 "--iters", "5"], monkeypatch)
    out_if = cv2.imread(str(tmp_path / "out_if" / "a.png"))
    assert out_if is not None and out_if.shape == (64, 64, 3)


def test_crop_stream_skip_matches_materialized():
    """crop_stream(skip=k) must land on exactly the same batch as
    materializing and discarding k batches (resume positioning)."""
    import sys, os
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import quality_ab_common as C

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (C.CROP + 40 + i, C.CROP + 60 + i, 3),
                         np.uint8) for i in range(3)]
    s1 = C.crop_stream(imgs, seed=7)
    for _ in range(5):
        next(s1)
    want = next(s1)
    s2 = C.crop_stream(imgs, seed=7, skip=5)
    got = next(s2)
    np.testing.assert_array_equal(got, want)


def test_truncate_curve_drops_post_checkpoint_rows(tmp_path):
    import json
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import quality_ab_common as C

    p = str(tmp_path / "c.jsonl")
    rows = [{"meta": {"side": "x"}}, {"step": 100, "loss": 1.0},
            {"step": 250, "val_psnr": 20.0}, {"step": 300, "loss": 0.9}]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    C.truncate_curve(p, 250)
    left = [json.loads(ln) for ln in open(p)]
    assert len(left) == 3
    assert left[-1]["step"] == 250
