"""Config system tests: parsing the reference's canonical train_sr.yml
template surface (same YAML schema), NoneDict semantics, defaults injection,
preset overlays, relative schedules."""

import os

import pytest

from trainner_tpu.options import (
    NoneDict,
    dict_to_nonedict,
    get_network_D_config,
    get_network_G_config,
    opt_get,
    parse_dict,
)
from trainner_tpu.options.config import read_yaml

REF_TEMPLATE = "/root/reference/codes/options/sr/train_sr.yml"


def _template_opt():
    return {
        "name": "001_test",
        "model": "sr",
        "scale": 4,
        "use_amp": True,
        "datasets": {
            "train": {
                "name": "DIV2K",
                "mode": "aligned",
                "dataroot_HR": ["/tmp/hr1", "/tmp/hr2"],
                "dataroot_LR": "/tmp/lr1",
                "batch_size": 8,
                "virtual_batch_size": 16,
                "crop_size": 128,
                "use_flip": True,
                "use_rot": True,
            },
            "val": {
                "name": "val1",
                "mode": "aligned",
                "dataroot_B": "/tmp/valhr",
                "dataroot_A": "/tmp/vallr",
            },
        },
        "path": {"root": "/tmp/tt_exp"},
        "network_G": "esrgan",
        "network_D": "discriminator_vgg",
        "train": {
            "niter": 500000,
            "lr_steps_rel": [0.1, 0.2, 0.4, 0.6],
            "pixel_criterion": "l1",
            "pixel_weight": 1e-2,
            "gan_type": "vanilla",
            "gan_weight": 5e-3,
        },
        "logger": {"print_freq": 200},
    }


def test_nonedict():
    d = dict_to_nonedict({"a": 1, "b": {"c": 2}})
    assert d["missing"] is None
    assert d["b"]["also_missing"] is None
    assert d["b"]["c"] == 2


def test_opt_get():
    d = {"a": {"b": {"c": 3}}}
    assert opt_get(d, ["a", "b", "c"]) == 3
    assert opt_get(d, ["a", "x"], 7) == 7


def test_parse_basic():
    opt = parse_dict(_template_opt(), is_train=True)
    assert isinstance(opt, NoneDict)
    # dataset parsing
    tr = opt["datasets"]["train"]
    assert tr["phase"] == "train"
    assert tr["scale"] == 4
    assert tr["virtual_batch_size"] == 16
    # val dataroot aliases normalized (A/B -> LR/HR)
    val = opt["datasets"]["val"]
    assert val["dataroot_HR"] == "/tmp/valhr"
    assert val["dataroot_LR"] == "/tmp/vallr"
    # network defaults injected
    g = opt["network_G"]
    assert g["type"] == "rrdb_net"
    assert g["nf"] == 64 and g["nb"] == 23 and g["gc"] == 32
    assert g["upscale"] == 4
    d = opt["network_D"]
    assert d["type"] == "discriminator_vgg"
    assert d["size"] == 128
    # relative lr steps resolved to absolute iterations
    assert opt["train"]["lr_steps"] == [50000, 100000, 200000, 300000]
    # experiment dirs
    assert opt["path"]["models"].endswith("experiments/001_test/models")


def test_parse_reference_template():
    """The reference's shipped train_sr.yml parses with the same surface."""
    if not os.path.isfile(REF_TEMPLATE):
        pytest.skip("reference template unavailable")
    raw = read_yaml(REF_TEMPLATE)
    # sci-notation resolver: niter 5e5 must parse as a number, not str
    assert float(raw["train"]["niter"]) == 5e5
    assert isinstance(raw["train"]["niter"], float)
    opt = parse_dict(raw, opt_path=REF_TEMPLATE, is_train=True)
    assert opt["network_G"]["type"] == "rrdb_net"
    assert opt["network_G"]["nb"] == 23
    assert opt["network_D"]["type"] == "discriminator_vgg"
    assert opt["train"]["swa_start_iter"] == int(0.75 * 5e5)


def test_debug_name_magic():
    o = _template_opt()
    o["name"] = "debug_001_test"
    opt = parse_dict(o, is_train=True)
    assert opt["is_debug"]
    assert opt["train"]["val_freq"] == 8
    assert opt["logger"]["print_freq"] == 2


def test_network_G_variants():
    cfg = get_network_G_config("esrgan-lite", 4, 128)
    assert cfg["nf"] == 32 and cfg["nb"] == 12
    cfg = get_network_G_config("sr_resnet", 2, 128)
    assert cfg["type"] == "sr_resnet" and cfg["nb"] == 16
    assert cfg["upscale"] == 2
    cfg = get_network_G_config({"type": "esrgan", "nf": 48, "plus": True}, 4, 128)
    assert cfg["nf"] == 48 and cfg["plus"] is True
    cfg = get_network_G_config("srflow", 4, 160)
    assert cfg["flow"]["K"] == 16 and cfg["flow"]["L"] == 3
    with pytest.raises(NotImplementedError):
        get_network_G_config("not_a_net", 4, 128)


def test_network_G_unshuffle():
    cfg = get_network_G_config(
        {"type": "esrgan", "unshuffle": True, "unshuffle_scale": 2}, 2, 128)
    assert cfg["in_nc"] == 12  # 3 * 2^2


def test_network_D_variants():
    cfg = get_network_D_config("patchgan", 4, 128, "rrdb_net")
    assert cfg["type"] == "patchgan" and cfg["n_layers"] == 3
    cfg = get_network_D_config("multiscale", 4, 128, "rrdb_net")
    assert cfg["num_D"] == 3
    cfg = get_network_D_config("unet", 4, 128, "rrdb_net")
    assert cfg["skip_connection"] is True
    cfg = get_network_D_config("discriminator_vgg_128", 4, 128, "rrdb_net")
    assert cfg["base_nf"] == 64


def test_presets_overlay():
    o = _template_opt()
    o["datasets"]["train"]["augs_strategy"] = "bsrgan"
    opt = parse_dict(o, is_train=True)
    tr = opt["datasets"]["train"]
    assert tr["lr_blur"] is True
    assert tr["lr_blur_types"] == ["iso"]
    assert tr["shuffle_degradations"] is True
    assert tr["aug_configs"]["iso"]["kernel_size"] == 21
    # resize codes mapped to ints
    assert all(isinstance(x, int) for x in tr["lr_downscale_types"])


def test_presets_inline_override():
    o = _template_opt()
    tr = o["datasets"]["train"]
    tr["augs_strategy"] = "resrgan"
    tr["blur_prob2"] = 0.5  # inline wins over preset 0.8
    tr["aug_configs"] = {"iso": {"sigmaX": [0.3, 2.0]}}
    opt = parse_dict(o, is_train=True)
    tr = opt["datasets"]["train"]
    assert tr["blur_prob2"] == 0.5
    assert tr["aug_configs"]["iso"]["sigmaX"] == [0.3, 2.0]
    assert tr["aug_configs"]["iso"]["kernel_size"] == 21  # from preset


def test_network_presets():
    """gen_esrgan/disc_esrgan network presets (ref codes/options/presets/
    gen_esrgan.yaml:1, disc_esrgan.yaml:1 — the reference ships these but
    never consumes them; we wire `network_G_preset`/`network_D_preset`):
    preset values land, inline keys win, defaults apply on the merge."""
    o = _template_opt()
    o.pop("network_G", None)
    o.pop("network_D", None)
    o["network_G_preset"] = "gen_esrgan"
    o["network_D_preset"] = "disc_esrgan"
    o["network_G"] = {"nb": 12}  # inline wins over the preset's 23
    opt = parse_dict(o, is_train=True)
    g, d = opt["network_G"], opt["network_D"]
    assert g["type"] == "rrdb_net"
    assert g["nb"] == 12 and g["nf"] == 64 and g["gc"] == 32
    assert g["gaussian_noise"] or g.get("gaussian")  # preset gaussian: true
    assert d["type"].startswith("discriminator_vgg")
    assert d["base_nf"] == 64  # preset nf canonicalizes to base_nf


def test_network_preset_missing_section_raises():
    import pytest as _pytest

    o = _template_opt()
    o["network_D_preset"] = "gen_esrgan"  # has no network_D section
    with _pytest.raises(ValueError):
        parse_dict(o, is_train=True)


def test_train_realesrgan_template_parses():
    """BASELINE config 3 (blind-SR preset training) template parses and
    resolves the resrgan preset overlay."""
    from trainner_tpu.options import parse

    opt = parse("options/sr/train_realesrgan.yml", is_train=True)
    ds = opt["datasets"]["train"]
    assert ds.get("augs_strategy") == "resrgan"
    # overlay resolved: pipeline/aug configs materialized on the dataset
    assert ds.get("aug_configs") or ds.get("lr_blur_types") \
        or ds.get("aug_params") or ds.get("pipeline")


def test_all_shipped_templates_parse():
    """Every option template in options/ parses (train_* as is_train,
    test_* as inference) and resolves a known model key — mirrors the
    reference's template set (options/sr|srflow|video|i2i)."""
    import glob
    import os

    from trainner_tpu.options import parse

    root = os.path.join(os.path.dirname(__file__), "..", "options")
    files = sorted(glob.glob(os.path.join(root, "**", "*.yml"),
                             recursive=True) +
                   glob.glob(os.path.join(root, "**", "*.json"),
                             recursive=True))
    assert len(files) >= 16, files
    for f in files:
        is_train = os.path.basename(f).startswith("train")
        opt = parse(f, is_train=is_train)
        assert opt.get("model") in (
            "sr", "srgan", "srflow", "vsr", "vsrgan", "dvd", "sftgan",
            "pix2pix", "cyclegan", "wbc", "ppon", "pbr"), f


def test_all_train_templates_construct_trainers():
    """Beyond parsing: every shipped TRAIN template must construct its
    trainer (template -> defaults -> network/loss constructors) — the
    glue the per-architecture tests don't cover."""
    import glob
    import os
    import sys

    import jax.numpy as jnp

    from trainner_tpu.options import parse

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from train import create_trainer

    root = os.path.join(os.path.dirname(__file__), "..", "options")
    files = sorted(glob.glob(os.path.join(root, "**", "train_*.yml"),
                             recursive=True) +
                   glob.glob(os.path.join(root, "**", "train_*.json"),
                             recursive=True))
    assert len(files) >= 9, files
    for f in files:
        opt = parse(f, is_train=True)
        tr = create_trainer(opt)
        assert tr is not None, f
        # the generator module exists and carries the template's dtype
        net = getattr(tr, "netG", None) or getattr(tr, "netG_A", None)
        assert net is not None, f
