"""End-to-end train-CLI integration smokes for every model family
(the reference's `debug_` run mode, SURVEY.md §4.2), on synthetic data."""

import os
import shutil

import numpy as np
import pytest
import yaml

import train as train_cli

ROOT = "/tmp/trainner_tpu_cli_tests"


def _run(opt_dict, name):
    os.makedirs(ROOT, exist_ok=True)
    opt_dict = dict(opt_dict)
    opt_dict["name"] = f"debug_{name}"
    opt_dict.setdefault("path", {})["root"] = ROOT
    shutil.rmtree(os.path.join(ROOT, "experiments", f"debug_{name}"),
                  ignore_errors=True)
    p = os.path.join(ROOT, f"{name}.yml")
    with open(p, "w") as f:
        yaml.safe_dump(opt_dict, f)
    train_cli.main(["-opt", p])
    exp = os.path.join(ROOT, "experiments", f"debug_{name}")
    assert os.path.isdir(os.path.join(exp, "models"))
    models = os.listdir(os.path.join(exp, "models"))
    assert any(m.endswith(".ckpt") for m in models), models
    return exp


def test_cli_vsr():
    _run({"model": "vsr", "scale": 2, "use_amp": False,
          "datasets": {"train": {"mode": "synthetic", "kind": "video",
                                 "crop_size": 16, "num_frames": 3,
                                 "n_samples": 4, "batch_size": 2,
                                 "n_workers": 0}},
          "network_G": {"type": "sr3d_net", "nf": 4, "n_frames": 3,
                        "scale": 2},
          "train": {"lr_G": 1e-4, "niter": 4, "pixel_criterion": "l1",
                    "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                    "lr_steps": [100]},
          "logger": {"print_freq": 2, "save_checkpoint_freq": 4,
                     "tensorboard": False}}, "vsr")


def test_cli_dvd():
    _run({"model": "dvd", "scale": 1, "use_amp": False,
          "datasets": {"train": {"mode": "synthetic", "kind": "dvd",
                                 "crop_size": 16, "n_samples": 4,
                                 "batch_size": 2, "n_workers": 0}},
          "network_G": {"type": "dvd_net", "nf": 8},
          "train": {"lr_G": 1e-4, "niter": 4, "pixel_criterion": "l1",
                    "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                    "lr_steps": [100]},
          "logger": {"print_freq": 2, "save_checkpoint_freq": 4,
                     "tensorboard": False}}, "dvd")


def test_cli_pix2pix():
    _run({"model": "pix2pix", "scale": 1, "use_amp": False,
          "datasets": {"train": {"mode": "synthetic", "kind": "ab",
                                 "crop_size": 32, "n_samples": 4,
                                 "batch_size": 2, "n_workers": 0}},
          "network_G": {"type": "unet_net", "num_downs": 5, "ngf": 8,
                        "strict": True},
          "network_D": {"type": "patchgan", "ndf": 8, "n_layers": 1},
          "train": {"lr_G": 2e-4, "lr_D": 2e-4, "gan_type": "vanilla",
                    "gan_weight": 1.0, "pixel_criterion": "l1",
                    "pixel_weight": 100.0, "niter": 4,
                    "lr_scheme": "MultiStepLR", "lr_steps": [100]},
          "logger": {"print_freq": 2, "save_checkpoint_freq": 4,
                     "tensorboard": False}}, "pix2pix")


def test_cli_cyclegan():
    exp = _run({"model": "cyclegan", "scale": 1, "use_amp": False,
                "pool_size": 4,
                "datasets": {"train": {"mode": "synthetic", "kind": "ab",
                                       "crop_size": 16, "n_samples": 4,
                                       "batch_size": 2, "n_workers": 0}},
                "network_G": {"type": "resnet_net", "n_blocks": 1,
                              "ngf": 8},
                "network_D": {"type": "patchgan", "ndf": 8,
                              "n_layers": 1},
                "train": {"lr_G": 2e-4, "lr_D": 2e-4,
                          "gan_type": "lsgan", "gan_weight": 1.0,
                          "lambda_A": 10.0, "lambda_B": 10.0,
                          "lambda_identity": 0, "niter": 4,
                          "lr_scheme": "MultiStepLR",
                          "lr_steps": [100]},
                "logger": {"print_freq": 2, "save_checkpoint_freq": 4,
                           "tensorboard": False}}, "cyclegan")
    models = os.listdir(os.path.join(exp, "models"))
    assert any("G_A" in m for m in models)  # multi-net checkpoint naming


def test_cli_srflow():
    _run({"model": "srflow", "scale": 4, "use_amp": False,
          "datasets": {"train": {"mode": "synthetic", "crop_size": 32,
                                 "n_samples": 4, "batch_size": 2,
                                 "n_workers": 0}},
          "network_G": {"type": "srflow_net", "nf": 8, "nb": 2, "gc": 4,
                        "scale": 4, "K": 2,
                        "flow": {"L": 3, "hidden_channels": 8}},
          "train": {"lr_G": 1e-4, "niter": 4, "fl_weight": 1.0,
                    "lr_scheme": "MultiStepLR", "lr_steps": [100]},
          "logger": {"print_freq": 2, "save_checkpoint_freq": 4,
                     "tensorboard": False}}, "srflow")


def test_cli_wbc():
    _run({"model": "wbc", "scale": 1, "use_amp": False, "pool_size": 4,
          "datasets": {"train": {"mode": "synthetic", "kind": "ab",
                                 "crop_size": 32, "n_samples": 4,
                                 "batch_size": 2, "n_workers": 0}},
          "network_G": {"type": "wbcunet_net", "nf": 8},
          "network_D": {"type": "patchgan", "ndf": 8, "n_layers": 1},
          "train": {"lr_G": 2e-4, "lr_D": 2e-4, "gan_type": "lsgan",
                    "gan_weight": 1.0, "pixel_criterion": "l1",
                    "pixel_weight": 1.0, "cont_losses": ["pix"],
                    "struct_losses": ["pix"], "reg_losses": ["tv"],
                    "tv_type": "tv", "tv_weight": 1e-5,
                    "sp_n_segments": 16, "niter": 4,
                    "lr_scheme": "MultiStepLR", "lr_steps": [100]},
          "logger": {"print_freq": 2, "save_checkpoint_freq": 4,
                     "tensorboard": False}}, "wbc")


def test_cli_blind_sr_presets():
    """BASELINE config 3: blind-SR training with the resrgan preset
    overlay driving the on-device degradation pipeline."""
    _run({"model": "sr", "scale": 2, "use_amp": False,
          "datasets": {"train": {"mode": "synthetic", "scale": 2,
                                 "crop_size": 32, "n_samples": 4,
                                 "batch_size": 2, "n_workers": 0,
                                 "augs_strategy": "resrgan"}},
          "network_G": {"type": "rrdb_net", "nf": 8, "nb": 1, "gc": 4,
                        "upscale": 2},
          "network_D": {"type": "unet", "nf": 8},
          "train": {"lr_G": 1e-4, "lr_D": 1e-4, "niter": 4,
                    "pixel_criterion": "l1", "pixel_weight": 1.0,
                    "gan_type": "vanilla", "gan_weight": 5e-3,
                    "lr_scheme": "MultiStepLR", "lr_steps": [100]},
          "logger": {"print_freq": 2, "save_checkpoint_freq": 4,
                     "tensorboard": False}}, "blind_sr")


def test_cli_resume_from_state():
    """End-to-end resume through the CLI: a second run with
    path.resume_state continues from the saved iteration and reaches
    the (larger) niter (ref train.py get_resume_state:81 +
    resume_training:176)."""
    base = {"model": "sr", "scale": 2, "use_amp": False,
            "datasets": {"train": {"mode": "synthetic", "scale": 2,
                                   "crop_size": 16, "n_samples": 4,
                                   "batch_size": 2, "n_workers": 0}},
            "network_G": {"type": "sr_resnet", "nf": 8, "nb": 2,
                          "upscale": 2},
            "train": {"lr_G": 1e-4, "niter": 4, "pixel_criterion": "l1",
                      "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                      "lr_steps": [100]},
            "logger": {"print_freq": 2, "save_checkpoint_freq": 2,
                       "tensorboard": False}}
    exp = _run(base, "resume")
    state_dir = os.path.join(exp, "training_state")
    assert any(f for f in os.listdir(state_dir))

    # second run: resume and extend to niter=8 (config edits like a
    # longer schedule apply on resume - functional LR schedules)
    cfg2 = dict(base)
    cfg2["train"] = dict(base["train"], niter=8)
    cfg2["path"] = {"root": ROOT, "resume_state": state_dir}
    p = os.path.join(ROOT, "resume2.yml")
    cfg2["name"] = "debug_resume"
    with open(p, "w") as f:
        yaml.safe_dump(cfg2, f)
    train_cli.main(["-opt", p])
    models = os.listdir(os.path.join(exp, "models"))
    assert any(m.startswith("8_") or m == "latest_G.ckpt" for m in models), \
        models
