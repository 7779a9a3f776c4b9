"""Tests for VSR / DVD / PPON training strategies (SURVEY.md §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_vsr_trainer_sofvsr_with_ofr():
    from trainner_tpu.train.vsr_trainer import VSRTrainer

    opt = {"is_train": True, "scale": 4, "model": "vsr",
           "network_G": {"type": "sofvsr_net", "channels": 32,
                         "n_frames": 3, "img_ch": 3, "scale": 4,
                         "SR_net": "sofvsr"},
           "train": {"lr_G": 1e-4, "niter": 100, "pixel_criterion": "l1",
                     "pixel_weight": 1.0, "ofr_weight": 0.01,
                     "lr_scheme": "MultiStepLR", "lr_steps": [50]}}
    tr = VSRTrainer(opt)
    rng = np.random.default_rng(0)
    batch = {"LR": rng.random((1, 3, 8, 8, 3), np.float32),
             "HR": rng.random((1, 3, 32, 32, 3), np.float32)}
    state = tr.init_state_from_batch(jax.random.PRNGKey(0), batch)
    state, logs = tr.train_step(state, batch)
    assert np.isfinite(float(logs["l_g_total"]))
    assert np.isfinite(float(logs["ofr"]))
    sr = tr.eval_step(state, jnp.asarray(batch["LR"]))
    assert sr.shape == (1, 32, 32, 3)


def test_vsr_trainer_sr3d_plain():
    from trainner_tpu.train.vsr_trainer import VSRTrainer

    opt = {"is_train": True, "scale": 2, "model": "vsr",
           "network_G": {"type": "sr3d_net", "nf": 4, "n_frames": 5,
                         "scale": 2},
           "train": {"lr_G": 1e-4, "niter": 100, "pixel_criterion": "l1",
                     "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                     "lr_steps": [50]}}
    tr = VSRTrainer(opt)
    rng = np.random.default_rng(1)
    batch = {"LR": rng.random((1, 5, 8, 8, 3), np.float32),
             "HR": rng.random((1, 5, 16, 16, 3), np.float32)}
    state = tr.init_state_from_batch(jax.random.PRNGKey(0), batch)
    state, logs = tr.train_step(state, batch)
    assert np.isfinite(float(logs["l_g_total"]))


def test_dvd_trainer():
    from trainner_tpu.train.dvd_trainer import DVDTrainer

    opt = {"is_train": True, "model": "dvd",
           "network_G": {"type": "dvd_net", "nf": 8},
           "train": {"lr_G": 1e-4, "niter": 100, "pixel_criterion": "l1",
                     "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                     "lr_steps": [50]}}
    tr = DVDTrainer(opt)
    rng = np.random.default_rng(2)
    batch = {"in": rng.random((2, 16, 16, 3), np.float32),
             "top": rng.random((2, 16, 16, 3), np.float32),
             "bottom": rng.random((2, 16, 16, 3), np.float32)}
    state = tr.init_state_from_batch(jax.random.PRNGKey(0), batch)
    state, logs = tr.train_step(state, batch)
    assert np.isfinite(float(logs["l_g_total"]))
    top = tr.eval_step(state, jnp.asarray(batch["in"]))
    assert top.shape == (2, 16, 16, 3)


def test_ppon_trainer_phases():
    from trainner_tpu.train.ppon_trainer import PPONTrainer

    opt = {"is_train": True, "scale": 4, "model": "ppon",
           "network_G": {"type": "ppon", "nf": 16, "nb": 2, "upscale": 4},
           "network_D": {"type": "discriminator_vgg", "size": 32,
                         "base_nf": 16},
           "train": {"lr_G": 1e-4, "lr_D": 1e-4, "niter": 100,
                     "pixel_criterion": "l1", "pixel_weight": 1.0,
                     "ssim_type": "ms-ssim", "ssim_weight": 1.0,
                     "gan_type": "vanilla", "gan_weight": 5e-3,
                     "p1_losses": ["pix"], "p2_losses": ["ssim"],
                     "p3_losses": ["pix"], "ppon_stages": [2, 4],
                     "lr_scheme": "MultiStepLR", "lr_steps": [50]}}
    tr = PPONTrainer(opt)
    assert tr.current_phase(0) == 1
    assert tr.current_phase(2) == 2
    assert tr.current_phase(4) == 3
    rng = np.random.default_rng(3)
    batch = {"LR": rng.random((1, 8, 8, 3), np.float32),
             "HR": rng.random((1, 32, 32, 3), np.float32)}
    state = tr.init_state(jax.random.PRNGKey(0), (1, 8, 8, 3),
                          (1, 32, 32, 3))
    # phase 1: only content branch params change
    ssim_before = np.asarray(
        jax.tree.leaves(state.g.params["ssim0"])[0]).copy()
    state, logs = tr.train_step(state, batch)
    assert float(logs["ppon_phase"]) == 1.0
    ssim_after = np.asarray(jax.tree.leaves(state.g.params["ssim0"])[0])
    assert np.allclose(ssim_before, ssim_after)  # frozen in phase 1
    # advance to phase 3 (gan active); sync the host step mirror too
    state = state.replace(step=jnp.asarray(4, jnp.int32))
    tr._host_step = 4
    state, logs = tr.train_step(state, batch)
    assert float(logs["ppon_phase"]) == 3.0
    assert "l_d_total" in logs
    y = tr.eval_step(state, jnp.asarray(batch["LR"]))
    assert y.shape == (1, 32, 32, 3)


def test_sftgan_trainer():
    from trainner_tpu.train.sftgan_trainer import SFTGANTrainer

    opt = {"is_train": True, "scale": 4, "model": "sftgan",
           "network_G": {"type": "sft_arch", "nf": 16, "cond_nf": 8,
                         "n_blocks": 2},
           "train": {"lr_G": 1e-4, "lr_D": 1e-4, "niter": 100,
                     "pixel_criterion": "l1", "pixel_weight": 1.0,
                     "gan_type": "vanilla", "gan_weight": 5e-3,
                     "lr_scheme": "MultiStepLR", "lr_steps": [50]}}
    tr = SFTGANTrainer(opt)
    rng = np.random.default_rng(4)
    batch = {"LR": rng.random((1, 24, 24, 3), np.float32),
             "seg": rng.random((1, 96, 96, 8), np.float32),
             "HR": rng.random((1, 96, 96, 3), np.float32)}
    state = tr.init_state_from_batch(jax.random.PRNGKey(0), batch)
    state, logs = tr.train_step(state, batch)
    assert np.isfinite(float(logs["l_g_total"]))
    assert np.isfinite(float(logs["l_d_cls"]))
    y = tr.eval_step(state, jnp.asarray(batch["LR"]),
                     jnp.asarray(batch["seg"]))
    assert y.shape == (1, 96, 96, 3)


def test_pbr_trainer_multi_map():
    from trainner_tpu.train.pbr_trainer import PBRTrainer

    opt = {"is_train": True, "scale": 2, "model": "pbr",
           "network_G": {"type": "rrdb_net", "nf": 8, "nb": 1, "gc": 4,
                         "upscale": 2},
           "train": {"lr_G": 1e-4, "niter": 100, "pixel_criterion": "l1",
                     "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                     "lr_steps": [50]}}
    tr = PBRTrainer(opt)
    rng = np.random.default_rng(5)
    batch = {"LR_diffuse": rng.random((1, 8, 8, 3), np.float32),
             "HR_diffuse": rng.random((1, 16, 16, 3), np.float32),
             "LR_height": rng.random((1, 8, 8, 1), np.float32),
             "HR_height": rng.random((1, 16, 16, 1), np.float32),
             "LR": rng.random((1, 8, 8, 3), np.float32)}
    state = tr.init_state_from_batch(jax.random.PRNGKey(0), batch)
    state, logs = tr.train_step(state, batch)
    assert np.isfinite(float(logs["l_g_total"]))
    assert any(k.endswith("_diffuse") for k in logs)
    assert any(k.endswith("_height") for k in logs)


def test_vsr_trainer_edvr():
    from trainner_tpu.train.vsr_trainer import VSRTrainer

    opt = {"is_train": True, "scale": 4, "model": "vsr",
           "network_G": {"type": "edvr_net", "num_feat": 8,
                         "num_frame": 3, "deformable_groups": 2,
                         "num_extract_block": 1,
                         "num_reconstruct_block": 1,
                         "center_frame_idx": 1, "upscale": 4},
           "train": {"lr_G": 1e-4, "niter": 100, "pixel_criterion": "cb",
                     "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                     "lr_steps": [50]}}
    tr = VSRTrainer(opt)
    rng = np.random.default_rng(6)
    batch = {"LR": rng.random((1, 3, 8, 8, 3), np.float32),
             "HR": rng.random((1, 3, 32, 32, 3), np.float32)}
    state = tr.init_state_from_batch(jax.random.PRNGKey(0), batch)
    state, logs = tr.train_step(state, batch)
    assert np.isfinite(float(logs["l_g_total"]))
    sr = tr.eval_step(state, jnp.asarray(batch["LR"]))
    assert sr.shape == (1, 32, 32, 3)
