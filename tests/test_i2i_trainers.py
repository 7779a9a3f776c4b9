"""Smoke/shape tests for the image-to-image training strategies
(pix2pix / CycleGAN / WBC — SURVEY.md §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _batch(rng, n=2, size=32):
    r = np.random.default_rng(rng)
    return {"A": r.random((n, size, size, 3), np.float32),
            "B": r.random((n, size, size, 3), np.float32)}


def test_pix2pix_trainer_step():
    from trainner_tpu.train.pix2pix_trainer import Pix2PixTrainer

    opt = {"is_train": True, "model": "pix2pix",
           "network_G": {"type": "unet_net", "num_downs": 5, "ngf": 8},
           "network_D": {"type": "patchgan", "ndf": 8, "n_layers": 2},
           "train": {"lr_G": 2e-4, "lr_D": 2e-4, "gan_type": "vanilla",
                     "gan_weight": 1.0, "pixel_criterion": "l1",
                     "pixel_weight": 100.0, "lr_scheme": "MultiStepLR",
                     "lr_steps": [100], "niter": 100}}
    tr = Pix2PixTrainer(opt)
    batch = _batch(0)
    state = tr.init_state_from_batch(jax.random.PRNGKey(0), batch)
    state, logs = tr.train_step(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(logs["l_g_total"]))
    assert np.isfinite(float(logs["l_d_total"]))
    y = tr.eval_step(state, jnp.asarray(batch["A"]))
    assert y.shape == batch["A"].shape


def test_cyclegan_trainer_step():
    from trainner_tpu.train.cyclegan_trainer import CycleGANTrainer

    opt = {"is_train": True, "model": "cyclegan", "pool_size": 8,
           "network_G": {"type": "resnet_net", "n_blocks": 1, "ngf": 8},
           "network_D": {"type": "patchgan", "ndf": 8, "n_layers": 1},
           "train": {"lr_G": 2e-4, "lr_D": 2e-4, "gan_type": "lsgan",
                     "gan_weight": 1.0, "lambda_A": 10.0, "lambda_B": 10.0,
                     "lambda_identity": 0.5, "lr_scheme": "MultiStepLR",
                     "lr_steps": [100], "niter": 100}}
    tr = CycleGANTrainer(opt)
    batch = _batch(1)
    state = tr.init_state_from_batch(jax.random.PRNGKey(0), batch)
    state, logs = tr.train_step(state, batch)
    assert int(state.step) == 1
    for k in ("l_cycle", "l_idt", "l_g_gan_A", "l_d_A", "l_d_B"):
        assert np.isfinite(float(logs[k])), k
    names = state.named_params()
    assert set(names) == {"G_A", "G_B", "D_A", "D_B"}
    y = tr.eval_step(state, jnp.asarray(batch["A"]))
    assert y.shape == batch["A"].shape


def test_wbc_trainer_step():
    from trainner_tpu.train.wbc_trainer import WBCTrainer

    opt = {"is_train": True, "model": "wbc", "pool_size": 8,
           "network_G": {"type": "wbcunet_net", "nf": 8},
           "network_D": {"type": "patchgan", "ndf": 8, "n_layers": 1},
           "train": {"lr_G": 2e-4, "lr_D": 2e-4, "gan_type": "lsgan",
                     "gan_weight": 1.0, "pixel_criterion": "l1",
                     "pixel_weight": 1.0, "tv_type": "tv", "tv_norm": 1,
                     "tv_weight": 1e-5, "cont_losses": ["pix"],
                     "struct_losses": ["pix"], "reg_losses": ["tv"],
                     "lr_scheme": "MultiStepLR", "lr_steps": [100],
                     "niter": 100}}
    tr = WBCTrainer(opt)
    batch = _batch(2)
    state = tr.init_state_from_batch(jax.random.PRNGKey(0), batch)
    state, logs = tr.train_step(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(logs["l_g_total"]))
    assert np.isfinite(float(logs["l_d_S"]))
    assert np.isfinite(float(logs["l_d_T"]))
    y = tr.eval_step(state, jnp.asarray(batch["A"]))
    assert y.shape == batch["A"].shape


def test_wbc_trainer_exact_host_superpixels():
    """sp_exact: true routes the structure representation through the
    host-exact superpixels (felzenszwalb + reduction) via pure_callback
    inside the jitted G step (ref wbc_model.py:44-58 defaults)."""
    from trainner_tpu.train.wbc_trainer import WBCTrainer

    opt = {"is_train": True, "model": "wbc", "pool_size": 8,
           "network_G": {"type": "wbcunet_net", "nf": 8},
           "network_D": {"type": "patchgan", "ndf": 8, "n_layers": 1},
           "train": {"lr_G": 2e-4, "lr_D": 2e-4, "gan_type": "lsgan",
                     "gan_weight": 1.0, "pixel_criterion": "l1",
                     "pixel_weight": 1.0, "cont_losses": ["pix"],
                     "struct_losses": ["pix"], "reg_losses": [],
                     "sp_exact": True, "sp_n_segments": 12,
                     "sp_algo": "sk_felzenszwalb",
                     "sp_reduction": "rag", "sp_max_size": 24,
                     "lr_scheme": "MultiStepLR", "lr_steps": [100],
                     "niter": 100}}
    tr = WBCTrainer(opt)
    assert tr.sp_exact
    batch = _batch(2)
    state = tr.init_state_from_batch(jax.random.PRNGKey(0), batch)
    state, logs = tr.train_step(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(logs["l_g_total"]))


def test_slic_superpixel_flattens():
    from trainner_tpu.ops.superpixel import slic_segment_mean

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 32, 32, 3))
    sp = slic_segment_mean(x, n_segments=16, n_iter=3)
    assert sp.shape == x.shape
    # segment-mean image has far fewer distinct colors than the input
    ux = len(np.unique(np.asarray(x[0]).reshape(-1, 3), axis=0))
    usp = len(np.unique(np.round(np.asarray(sp[0]).reshape(-1, 3), 5),
                        axis=0))
    assert usp < ux / 4


def test_image_pool_mixes_history():
    from trainner_tpu.utils.image_pool import ImagePool

    pool = ImagePool(4, seed=0)
    first = np.ones((4, 2, 2, 1), np.float32)
    out1 = pool.query(first)
    assert np.allclose(out1, first)  # fills the pool untouched
    second = np.zeros((4, 2, 2, 1), np.float32)
    out2 = pool.query(second)
    # some returned images should come from history (ones)
    assert out2.sum() > 0
