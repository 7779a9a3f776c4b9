"""Checkpoint save/load/resume round-trip tests (SURVEY.md §5
checkpoint/resume)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _mini_trainer():
    from trainner_tpu.train.sr_trainer import SRTrainer

    opt = {"is_train": True, "scale": 2,
           "network_G": {"type": "sr_resnet", "nf": 8, "nb": 2,
                         "upscale": 2},
           "train": {"lr_G": 1e-3, "pixel_criterion": "l1",
                     "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                     "lr_steps": [100], "niter": 100}}
    return SRTrainer(opt, dtype=jnp.float32), opt


def _batch(seed=0):
    r = np.random.default_rng(seed)
    return {"LR": r.random((2, 8, 8, 3), np.float32),
            "HR": r.random((2, 16, 16, 3), np.float32)}


def test_state_roundtrip(tmp_path):
    from trainner_tpu.utils.checkpoint import load_state, save_state

    tr, _ = _mini_trainer()
    state = tr.init_state(jax.random.PRNGKey(0), (2, 8, 8, 3))
    for _ in range(3):
        state, _ = tr.train_step(state, _batch())
    p = str(tmp_path / "3.state")
    save_state(state, p, epoch=1)
    template = tr.init_state(jax.random.PRNGKey(1), (2, 8, 8, 3))
    restored, meta = load_state(p, template)
    assert meta["epoch"] == 1 and meta["iter"] == 3
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert np.allclose(np.asarray(a), np.asarray(b)), "state mismatch"


def test_resume_continues_identically(tmp_path):
    """save -> load -> continued steps match uninterrupted training."""
    from trainner_tpu.utils.checkpoint import load_state, save_state

    tr, _ = _mini_trainer()
    state = tr.init_state(jax.random.PRNGKey(0), (2, 8, 8, 3))
    state, _ = tr.train_step(state, _batch(0))
    p = str(tmp_path / "ck.state")
    save_state(state, p)

    # uninterrupted: two more steps
    s_direct = state
    s_direct, _ = tr.train_step(s_direct, _batch(1))
    s_direct, _ = tr.train_step(s_direct, _batch(2))

    # resumed: fresh trainer (new host-step mirror), load, same two steps
    tr2, _ = _mini_trainer()
    template = tr2.init_state(jax.random.PRNGKey(9), (2, 8, 8, 3))
    s_res, _ = load_state(p, template)
    s_res, _ = tr2.train_step(s_res, _batch(1))
    s_res, _ = tr2.train_step(s_res, _batch(2))

    for a, b in zip(jax.tree.leaves(s_direct.g.params),
                    jax.tree.leaves(s_res.g.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_save_checkpoint_artifacts(tmp_path):
    from trainner_tpu.utils.checkpoint import (latest_state_path,
                                               load_params,
                                               save_checkpoint)

    tr, _ = _mini_trainer()
    state = tr.init_state(jax.random.PRNGKey(0), (2, 8, 8, 3))
    opt = {"path": {"models": str(tmp_path / "models"),
                    "training_state": str(tmp_path / "training_state")}}
    save_checkpoint(state, opt, epoch=0, niter=5)
    assert os.path.exists(str(tmp_path / "models" / "5_G.ckpt"))
    assert os.path.exists(str(tmp_path / "training_state" / "5.state"))
    # previous_* backup on overwrite
    save_checkpoint(state, opt, epoch=0, niter=5)
    assert os.path.exists(str(tmp_path / "models" / "previous_5_G.ckpt"))
    assert latest_state_path(str(tmp_path / "training_state")).endswith(
        "5.state")
    params = load_params(str(tmp_path / "models" / "5_G.ckpt"),
                         state.g.params)
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(state.g.params)):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_orbax_backend_roundtrip(tmp_path):
    """Opt-in orbax backend (multi-host-safe per-shard writes) roundtrips
    a TrainState."""
    pytest.importorskip("orbax.checkpoint")
    import jax
    import numpy as np

    from trainner_tpu.train.sr_trainer import SRTrainer
    from trainner_tpu.utils.checkpoint import (load_state_orbax,
                                               save_state_orbax)

    opt = {"is_train": True, "scale": 2,
           "network_G": {"type": "sr_resnet", "nf": 8, "nb": 2,
                         "upscale": 2},
           "train": {"lr_G": 1e-4, "niter": 100, "pixel_criterion": "l1",
                     "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                     "lr_steps": [50]}}
    tr = SRTrainer(opt)
    state = tr.init_state(jax.random.PRNGKey(0), (2, 8, 8, 3))
    rng = np.random.default_rng(0)
    batch = {"LR": rng.random((2, 8, 8, 3), np.float32),
             "HR": rng.random((2, 16, 16, 3), np.float32)}
    state, _ = tr.train_step(state, batch)
    save_state_orbax(state, str(tmp_path / "orbax"), 1)
    restored = load_state_orbax(str(tmp_path / "orbax"), 1, state)
    a = jax.tree.leaves(state.g.params)[0]
    b = jax.tree.leaves(restored.g.params)[0]
    assert np.array_equal(np.asarray(a), np.asarray(b))
    # training continues identically from the restored state
    s1, l1 = tr.train_step(state, batch)
    s2, l2 = tr.train_step(restored, batch)
    assert np.allclose(float(l1["l_g_total"]), float(l2["l_g_total"]))


def test_latest_state_path_ignores_backups_and_ranks_by_iter(tmp_path):
    """Auto-resume must pick the state representing the highest iteration:
    'previous_*' preemption backups are excluded, and 'latest.state' ranks
    by its JSON sidecar iter rather than lexically (ADVICE r1 high)."""
    import json

    from trainner_tpu.utils.checkpoint import latest_state_path

    d = tmp_path / "training_state"
    d.mkdir()
    for name, it in (("10000.state", 10000), ("2000.state", 2000),
                     ("latest.state", 12000),
                     ("previous_latest.state", 11000),
                     ("previous_10000.state", 9000)):
        (d / name).write_bytes(b"x")
        (d / (name + ".json")).write_text(json.dumps({"iter": it}))
    # latest.state carries the newest iter via its sidecar
    assert latest_state_path(str(d)).endswith("/latest.state")
    # numbered iters beat a stale latest
    (d / "latest.state.json").write_text(json.dumps({"iter": 500}))
    assert latest_state_path(str(d)).endswith("/10000.state")
    # previous_* never wins, even when it sorts last lexically
    (d / "10000.state").unlink()
    (d / "2000.state").unlink()
    (d / "latest.state").unlink()
    assert latest_state_path(str(d)) is None
