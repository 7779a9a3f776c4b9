"""Checkpoint / resume.

TPU-native replacement for the reference's two-artifact scheme
(ref codes/models/base_model.py: save_network:353 -> {iter}_{name}.pth,
save_training_state:454 -> {iter}.state, resume_training:479; previous-copy
backups :359-361,474-476; `latest` overwrite mode ref train.py:283-295).

Design: the whole functional TrainState (params, optimizer moments,
SWA/EMA averages, rng, step) serializes as one msgpack blob via
flax.serialization — single-writer (process 0) multi-host safe since
params are replicated/addressable; per-network param-only exports keep the
{iter}_{net} naming so tooling (net_interp, model release) stays familiar.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from .logging_utils import sorted_nicely

CKPT_EXT = ".ckpt"
STATE_EXT = ".state"


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _backup(path: str) -> None:
    """Keep a previous_* copy before overwrite (ref base_model.py:359)."""
    if os.path.exists(path):
        d, b = os.path.split(path)
        shutil.copy2(path, os.path.join(d, "previous_" + b))


def save_params(params: Any, path: str, backup: bool = True) -> None:
    """Save one network's params (ref save_network:353)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if backup and os.path.exists(path):
        _backup(path)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(_to_host(params)))


def load_params(path: str, target: Any = None) -> Any:
    """Restore one network's params; when `target` is given and the
    stored tree uses the other RRDB-trunk layout (unrolled RRDB{i} vs
    scan-stacked RRDBs — models/rrdb.py scan_blocks), the checkpoint is
    converted to the target's layout before restoring."""
    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    try:
        return serialization.from_bytes(target, data)
    except (ValueError, KeyError):
        raw = serialization.msgpack_restore(data)
        converted = _adapt_rrdb_layout(raw, target)
        if converted is raw:
            raise
        return serialization.from_state_dict(target, converted)


def _adapt_rrdb_layout(raw: Any, target: Any) -> Any:
    """Stack/unstack the RRDB trunk subtree to match the target layout."""
    from ..models.rrdb import stack_rrdb_params, unstack_rrdb_params

    changed = [False]

    def fix(node, tgt):
        if not (isinstance(node, dict) and isinstance(tgt, dict)):
            return node
        has_unrolled = any(k.startswith("RRDB") and k[4:].isdigit()
                           for k in node)
        if "RRDBs" in tgt and has_unrolled:
            node = stack_rrdb_params(node)
            changed[0] = True
        elif "RRDBs" in node and "RRDBs" not in tgt:
            node = unstack_rrdb_params(node)
            changed[0] = True
        return {k: fix(v, tgt.get(k)) if isinstance(v, dict) else v
                for k, v in node.items()}

    tgt_sd = serialization.to_state_dict(target)
    fixed = fix(raw, tgt_sd)
    return fixed if changed[0] else raw


def save_state(state: Any, path: str, epoch: int = 0,
               backup: bool = True) -> None:
    """Save the full TrainState + a JSON sidecar with {epoch, iter}
    (ref save_training_state:454)."""
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if backup and os.path.exists(path):
        _backup(path)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(_to_host(state)))
    meta = {"epoch": int(epoch), "iter": int(state.step)}
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_state(path: str, target: Any):
    """Restore a TrainState in-place-shape onto `target`; returns
    (state, meta) (ref resume_training:479)."""
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    meta = {"epoch": 0, "iter": int(state.step)}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta


def _state_iter(state_dir: str, fname: str) -> int:
    """Iteration number a .state file represents: parsed from the numeric
    stem, else from the JSON sidecar (covers 'latest.state'), else -1."""
    stem = fname[: -len(STATE_EXT)]
    if stem.isdigit():
        return int(stem)
    sidecar = os.path.join(state_dir, fname + ".json")
    if os.path.exists(sidecar):
        try:
            with open(sidecar) as f:
                return int(json.load(f).get("iter", -1))
        except (ValueError, OSError, json.JSONDecodeError):
            return -1
    return -1


def latest_state_path(state_dir: str) -> Optional[str]:
    """Find the newest .state file in a dir (ref train.py:85-100).

    Selects by the iteration each file actually represents — NOT by name
    sort, which would rank 'previous_*' backups (written by the
    SIGTERM/preemption path) above 'latest.state'/'10000.state' and roll
    training back on auto-resume. 'previous_*' backups are excluded; among
    equal iters the most recently modified file wins.
    """
    if not os.path.isdir(state_dir):
        return None
    states = [f for f in os.listdir(state_dir)
              if f.endswith(STATE_EXT) and not f.startswith("previous_")]
    if not states:
        return None
    best = max(states, key=lambda f: (
        _state_iter(state_dir, f),
        os.path.getmtime(os.path.join(state_dir, f))))
    return os.path.join(state_dir, best)


def save_checkpoint(state: Any, opt: dict, epoch: int, niter: int,
                    latest_only: bool = False,
                    swa_extra: Optional[dict] = None) -> None:
    """Save per-network params + full training state
    (ref train.py:283-296 + base_model.save/save_training_state).

    Single-writer: only process 0 writes (params are replicated across
    hosts), matching the module docstring and save_state's guard.
    """
    if jax.process_index() != 0:
        return
    model_dir = opt["path"]["models"]
    state_dir = opt["path"]["training_state"]
    tag = "latest" if latest_only else str(niter)
    if hasattr(state, "named_params"):
        # multi-net states (cyclegan G_A/G_B/D_A/D_B, wbc D_S/D_T)
        for net_name, params in state.named_params().items():
            save_params(params, os.path.join(
                model_dir, f"{tag}_{net_name}{CKPT_EXT}"))
        save_state(state, os.path.join(state_dir, f"{tag}{STATE_EXT}"),
                   epoch=epoch)
        return
    save_params(state.g.params, os.path.join(model_dir, f"{tag}_G{CKPT_EXT}"))
    if getattr(state, "d", None) is not None:
        save_params(state.d.params,
                    os.path.join(model_dir, f"{tag}_D{CKPT_EXT}"))
    if getattr(state, "swa_params", None) is not None:
        swa_tree = state.swa_params
        if swa_extra:
            # BN running stats refreshed for the averaged weights
            # (ref base_model.py:180 update_bn on SWA save)
            swa_tree = {"params": state.swa_params, **swa_extra}
        save_params(swa_tree,
                    os.path.join(model_dir, f"{tag}_swaG{CKPT_EXT}"))
    if getattr(state, "ema_params", None) is not None:
        save_params(state.ema_params,
                    os.path.join(model_dir, f"{tag}_emaG{CKPT_EXT}"))
    save_state(state, os.path.join(state_dir, f"{tag}{STATE_EXT}"),
               epoch=epoch)


# ---------------------------------------------------------------------------
# orbax backend (opt-in): async, multi-host-coordinated checkpointing for
# production pods — the msgpack path above stays the default (simple,
# dependency-light, identical artifacts to the reference's layout).
# ---------------------------------------------------------------------------


def save_state_orbax(state: Any, directory: str, step: int) -> None:
    """Write the TrainState with orbax (per-shard, multi-host safe)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(directory), str(step)),
               _to_host(state), force=True)


def load_state_orbax(directory: str, step: int, target: Any):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.join(os.path.abspath(directory), str(step)),
        item=_to_host(target))
    return jax.tree.map(lambda t, r: jnp_like(t, r), target, restored)


def jnp_like(template, value):
    import jax.numpy as jnp

    return jnp.asarray(value) if hasattr(template, "dtype") else value
