"""Device mesh / sharding layer — the TPU-native replacement for the
reference's single-process ``nn.DataParallel`` (ref codes/models/networks.py
:252-254, codes/data/__init__.py:25-31).

Design (SURVEY.md §2.9, §7.1): a named ``jax.sharding.Mesh`` with two axes:

  * ``data``  — batch (data-parallel) axis; gradients all-reduce over ICI
                implicitly inside the pjit-partitioned train step.
  * ``fsdp``  — optional parameter/optimizer sharding axis (ZeRO-style);
                restoration nets are small (≤ ~17M params) so this defaults
                to 1 and exists for scale-out completeness (multi-host DCN
                meshes, very large batch).

Params are replicated over ``data`` and (optionally) sharded over ``fsdp``
along their largest divisible axis. Batches are sharded over ``data`` on the
leading axis. All collectives are inserted by XLA from these shardings —
no hand-written NCCL-style code, per the scaling-book recipe.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh layout. ``data * fsdp`` must equal the number of devices used."""

    data: int = -1          # -1 = all remaining devices
    fsdp: int = 1
    axis_data: str = "data"
    axis_fsdp: str = "fsdp"


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Build a 2-D ('data','fsdp') device mesh over all (or given) devices."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    fsdp = max(1, cfg.fsdp)
    data = cfg.data if cfg.data > 0 else n // fsdp
    if data * fsdp != n:
        raise ValueError(
            f"mesh {data}x{fsdp} != {n} devices; set MeshConfig explicitly")
    dev_array = np.asarray(devices).reshape(data, fsdp)
    return Mesh(dev_array, (cfg.axis_data, cfg.axis_fsdp))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a batch pytree: leading axis split over the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a host batch pytree sharded over the mesh data axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def _fsdp_spec(x: jnp.ndarray, fsdp_size: int, axis_name: str) -> P:
    """PartitionSpec sharding x's largest divisible dim over the fsdp axis.

    Small leaves (biases, norm scales) stay replicated — sharding them
    wastes collective latency for no memory win.
    """
    if fsdp_size <= 1 or x.ndim == 0 or x.size < 2 ** 16:
        return P()
    dims = list(x.shape)
    order = sorted(range(len(dims)), key=lambda i: dims[i], reverse=True)
    for i in order:
        if dims[i] % fsdp_size == 0:
            spec = [None] * len(dims)
            spec[i] = axis_name
            return P(*spec)
    return P()


def param_sharding(params: Any, mesh: Mesh,
                   axis: str = "fsdp") -> Any:
    """NamedSharding pytree for params: replicated over data, largest-dim
    sharded over the fsdp axis (no-op P() when fsdp size is 1)."""
    size = mesh.shape.get(axis, 1)
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _fsdp_spec(x, size, axis)), params)


def local_batch_slice(global_batch: int, mesh: Mesh,
                      axis: str = "data") -> slice:
    """Per-process slice of the global batch (multi-host input pipeline).

    Each host loads only its shard; with a single process this is the whole
    batch. Mirrors per-host data loading in the pjit recipe.
    """
    n_proc = jax.process_count()
    per = global_batch // max(n_proc, 1)
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
