"""Device mesh / sharding layer — the TPU-native replacement for the
reference's single-process ``nn.DataParallel`` (ref codes/models/networks.py
:252-254, codes/data/__init__.py:25-31).

Design (SURVEY.md §2.9, §7.1): a named ``jax.sharding.Mesh`` with up to
three axes:

  * ``data``   — batch (data-parallel) axis; gradients all-reduce over ICI
                 implicitly inside the pjit-partitioned train step.
  * ``fsdp``   — optional parameter/optimizer sharding axis (ZeRO-style);
                 restoration nets are small (≤ ~17M params) so this defaults
                 to 1 and exists for scale-out completeness (multi-host DCN
                 meshes, very large batch).
  * ``tensor`` — optional tensor-parallel axis (Megatron-style for convs):
                 every large kernel's OUTPUT-channel dim is sharded over
                 ``tensor``, so each device computes a channel slice of
                 every conv; GSPMD inserts the activation all-gathers /
                 cotangent psums. Exists for nets whose per-layer state or
                 activation footprint outgrows one chip's HBM (e.g. very
                 wide SOFVSR/EDVR variants, big-batch VGG-D at high res).

Params are replicated over ``data``, sharded over ``tensor`` on the output
channel, and (optionally) over ``fsdp`` along their largest remaining
divisible axis. Batches are sharded over ``data`` on the leading axis. All
collectives are inserted by XLA from these shardings — no hand-written
NCCL-style code, per the scaling-book recipe. A fourth scale axis — spatial
band parallelism with explicit ppermute halo exchange — lives in
``parallel/spatial.py``.
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
    """Mesh layout. ``data * fsdp * tensor`` must equal the device count."""

    data: int = -1          # -1 = all remaining devices
    fsdp: int = 1
    tensor: int = 1
    axis_data: str = "data"
    axis_fsdp: str = "fsdp"
    axis_tensor: str = "tensor"


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Build a ('data','fsdp'[,'tensor']) device mesh over all (or given)
    devices. The tensor axis is only materialized when ``tensor > 1`` so
    existing 2-axis specs / cached programs are untouched by default.

    Axis order puts ``tensor`` innermost (fastest-varying over the device
    array) so tensor-parallel collectives ride adjacent-chip ICI links."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    fsdp = max(1, cfg.fsdp)
    tensor = max(1, cfg.tensor)
    data = cfg.data if cfg.data > 0 else n // (fsdp * tensor)
    if data * fsdp * tensor != n:
        raise ValueError(
            f"mesh {data}x{fsdp}x{tensor} != {n} devices; "
            "set MeshConfig explicitly")
    if tensor > 1:
        dev_array = np.asarray(devices).reshape(data, fsdp, tensor)
        return Mesh(dev_array,
                    (cfg.axis_data, cfg.axis_fsdp, cfg.axis_tensor))
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


def _param_spec(x: jnp.ndarray, fsdp_size: int, fsdp_axis: str,
                tp_size: int, tp_axis: str,
                min_size: int = 2 ** 16, is_kernel: bool = True) -> P:
    """PartitionSpec composing tensor and fsdp sharding for one leaf.

    ``tensor`` takes the LAST dim of KERNEL leaves only (a flax conv/dense
    kernel's output channels — Megatron-style weight-stationary split:
    each device owns a cout slice, computes the full cin reduction for it,
    and GSPMD all-gathers the channel-sharded activation where the next op
    needs it whole). Non-kernel ndim>=2 leaves (embedding-style tables,
    stacked stats) fall through to fsdp — their trailing dim is not an
    output-channel dim, so a tensor split would be semantically wrong.
    ``fsdp`` then takes the largest remaining divisible dim.

    Small leaves (biases, norm scales) stay replicated — sharding them
    wastes collective latency for no memory win.

    A leaf is never sharded over BOTH axes: doubly-sharding a conv kernel
    (cin over fsdp + cout over tensor) produced a deterministic ~1e-3
    output deviation from the XLA SPMD partitioner in testing (fsdp-only
    and tensor-only are both exact to ~1e-7 vs single-device), so
    tensor-sharded leaves skip fsdp — they are already split tp_size-ways.
    """
    if x.ndim == 0 or x.size < min_size:
        return P()
    spec: list = [None] * x.ndim
    if (tp_size > 1 and is_kernel and x.ndim >= 2
            and x.shape[-1] % tp_size == 0):
        spec[-1] = tp_axis
        return P(*spec)
    if fsdp_size > 1:
        order = sorted(range(x.ndim), key=lambda i: x.shape[i],
                       reverse=True)
        for i in order:
            if x.shape[i] % fsdp_size == 0:
                spec[i] = fsdp_axis
                break
    if all(s is None for s in spec):
        return P()  # normalize: replicated leaves compare equal to P()
    return P(*spec)


def _leaf_key_name(path) -> str:
    """Final key name of a tree path ('kernel', 'bias', ...)."""
    if not path:
        return ""
    k = path[-1]
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def param_sharding(params: Any, mesh: Mesh, axis: str = "fsdp",
                   tensor_axis: str = "tensor",
                   min_size: int = 2 ** 16) -> Any:
    """NamedSharding pytree for params: replicated over data, kernel
    output channels over the tensor axis (when the mesh has one), largest
    remaining dim over the fsdp axis (no-op P() when both sizes are 1).

    The tensor branch is path-gated to leaves literally named 'kernel'
    (flax conv/dense weights; optax moment trees mirror the same names)
    so non-weight 2-D state can never be silently mis-sharded as
    tensor-parallel."""
    fsdp_size = mesh.shape.get(axis, 1)
    tp_size = mesh.shape.get(tensor_axis, 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, _param_spec(
            x, fsdp_size, axis, tp_size, tensor_axis, min_size,
            is_kernel=_leaf_key_name(path) == "kernel")), params)


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
