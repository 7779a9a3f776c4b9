"""Spatial (band) parallelism for inference — the multi-chip scale-out of
the reference's tiled big-image path (ref codes/models/sr_model.py
test_chop:319, dataops/common.py extract_patches_2d:575).

SURVEY.md §2.9 maps the reference's missing SP/CP axis to *spatial tiling*
as the long-context analogue (§5). This module makes that axis real on a
device mesh: a large image is split into horizontal bands sharded over a
named mesh axis (``sp``); each device exchanges ``halo`` edge rows with
its neighbours over ICI via ``lax.ppermute``, runs the full network on its
band + halos, and crops the halo region away. The result lives sharded
over the mesh (assemble on host only if needed).

Numerics: for any band interior further than the network's effective
receptive field from an *image* boundary, outputs are exactly equal to
single-device inference whenever ``halo >= receptive field`` — band seams
are exact, not blended (unlike overlap-averaged chop). At the image's
outer rows the top/bottom devices see explicit zero halos where a single
device would apply per-conv zero padding progressively; the difference is
confined to the outer ``receptive-field - 1`` rows (a conv window at the
boundary reaches real image rows, so halo rows become nonzero after one
layer) and is the same class of border effect every tiled inference
scheme has (gated in tests/test_spatial_parallel.py).

Why bands and not per-conv halo exchange: one exchange per *network call*
(2 ppermutes) instead of one per conv (hundreds for RRDB23); the halo
recompute overhead is ``2*halo/band_h`` — a few percent for real band
heights — while every conv stays a full-width NHWC GEMM on the MXU.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_spatial_mesh(n: Optional[int] = None, axis: str = "sp") -> Mesh:
    """1-D mesh over ``n`` (default: all) devices for band parallelism."""
    import numpy as np

    devices = jax.devices()[: (n or len(jax.devices()))]
    return Mesh(np.asarray(devices), (axis,))


def spatial_infer(apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
                  lr_img: jnp.ndarray,
                  mesh: Mesh,
                  axis: str = "sp",
                  halo: int = 16,
                  scale: int = 1,
                  assemble: bool = True) -> jnp.ndarray:
    """Run ``apply_fn`` over ``lr_img`` with height sharded over ``axis``.

    apply_fn: collective-free (b, h, w, c) -> (b, h*scale, w*scale, c')
              network forward (already closed over params).
    lr_img:   NHWC batch; H is padded up to a multiple of the axis size
              (zero rows at the bottom, cropped from the output).
    halo:     rows exchanged with each neighbour; must be >= the network's
              effective receptive-field radius for exact band seams and
              <= the per-device band height.
    assemble: device_get-free resharding of the output to a replicated
              layout when True; False returns the band-sharded array
              (preferred when the caller reduces it on device).
    """
    n = mesh.shape[axis]
    b, h, w, c = lr_img.shape
    pad = (-h) % n
    if pad:
        lr_img = jnp.pad(lr_img, ((0, 0), (0, pad), (0, 0), (0, 0)))
    band = (h + pad) // n
    if halo > band:
        raise ValueError(f"halo {halo} > band height {band}; "
                         f"use fewer shards or a larger image")
    if n == 1:
        out = apply_fn(lr_img)
        return out[:, : h * scale] if pad else out

    fwd = [(i, i + 1) for i in range(n - 1)]   # bottom rows -> next band
    bwd = [(i, i - 1) for i in range(1, n)]    # top rows -> previous band

    def band_fn(x):
        # x: (b, band, w, c) local block. Fetch my top halo (= neighbour
        # above's bottom rows) and bottom halo (= neighbour below's top
        # rows); devices at the image boundary receive zeros, mirroring
        # zero padding at the true image edge.
        top = lax.ppermute(x[:, band - halo:], axis, fwd)
        bot = lax.ppermute(x[:, :halo], axis, bwd)
        y = apply_fn(jnp.concatenate([top, x, bot], axis=1))
        hs = halo * scale
        return y[:, hs: hs + band * scale]

    sharded = shard_map(band_fn, mesh=mesh,
                        in_specs=P(None, axis),
                        out_specs=P(None, axis))
    out = sharded(jax.device_put(lr_img, NamedSharding(mesh, P(None, axis))))
    out = out[:, : h * scale]
    if assemble:
        out = jax.device_put(out, NamedSharding(mesh, P()))
    return out


def receptive_radius(n_convs_3x3: int, scale: int = 1) -> int:
    """Conservative receptive-field radius in *input* rows for a plain
    stack of ``n_convs_3x3`` SAME 3x3 convs (radius 1 each). Upsampling
    layers at the end don't widen the input-space field.

    For deep residual nets this bound is USELESS as halo guidance (the
    flagship RRDB23 has ~170 3x3 convs — larger than any practical band
    height) because the *effective* field is far smaller: RDB residual
    scaling (x0.2 per block, ref RRDBNet_arch.py:98) makes long conv
    paths geometrically weak. Use :func:`effective_radius` to MEASURE
    the decay on the actual network/weights, and pick
    ``halo >= effective_radius(..., rtol=<seam tolerance>)``.
    Measured flagship table: docs/performance.md round 5 + the gate in
    tests/test_spatial_parallel.py.
    """
    del scale
    return n_convs_3x3


def effective_radius(apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
                     x: jnp.ndarray,
                     rtol: float = 1e-4,
                     scale: int = 1,
                     delta: float = 0.5) -> int:
    """Measured effective receptive radius of ``apply_fn`` at input ``x``:
    perturb the center input row by ``delta`` and return the largest row
    distance (in input rows) at which any output pixel moves by more than
    ``rtol * max-row-movement``. ``halo >= effective_radius(...)`` bounds
    band-seam error at the same relative level (the halo cut discards
    exactly the rows a perturbation from outside the halo could reach).

    Runs two forwards on the given input — cheap enough to call once at
    setup on a representative crop. The result depends on the WEIGHTS
    (trained RDBs pass more energy than the kaiming x0.1 init), so
    measure on the checkpoint you serve.
    """
    b, h, w, c = x.shape
    row = h // 2
    x2 = x.at[:, row].add(delta)
    y1 = apply_fn(x)
    y2 = apply_fn(x2)
    d = jnp.abs(y2 - y1).max(axis=(0, 2, 3))  # per output row
    d = np.asarray(d)
    peak = float(d.max())
    if peak == 0.0:
        return 0
    hot = np.nonzero(d > rtol * peak)[0]
    out_row = row * scale + (scale - 1) / 2
    reach = max(abs(hot[0] - out_row), abs(hot[-1] - out_row))
    return int(np.ceil(reach / scale))
