"""Debug / introspection utilities.

Equivalents of ref codes/dataops/debug.py: describe_numpy:12,
describe_tensor:40 (shape/dtype/range/moment summaries), tmp_vis:94
(dump a tensor batch to image files for eyeballing), diagnose_network:211
(gradient-magnitude probe), timefunctions:72 (micro-bench helper) — plus
TPU-first additions: a jax.profiler trace context and a NaN/Inf guard
(the jax counterpart of torch.autograd.set_detect_anomaly, ref
train.py:482-484).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Callable, Dict, Optional

import numpy as np


def describe_array(x, name: str = "array") -> str:
    """Shape/dtype/stats one-liner (ref describe_numpy:12 /
    describe_tensor:40; works for numpy and jax arrays)."""
    a = np.asarray(x)
    finite = a[np.isfinite(a)] if a.size else a
    stats = (f"min={finite.min():.4g} max={finite.max():.4g} "
             f"mean={finite.mean():.4g} std={finite.std():.4g}"
             if finite.size else "all-nonfinite")
    n_bad = int(a.size - np.isfinite(a).sum())
    bad = f" NONFINITE={n_bad}" if n_bad else ""
    return f"{name}: shape={tuple(a.shape)} dtype={a.dtype} {stats}{bad}"


def tmp_vis(x, save_dir: str = "/tmp/trainner_tpu_vis",
            name: str = "vis") -> str:
    """Dump an NHWC (or HWC) tensor batch as PNGs (ref tmp_vis:94)."""
    from ..data.common import save_img, tensor2img

    os.makedirs(save_dir, exist_ok=True)
    a = np.asarray(x)
    if a.ndim == 3:
        a = a[None]
    paths = []
    for i, img in enumerate(a):
        p = os.path.join(save_dir, f"{name}_{i}.png")
        save_img(tensor2img(img), p)
        paths.append(p)
    return save_dir


def diagnose_grads(grads: Any) -> Dict[str, float]:
    """Per-top-level-module mean |grad| (ref diagnose_network:211)."""
    import jax

    out = {}
    if isinstance(grads, dict):
        for k, v in grads.items():
            leaves = jax.tree.leaves(v)
            if leaves:
                out[k] = float(np.mean([np.abs(np.asarray(g)).mean()
                                        for g in leaves]))
    return out


def timefunction(fn: Callable, *args, n: int = 10, name: str = "fn",
                 **kwargs) -> float:
    """Micro-bench with device sync (ref timefunctions:72)."""
    import jax

    y = fn(*args, **kwargs)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args, **kwargs)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.2f} ms/call")
    return dt


@contextlib.contextmanager
def profiler_trace(log_dir: str = "/tmp/trainner_tpu_trace"):
    """jax.profiler trace capture (view in tensorboard / xprof) — the
    first-class profiling hook the reference lacks (SURVEY.md §5)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    """Global NaN debugging (jax_debug_nans) — the TPU counterpart of the
    reference's commented anomaly detection (ref train.py:482-484)."""
    import jax

    jax.config.update("jax_debug_nans", enable)
