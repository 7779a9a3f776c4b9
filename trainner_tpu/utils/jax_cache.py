"""Persistent XLA compilation cache.

The axon TPU tunnel compiles remotely (~minutes per program); a persistent
on-disk cache makes every recompile of an unchanged program instant across
processes and rounds. Safe on CPU too. Called by all entry points
(train.py / test.py / bench.py / __graft_entry__).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "TRAINNER_TPU_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))


def enable_compilation_cache(cache_dir: str = None) -> None:
    import jax

    cache_dir = cache_dir or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags
