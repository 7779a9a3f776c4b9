"""Capture a jax.profiler hardware trace of flagship INFERENCE
(4x ESRGAN RRDB23 forward, bf16 — bench.py's bench_infer config) for
scripts/analyze_trace.py (VERDICT r4 #4: inference had no trace or
roofline through round 4).

Usage: python scripts/capture_infer_trace.py [out_dir] [n_steps] [batch]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trainner_itrace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from trainner_tpu.models.networks import define_G
    from trainner_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    opt = {"network_G": {"type": "rrdb_net", "nf": 64, "nb": 23,
                         "gc": 32, "upscale": 4}}
    model = define_G(opt, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    h = w = 128
    x = jnp.asarray(np.random.default_rng(1).random(
        (batch, h, w, 3), np.float32))
    variables = jax.jit(lambda r, z: model.init(
        {"params": r, "noise": r}, z, train=False))(
            rng, jnp.zeros((1, 32, 32, 3)))

    @jax.jit
    def fwd(p, z):
        return model.apply({"params": p}, z, train=False)

    params = variables["params"]

    y = fwd(params, x)
    float(jnp.sum(y))  # warm + true sync through the relay

    jax.profiler.start_trace(out_dir)
    for _ in range(n_steps):
        y = fwd(params, y[:, ::4, ::4, :3].astype(x.dtype))  # data dep
    float(jnp.sum(y))
    jax.profiler.stop_trace()

    hits = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    print(hits[-1] if hits else f"no trace found under {out_dir}")


if __name__ == "__main__":
    main()
