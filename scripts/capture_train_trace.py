"""Capture a jax.profiler hardware trace of the flagship train step
(4x ESRGAN GAN step, batch 32, 128px HR — bench.py's compute-only loop)
and print the path of the .trace.json.gz for scripts/analyze_trace.py.

Usage: python scripts/capture_train_trace.py [out_dir] [n_steps]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trainner_trace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from trainner_tpu.train.sr_trainer import SRTrainer
    from trainner_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    opt = {
        "is_train": True, "scale": 4,
        "network_G": {"type": "rrdb_net", "nf": 64, "nb": 23, "gc": 32,
                      "upscale": 4},
        "network_D": {"type": "discriminator_vgg", "size": 128,
                      "base_nf": 64},
        "train": {
            "lr_G": 1e-4, "lr_D": 1e-4,
            "pixel_criterion": "l1", "pixel_weight": 1e-2,
            "feature_criterion": "l1", "feature_weight": 1.0,
            "gan_type": "vanilla", "gan_weight": 5e-3,
            "lr_scheme": "MultiStepLR", "lr_steps": [50000],
        },
    }
    trainer = SRTrainer(opt, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    state = trainer.init_state(jax.random.PRNGKey(0), (32, 32, 32, 3))
    batch = {
        "LR": jnp.asarray(rng.random((32, 32, 32, 3), np.float32)),
        "HR": jnp.asarray(rng.random((32, 128, 128, 3), np.float32)),
    }
    for _ in range(3):  # warm
        state, logs = trainer.train_step(state, batch)
    float(logs["l_g_total"])

    jax.profiler.start_trace(out_dir)
    for _ in range(n_steps):
        state, logs = trainer.train_step(state, batch)
    float(logs["l_g_total"])
    jax.profiler.stop_trace()

    hits = sorted(glob.glob(os.path.join(
        out_dir, "plugins", "profile", "*", "*.trace.json.gz")),
        key=os.path.getmtime)
    print("TRACE:", hits[-1] if hits else "none found")


if __name__ == "__main__":
    main()
