"""Arbitrary-size inference strategies measured against each other on
one chip (VERDICT r4 #4): for an input whose size doesn't match any
compiled specialization, the framework can

  pad    — round H/W up to a bucket (here 128px), one full forward,
           crop. One compile per BUCKET; wasted compute = padded area.
  chop   — fixed 128px tiles with 16px overlap batched through the net
           (trainer.eval_step_chop, ref sr_model.test_chop:319). ONE
           compile total for any size; overlap recompute + blend.
  exact  — compile a fresh forward at the native size (what torch does
           for free; on XLA each new size pays a full compile).

Spatial (`sp`) band parallelism is the multi-chip member of this family
(parallel/spatial.py); on one chip it has no lane and is measured for
correctness on the CPU mesh instead (tests/test_spatial_parallel.py).

Timing: per-call host-read sync (the relay adds ~20-30 ms/call; with
~100+ ms device forwards this is a bounded overestimate, reported
as-is for all three strategies equally). Usage:
    python scripts/bench_infer_strategies.py [h w] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    from trainner_tpu.train.sr_trainer import SRTrainer
    from trainner_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    scale = 4
    opt = {"is_train": False, "scale": scale,
           "network_G": {"type": "rrdb_net", "nf": 64, "nb": 23,
                         "gc": 32, "upscale": scale,
                         "gaussian_noise": False}}
    tr = SRTrainer(opt, dtype=jnp.bfloat16)
    state = tr.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3),
                                                    np.float32))
    mpx_out = h * w * scale * scale / 1e6

    def timed(name, fn):
        y = fn()  # compile + warm
        ref = np.asarray(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn()
            float(jnp.sum(y))  # host read = true sync through the relay
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:8s} {dt * 1e3:8.1f} ms/img  "
              f"{mpx_out / dt:6.2f} Mpx/s", flush=True)
        return ref

    bucket = 128
    ph = -h % bucket
    pw = -w % bucket

    def run_pad():
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        y = tr.eval_step(state, xp)
        return y[:, : h * scale, : w * scale]

    def run_chop():
        return tr.eval_step_chop(state, x, patch_size=128, overlap=16)

    def run_exact():
        return tr.eval_step(state, x)

    print(f"input 1x{h}x{w} LR -> {h * scale}x{w * scale} "
          f"(pad bucket {bucket}: +{ph}/{pw} rows/cols)", flush=True)
    y_exact = timed("exact", run_exact)
    y_pad = timed("pad", run_pad)
    y_chop = timed("chop", run_chop)
    # numerics: pad matches exact away from the padded border; chop
    # blends overlaps (approximate by design, like the reference's)
    interior = (slice(None), slice(0, (h - 16) * scale),
                slice(0, (w - 16) * scale))
    print(f"pad-vs-exact interior max|d|: "
          f"{np.abs(y_pad[interior] - y_exact[interior]).max():.2e}",
          flush=True)
    print(f"chop-vs-exact max|d|: "
          f"{np.abs(y_chop - y_exact).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
