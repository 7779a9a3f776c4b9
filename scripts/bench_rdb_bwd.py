"""TPU benchmark: the three exact backward graphs of the packed 5C chain
(models/rrdb._rdb5c_fused_bwd):

  packed — round-2/3: per-stage joint conv-vjps; cotangent concats
           (~36 MB/RDB of copies) + 32-wide dx conv outputs.
  dual   — round-4: scatter-to-past dx (192..64-wide transposed convs,
           zero cotangent concats) + exact per-stage dW off one
           cotangent canvas.
  dualsq — dual dx + ONE full-square dW correlation (~38% discarded
           FLOPs, zero suffix-slice copies).

Times grad-through-a-chain at the flagship shape (the RRDB trunk's real
usage — ref RRDBNet_arch.py:98 chains 5C blocks 3x per RRDB, nb x per
trunk) and checks on-hardware numerics across modes.

Usage: python scripts/bench_rdb_bwd.py [--blocks N] [--iters N] [--f32]
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _build_chain(dt, nf, gc, nblk, rng):
    x = jnp.asarray(rng.standard_normal((32, 32, 32, nf)), dt) * 0.1
    flat = []
    for _ in range(nblk):
        ws = [jnp.asarray(rng.standard_normal(
            (3, 3, nf + k * gc, gc if k < 4 else nf)) * 0.03, jnp.float32)
            for k in range(5)]
        bs = [jnp.asarray(rng.standard_normal(
            (gc if k < 4 else nf,)) * 0.01, jnp.float32) for k in range(5)]
        flat.append([v for pair in zip(ws, bs) for v in pair])
    return x, flat


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=12)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from trainner_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    dt = jnp.float32 if args.f32 else jnp.bfloat16
    nf, gc = 64, 32
    rng = np.random.default_rng(0)
    x, flat = _build_chain(dt, nf, gc, args.blocks, rng)
    print(f"platform={jax.devices()[0].platform} blocks={args.blocks} "
          f"dtype={dt.__name__}")

    results = {}
    for mode in ("dual", "dualsq", "packed"):
        os.environ["TRAINNER_RDB_BWD"] = mode
        import trainner_tpu.models.rrdb as rrdb_mod

        # env var is read at trace time inside _rdb5c_fused_bwd; a fresh
        # jit closure per mode forces a retrace
        rdb5c_fused = rrdb_mod.rdb5c_fused

        def chain(x, params):
            for fw in params:
                x = rdb5c_fused(dt, nf, gc, x, *fw)
            return x

        def loss(x, params):
            return jnp.sum(chain(x, params).astype(jnp.float32) ** 2)

        grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        t0 = time.perf_counter()
        val, (gx, gp) = grad_fn(x, flat)
        sync = float(val) + float(jnp.sum(gx.astype(jnp.float32)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            val, (gx, gp) = grad_fn(x, flat)
        _ = float(val) + float(jnp.sum(gx.astype(jnp.float32)))
        dt_s = (time.perf_counter() - t0) / args.iters
        results[mode] = (dt_s, val, gx, gp)
        print(f"{mode:>7}: {dt_s * 1e3:8.2f} ms/grad-chain "
              f"({dt_s / args.blocks * 1e3:.3f} ms/block)  "
              f"[compile {compile_s:.0f}s]")

    # cross-mode numerics (same math, hardware): worst relative delta
    ref = results["packed"]
    for mode in ("dual", "dualsq"):
        r = results[mode]
        dv = abs(float(r[1]) - float(ref[1])) / max(abs(float(ref[1])), 1e-8)
        dgx = float(jnp.max(jnp.abs(r[2].astype(jnp.float32)
                                    - ref[2].astype(jnp.float32))))
        sgx = float(jnp.max(jnp.abs(ref[2].astype(jnp.float32))))
        worst = 0.0
        for a, b in zip(jax.tree.leaves(r[3]), jax.tree.leaves(ref[3])):
            d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
            s = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) or 1.0
            worst = max(worst, d / s)
        print(f"{mode} vs packed: dval={dv:.2e} dgx={dgx:.2e} "
              f"(scale {sgx:.2e}) worst-rel-dW={worst:.2e}")


if __name__ == "__main__":
    main()
