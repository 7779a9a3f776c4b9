"""TPU benchmark: fused canvas Pallas 5C (fwd + custom bwd) vs the XLA
packed path, grad-through-a-chain (the RRDB trunk's real usage — ref
RRDBNet_arch.py:98 chains 5C blocks 3x per RRDB, nb x per trunk).

Prints per-block fwd and grad timings plus on-hardware numerics deltas.

Usage: python scripts/bench_rdb_canvas.py [--blocks N] [--f32]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=12)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from trainner_tpu.models.rrdb import rdb5c_fused, rdb5c_fused_canvas
    from trainner_tpu.ops.pallas_kernels import (_canvas_geometry,
                                                 from_canvas, to_canvas)
    from trainner_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    dt = jnp.float32 if args.f32 else jnp.bfloat16
    nf, gc = 64, 32
    b, h, w = 32, 32, 32
    nblk = args.blocks

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, nf)), dt) * 0.1
    flat = []
    for i in range(nblk):
        ws = [jnp.asarray(rng.standard_normal(
            (3, 3, nf + k * gc, gc if k < 4 else nf)) * 0.03, jnp.float32)
            for k in range(5)]
        bs = [jnp.asarray(rng.standard_normal(
            (gc if k < 4 else nf,)) * 0.01, jnp.float32) for k in range(5)]
        flat.append([v for pair in zip(ws, bs) for v in pair])

    def chain_xla(x, params):
        for fw in params:
            x = rdb5c_fused(dt, nf, gc, x, *fw)
        return x

    _, rp = _canvas_geometry(h, w, dt)

    def chain_canvas(x, params):
        xc = to_canvas(x, rp)
        for fw in params:
            xc = rdb5c_fused_canvas(dt, nf, gc, h, w, xc, *fw)
        return from_canvas(xc, h, w)

    def timed(fn, *a):
        y = fn(*a)
        float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = fn(*a)
        float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.iters, y

    def loss(chain):
        def f(x, params):
            return jnp.sum(chain(x, params).astype(jnp.float32) ** 2)
        return f

    print(f"backend={jax.default_backend()} dt={dt.__name__} "
          f"b={b} {h}x{w} nf={nf} gc={gc} blocks={nblk}", flush=True)

    fwd_x = jax.jit(chain_xla)
    fwd_c = jax.jit(chain_canvas)
    t_fx, y_x = timed(fwd_x, x, flat)
    print(f"fwd  xla    : {t_fx*1e3:8.2f} ms  "
          f"({t_fx*1e3/nblk:6.3f} ms/blk)", flush=True)
    t_fc, y_c = timed(fwd_c, x, flat)
    err_f = float(jnp.abs(y_x.astype(jnp.float32)
                          - y_c.astype(jnp.float32)).max())
    print(f"fwd  canvas : {t_fc*1e3:8.2f} ms  "
          f"({t_fc*1e3/nblk:6.3f} ms/blk)  max|d|={err_f:.3e}", flush=True)

    gx = jax.jit(jax.grad(loss(chain_xla), argnums=(0, 1)))
    gc_ = jax.jit(jax.grad(loss(chain_canvas), argnums=(0, 1)))
    t_gx, g_x = timed(gx, x, flat)
    print(f"grad xla    : {t_gx*1e3:8.2f} ms  "
          f"({t_gx*1e3/nblk:6.3f} ms/blk)", flush=True)
    t_gc, g_c = timed(gc_, x, flat)
    dx_err = float(jnp.abs(g_x[0].astype(jnp.float32)
                           - g_c[0].astype(jnp.float32)).max())
    dw_err = max(float(jnp.abs(a.astype(jnp.float32)
                               - p.astype(jnp.float32)).max())
                 for a, p in zip(jax.tree.leaves(g_x[1]),
                                 jax.tree.leaves(g_c[1])))
    print(f"grad canvas : {t_gc*1e3:8.2f} ms  "
          f"({t_gc*1e3/nblk:6.3f} ms/blk)  max|dx|={dx_err:.3e} "
          f"max|dw|={dw_err:.3e}", flush=True)
    print(f"speedup fwd={t_fx/t_fc:.2f}x grad={t_gx/t_gc:.2f}x", flush=True)


if __name__ == "__main__":
    main()
