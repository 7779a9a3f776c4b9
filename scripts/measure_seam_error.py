"""Measure spatial-band-parallel seam error on the FLAGSHIP network
(VERDICT r4 #5): RRDB23 (nf=64 nb=23, 4x) under parallel/spatial.py
band inference on the 8-virtual-CPU-device mesh, halo swept over
{8, 16, 32, 64}, deviation measured against single-device inference on
interior rows (outer boundary rows carry the ordinary tiled-inference
border effect and are reported separately).

Also reports the MEASURED effective receptive radius
(parallel.spatial.effective_radius) at several relative thresholds —
the number that replaces receptive_radius's useless conservative bound
(~170 convs) as halo guidance.

Writes a JSON table consumed by docs/performance.md. Run:
    python scripts/measure_seam_error.py [out.json] [--params g.msgpack]
(conftest-free: pins the cpu platform + 8 virtual devices itself)

--params loads trained flagship G weights (e.g. scripts/soak_gan.py
--save-g output). The effective field depends on the weights — trained
RDBs pass more energy than the kaiming x0.1 init — so the shipped
numbers are measured on a REAL trained checkpoint.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")


def main(out_path: str = "docs/seam_error_rrdb23.json",
         params_path: str = "") -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.numpy as jnp

    from trainner_tpu.parallel.spatial import (effective_radius,
                                               make_spatial_mesh,
                                               spatial_infer)
    from trainner_tpu.train.sr_trainer import SRTrainer

    scale = 4
    opt = {"is_train": False, "scale": scale,
           "network_G": {"type": "rrdb_net", "nf": 64, "nb": 23,
                         "gc": 32, "upscale": scale,
                         "gaussian_noise": False}}
    tr = SRTrainer(opt, dtype=jnp.float32)
    state = tr.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    g = state.g
    init_desc = "reference kaiming x0.1 init"
    if params_path:
        from trainner_tpu.utils.checkpoint import load_params
        g = g.replace(params=load_params(params_path, g.params))
        init_desc = f"trained weights: {os.path.basename(params_path)}"

    def apply_fn(x):
        y, _ = tr._g_apply(g, x, jax.random.PRNGKey(0), train=False)
        return y

    # real content: a tall strip from the reference sample image
    img = cv2.imread("/root/reference/data_samples/samples/OST_013.png")
    strip = img[:512, 100:164, ::-1].astype(np.float32) / 255.0
    x = jnp.asarray(strip[None])  # (1, 512, 64, 3) LR

    print("[seam] single-device forward...", flush=True)
    y1 = np.asarray(apply_fn(x))

    print("[seam] effective radius...", flush=True)
    eff = {f"rtol_{t:g}": effective_radius(apply_fn, x, rtol=t,
                                           scale=scale)
           for t in (1e-2, 1e-3, 1e-4)}
    print(f"[seam] effective_radius = {eff}", flush=True)

    n_shards = 8
    band = x.shape[1] // n_shards  # 64 rows
    mesh = make_spatial_mesh(n_shards)
    rows = []
    for halo in (8, 16, 32, 64):
        if halo > band:
            continue
        y_sp = np.asarray(spatial_infer(apply_fn, x, mesh, halo=halo,
                                        scale=scale))
        d = np.abs(y_sp - y1)
        # outer-border region (top/bottom edge of the IMAGE): the halo's
        # zero rows vs progressive per-conv zero padding — report apart
        edge = halo * scale
        interior = d[:, edge:-edge]
        # seam-local error: 8 output rows around each internal seam
        seam_err = []
        for s in range(1, n_shards):
            r0 = s * band * scale
            lo, hi = max(0, r0 - 4 * scale), r0 + 4 * scale
            if lo >= edge and hi <= d.shape[1] - edge:
                seam_err.append(d[:, lo:hi].max())
        row = {"halo": halo,
               "interior_max": float(interior.max()),
               "interior_mean": float(interior.mean()),
               "seam_local_max": float(max(seam_err)) if seam_err
               else None,
               "outer_border_max": float(d.max())}
        rows.append(row)
        print(f"[seam] {row}", flush=True)

    out = {"net": f"rrdb_net nf=64 nb=23 4x ({init_desc})",
           "input": "OST_013 strip 512x64 LR, 8 bands of 64 rows",
           "backend": "cpu x8 (f32)",
           "effective_radius_rows": eff,
           "halo_sweep": rows,
           "note": ("error vs single-device inference; interior excludes"
                    " halo*scale outer rows at the image's top/bottom"
                    " edge (ordinary tiled-inference border effect, see"
                    " spatial.py docstring)")}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[seam] wrote {out_path}", flush=True)


if __name__ == "__main__":
    _pp = ""
    if "--params" in sys.argv:
        _pp = sys.argv[sys.argv.index("--params") + 1]
    _pos = [a for a in sys.argv[1:] if not a.startswith("--")
            and a != _pp]
    main(*(_pos[:1]), params_path=_pp)
