"""Multi-PROCESS mesh dryrun (VERDICT r4 #7): 2 jax.distributed
processes x 4 virtual CPU devices each = one 8-device data:4 x fsdp:2
mesh spanning process boundaries, exercising the paths single-process
tests cannot reach:

  * per-host input slicing (parallel.mesh.local_batch_slice branches on
    jax.process_index(); every in-tree test runs process_count=1)
  * cross-process collectives in the sharded GAN train step
  * single-writer checkpointing of a globally-sharded state
    (process_allgather -> process-0 save_state -> both processes
    restore + reshard) — SURVEY §2.9 "multi-host-safe checkpointing"

Run (parent spawns both workers, CPU-only):
    python scripts/multiprocess_dryrun.py
Exits 0 and prints MP_DRYRUN_OK on success; exits 3 if the CPU backend
has no cross-process collectives support (callers should skip).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("MP_DRYRUN_PORT", "53517"))
NPROC, LOCAL_DEV = 2, 4


def worker(pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older/newer flag name; initialize() may still work
    try:
        jax.distributed.initialize(f"localhost:{PORT}",
                                   num_processes=NPROC, process_id=pid)
    except Exception as e:  # no multi-process support on this backend
        print(f"MP_DRYRUN_UNSUPPORTED init: {e}", flush=True)
        raise SystemExit(3)

    import numpy as np
    import jax.numpy as jnp

    assert jax.process_count() == NPROC
    assert len(jax.local_devices()) == LOCAL_DEV
    assert len(jax.devices()) == NPROC * LOCAL_DEV

    from trainner_tpu.parallel.mesh import (MeshConfig, local_batch_slice,
                                            make_mesh, param_sharding)
    from trainner_tpu.train.sr_trainer import SRTrainer

    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    opt = {"is_train": True, "scale": 2,
           "network_G": {"type": "rrdb_net", "nf": 8, "nb": 1, "gc": 4,
                         "upscale": 2, "gaussian_noise": False},
           "network_D": {"type": "discriminator_vgg", "size": 16,
                         "base_nf": 8},
           "train": {"lr_G": 1e-4, "lr_D": 1e-4,
                     "pixel_criterion": "l1", "pixel_weight": 1.0,
                     "gan_type": "vanilla", "gan_weight": 5e-3,
                     "lr_scheme": "MultiStepLR", "lr_steps": [100]}}
    tr = SRTrainer(opt, mesh=mesh, dtype=jnp.float32)
    # init is deterministic (same PRNGKey on both processes), so every
    # host holds the identical global value; device_put with a
    # cross-process NamedSharding materializes each process's
    # addressable shards from it
    state = tr.init_state(jax.random.PRNGKey(0), (8, 8, 8, 3))
    shardings = param_sharding(state, mesh)
    state = jax.tree.map(
        lambda x, s: jax.device_put(np.asarray(x), s), state, shardings)

    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = NamedSharding(mesh, P("data"))
    gb = 8
    sl = local_batch_slice(gb, mesh)
    assert sl == slice(pid * 4, (pid + 1) * 4), sl

    def batch(i):
        r = np.random.default_rng(100 + i)  # same stream on both hosts
        full = {"LR": r.random((gb, 8, 8, 3), np.float32),
                "HR": r.random((gb, 16, 16, 3), np.float32)}
        # each process feeds ONLY its local slice
        return {k: jax.make_array_from_process_local_data(bsh, v[sl])
                for k, v in full.items()}

    logs = None
    for i in range(2):
        state, logs = tr.train_step(state, batch(i))
    loss = float(logs["l_g_total"])
    assert np.isfinite(loss)

    # single-writer checkpoint of the globally-sharded state
    from jax.experimental import multihost_utils

    from trainner_tpu.utils.checkpoint import load_state, save_state

    # tiled=True -> reassemble each leaf's GLOBAL value on every host
    host_state = multihost_utils.process_allgather(state, tiled=True)
    ckpt = os.path.join(os.environ.get("MP_DRYRUN_TMP", "/tmp"),
                        "mp_dryrun.state")
    if pid == 0:
        save_state(jax.tree.map(np.asarray, host_state), ckpt, epoch=1)
    multihost_utils.sync_global_devices("ckpt_written")

    fresh = tr.init_state(jax.random.PRNGKey(1), (8, 8, 8, 3))
    restored, meta = load_state(ckpt, fresh)
    restored = jax.tree.map(
        lambda x, s: jax.device_put(np.asarray(x), s), restored,
        shardings)
    restored, logs2 = tr.train_step(restored, batch(2))
    assert np.isfinite(float(logs2["l_g_total"]))
    print(f"MP_DRYRUN_OK pid={pid} loss={loss:.5f} "
          f"resumed_loss={float(logs2['l_g_total']):.5f}", flush=True)


def parent() -> int:
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count="
                         f"{LOCAL_DEV}")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=REPO) for i in range(NPROC)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    for rc, out in outs:
        print(out)
    if any(rc == 3 for rc, _ in outs):
        print("MP_DRYRUN_UNSUPPORTED")
        return 3
    ok = all(rc == 0 for rc, _ in outs) and \
        all("MP_DRYRUN_OK" in out for _, out in outs)
    print("MP_DRYRUN_OK (both processes)" if ok else "MP_DRYRUN_FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        raise SystemExit(parent())
