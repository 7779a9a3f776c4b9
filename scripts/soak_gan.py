"""Long-run GAN stability soak: the flagship ESRGAN 4x GAN step
(b=32, 128px HR, VGG-perceptual + adversarial) driven for N steps with
on-device blind-SR degradations over a small pool of REAL image batches
preloaded to the chip — near-zero host load, so the soak can run for
hours beside CPU-bound work.

Evidence target: the production GAN recipe holds stable at scale — no
NaN/Inf, no D collapse (|D(real)-D(fake)| blowup), finite grads — over
a schedule-length run (the 3k quality A/B and sanity_gan are far
shorter). Writes a jsonl loss curve.

Usage: python scripts/soak_gan.py [out.jsonl] [--steps 50000]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = args[0] if args else "/tmp/soak_gan.jsonl"
    steps = 50000
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])

    import cv2
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    import bench
    from trainner_tpu.data.pipeline import BatchDegrader
    from trainner_tpu.train.sr_trainer import SRTrainer
    from trainner_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    root = bench._ensure_bench_corpus()
    files = sorted(os.path.join(root, f) for f in os.listdir(root)
                   if f.endswith(".png"))
    rng = np.random.default_rng(0)
    # pool of 16 real HR batches (b=32, 128px crops), preloaded once
    n_pool, b, crop = 16, 32, 128
    pool = np.empty((n_pool, b, crop, crop, 3), np.float32)
    for i in range(n_pool):
        for j in range(b):
            im = cv2.imread(files[int(rng.integers(len(files)))],
                            cv2.IMREAD_COLOR)
            y = int(rng.integers(im.shape[0] - crop + 1))
            x = int(rng.integers(im.shape[1] - crop + 1))
            pool[i, j] = im[y:y + crop, x:x + crop, ::-1] / 255.0
    pool_dev = jnp.asarray(pool)

    deg = BatchDegrader({
        "scale": 4, "lr_blur": True, "blur_prob": 1.0,
        "lr_blur_types": ["iso", "aniso", "sinc"],
        "lr_downscale": True, "resize_strat": "in",
        "lr_downscale_types": [1, 2, 777],
        "lr_noise": True, "lr_noise_types": ["gaussian", "jpeg"],
        "aug_configs": {}}, "lr")

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
            "lr_scheme": "MultiStepLR",
            "lr_steps": [steps // 2, steps * 3 // 4], "lr_gamma": 0.5,
        },
    }
    trainer = SRTrainer(opt, dtype=jnp.bfloat16)
    state = trainer.init_state(jax.random.PRNGKey(0), (b, 32, 32, 3))

    @jax.jit
    def make_batch(r, i):
        hr = pool_dev[i]
        lr = deg(r, hr)
        return {"LR": lr, "HR": hr}

    key = jr.PRNGKey(42)
    t0 = time.time()
    bad = 0
    with open(out_path, "w") as f:
        f.write(json.dumps({"meta": {
            "steps": steps, "batch": b, "pool": n_pool,
            "platform": jax.devices()[0].platform}}) + "\n")
    for step in range(1, steps + 1):
        key, r = jr.split(key)
        batch = make_batch(r, step % n_pool)
        state, logs = trainer.train_step(state, batch)
        if step % 200 == 0 or step == steps:
            rec = {"step": step, "t": round(time.time() - t0, 1),
                   **{k: round(float(v), 5) for k, v in logs.items()}}
            ok = all(np.isfinite(v) for v in rec.values()
                     if isinstance(v, float))
            rec["finite"] = ok
            bad += 0 if ok else 1
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            if step % 2000 == 0:
                print(f"[soak] {rec}", flush=True)
            if bad > 3:
                print("[soak] aborting: repeated non-finite logs",
                      flush=True)
                break
    print(f"[soak] done: {step} steps, bad={bad}, "
          f"{step / (time.time() - t0):.2f} it/s", flush=True)


if __name__ == "__main__":
    main()
