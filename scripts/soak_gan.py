"""Long-run GAN stability soak: the flagship ESRGAN 4x GAN step
(b=32, 128px HR, VGG-perceptual + adversarial) driven for N steps.

Two data modes:

  default (live): stream the REAL bench corpus through the full e2e
    producer — host dataset (decode/crop/flip) -> threaded loader ->
    device prefetch -> on-device bsrgan blind-SR degradations with the
    per-sample order shuffle — i.e. the exact pipeline production
    training uses (ref train.py:219-224 trains producer-inclusive over
    full corpora). Fresh random crops every step mean D faces unseen
    real data for the whole run, so the adversarial game cannot
    saturate by memorizing a fixed pool (round-4 VERDICT #3: the pool
    soak ended with l_d_total = 0.0, D_real = 43 — numerically stable
    but adversarially degenerate by construction).

  --pool N: N preloaded real batches degraded on device (near-zero
    host load; the round-4 mode, kept for chips whose host is busy).

Evidence target: the production GAN recipe holds at schedule length —
zero non-finite logs AND a LIVING adversarial game: l_d_total bounded
away from 0 and |D_real - D_fake| bounded, summarized at the end
(d_alive_frac = fraction of logged steps in the final half with
l_d_total > 1e-3).

--warmup N (default 3000 live / 0 pool) runs N pixel-only (L1) steps
first and starts the GAN phase from those G weights — the reference's
production ESRGAN recipe (ref docs/howtotrain.md:16: a PSNR-oriented
pretrained model "will also stabilize the GAN training"). Training the
GAN from scratch makes D separate blurry early fakes from real photos
trivially, so l_d pins to 0 regardless of the data stream (measured:
docs/qa_curves/soak_gan_50k_live_scratch.jsonl).

Note: this image has no pretrained VGG19 (zero egress — the reference
could not download one here either), so the perceptual term runs on a
randomly-initialized VGG (a fixed random projection; used this way in
the literature as "random VGG" perceptual loss). The adversarial-game
and numerical-stability evidence is unaffected; production runs supply
`path.vgg_weights` (converted npz).

Usage: python scripts/soak_gan.py [out.jsonl] [--steps 50000]
           [--pool 16] [--warmup 3000]
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
    pool_mode = "--pool" in sys.argv
    n_pool = int(sys.argv[sys.argv.index("--pool") + 1]) if pool_mode \
        else 0
    warmup = 0 if pool_mode else 3000
    if "--warmup" in sys.argv:
        warmup = int(sys.argv[sys.argv.index("--warmup") + 1])
    save_g = ""
    if "--save-g" in sys.argv:
        save_g = sys.argv[sys.argv.index("--save-g") + 1]
    max_seconds = 0.0
    if "--max-seconds" in sys.argv:
        # wall-clock budget for the GAN phase: end cleanly (summary +
        # final G export) instead of holding the chip past a deadline
        max_seconds = float(sys.argv[sys.argv.index("--max-seconds") + 1])

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    import bench
    from trainner_tpu.train.sr_trainer import SRTrainer
    from trainner_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    root = bench._ensure_bench_corpus()
    b, crop = 32, 128

    opt = {
        "is_train": True, "scale": 4, "model": "sr",
        "datasets": {"train": {
            "name": "soak", "mode": "aligned", "dataroot_HR": root,
            "crop_size": crop, "batch_size": b, "use_flip": True,
            "use_rot": True, "augs_strategy": "bsrgan",
            "resize_strat": "in", "n_workers": 4,
            "wire_dtype": "uint8", "shuffle_degradations": True}},
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

    import train as train_mod
    from trainner_tpu.options.config import parse_dict

    popt = parse_dict(opt, is_train=True)
    trainer = SRTrainer(popt, dtype=jnp.bfloat16)
    state = trainer.init_state(jax.random.PRNGKey(0), (b, 32, 32, 3))

    if pool_mode:
        import cv2

        from trainner_tpu.data.pipeline import BatchDegrader

        files = sorted(os.path.join(root, f) for f in os.listdir(root)
                       if f.endswith(".png"))
        rng = np.random.default_rng(0)
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

        @jax.jit
        def make_pool_batch(r, i):
            hr = pool_dev[i]
            return {"LR": deg(r, hr), "HR": hr}

        def batch_stream():
            key = jr.PRNGKey(42)
            step = 0
            while True:
                key, r = jr.split(key)
                step += 1
                yield make_pool_batch(r, step % n_pool)
    else:
        from trainner_tpu.data.datasets import create_dataset
        from trainner_tpu.data.loader import (create_dataloader,
                                              device_prefetch)

        ds_opt = popt["datasets"]["train"]
        dataset = create_dataset(ds_opt)
        loader = create_dataloader(dataset, ds_opt)
        degrade = train_mod.make_otf_degradation(popt)

        def batch_stream():
            key = jr.PRNGKey(42)

            def arrays_only(it):
                for bt in it:
                    yield {k: v for k, v in bt.items()
                           if isinstance(v, np.ndarray)}

            while True:
                for batch in device_prefetch(arrays_only(iter(loader)),
                                             size=2):
                    key, r = jr.split(key)
                    yield degrade(r, batch) if degrade is not None \
                        else batch

    stream = batch_stream()
    t0 = time.time()
    bad = 0
    mode = f"pool{n_pool}" if pool_mode else "live-e2e"
    recs = []
    with open(out_path, "w") as f:
        f.write(json.dumps({"meta": {
            "steps": steps, "batch": b, "mode": mode, "warmup": warmup,
            "platform": jax.devices()[0].platform}}) + "\n")

    if warmup > 0:
        # PSNR-oriented pretrain phase: the production ESRGAN recipe
        # (ref docs/howtotrain.md:16) starts the GAN from a
        # PSNR-pretrained G so D cannot trivially separate early fakes.
        wopt = {k: v for k, v in opt.items() if k != "network_D"}
        wopt["train"] = {
            "lr_G": 2e-4, "pixel_criterion": "l1", "pixel_weight": 1.0,
            "lr_scheme": "MultiStepLR", "lr_steps": [warmup]}
        wtr = SRTrainer(parse_dict(wopt, is_train=True),
                        dtype=jnp.bfloat16)
        wstate = wtr.init_state(jax.random.PRNGKey(0), (b, 32, 32, 3))
        print(f"[soak] warmup: {warmup} pixel-only steps", flush=True)
        for wstep in range(1, warmup + 1):
            wstate, wlogs = wtr.train_step(wstate, next(stream))
            if wstep % 500 == 0 or wstep == warmup:
                rec = {"phase": "warmup", "step": wstep,
                       "t": round(time.time() - t0, 1),
                       **{k: round(float(v), 5) for k, v in
                          wlogs.items()}}
                with open(out_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(f"[soak] {rec}", flush=True)
        state = state.replace(g=state.g.replace(
            params=wstate.g.params, extra=wstate.g.extra))
        del wstate, wtr
        t0 = time.time()
    for step in range(1, steps + 1):
        state, logs = trainer.train_step(state, next(stream))
        if step % 200 == 0 or step == steps:
            rec = {"step": step, "t": round(time.time() - t0, 1),
                   **{k: round(float(v), 5) for k, v in logs.items()}}
            ok = all(np.isfinite(v) for v in rec.values()
                     if isinstance(v, float))
            rec["finite"] = ok
            bad += 0 if ok else 1
            recs.append(rec)
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            if step % 2000 == 0:
                print(f"[soak] {rec}", flush=True)
            if save_g and step % 5000 == 0:
                from trainner_tpu.utils.checkpoint import save_params
                save_params(state.g.params, save_g, backup=False)
            if bad > 3:
                print("[soak] aborting: repeated non-finite logs",
                      flush=True)
                break
            if max_seconds and time.time() - t0 > max_seconds:
                print(f"[soak] wall-clock budget {max_seconds}s reached "
                      f"at step {step}", flush=True)
                break

    # adversarial-health summary over the final half of the run
    half = [r for r in recs if r["step"] > steps // 2]
    alive = [r for r in half if r.get("l_d_total", 0.0) > 1e-3]
    gaps = [abs(r.get("D_real", 0.0) - r.get("D_fake", 0.0))
            for r in half]
    summary = {"summary": {
        "steps_done": step, "bad_logs": bad,
        "it_per_sec": round(step / (time.time() - t0), 2),
        "d_alive_frac_final_half":
            round(len(alive) / max(1, len(half)), 3),
        "d_gap_final_half_mean":
            round(float(np.mean(gaps)) if gaps else 0.0, 2),
        "l_d_total_final": recs[-1].get("l_d_total") if recs else None,
    }}
    with open(out_path, "a") as f:
        f.write(json.dumps(summary) + "\n")
    if save_g:
        from trainner_tpu.utils.checkpoint import save_params
        save_params(state.g.params, save_g, backup=False)
        print(f"[soak] saved G params -> {save_g}", flush=True)
    print(f"[soak] done: {summary}", flush=True)


if __name__ == "__main__":
    main()
