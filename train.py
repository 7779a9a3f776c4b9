"""Training driver CLI.

Equivalent of ref codes/train.py: parse_options:18, dir_check:30,
configure_loggers:42, get_resume_state:81, get_dataloaders:119, fit:196,
main:464 — config-driven training with periodic logging, validation,
checkpointing, LR scheduling and graceful-interrupt save.

TPU-native: the hot loop drives a jitted, mesh-sharded train step
(trainner_tpu.train trainers); batches prefetch to device; metrics and
image dumps happen host-side off the step's returned visuals.

Usage: python train.py -opt options/sr/train_sr.yml
"""

from __future__ import annotations

import argparse
import math
import os
import time

import numpy as np


def parse_options(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True,
                        help="Path to options YAML/JSON file.")
    args = parser.parse_args(argv)
    from trainner_tpu.options import parse

    return parse(args.opt, is_train=True)


def dir_check(opt) -> None:
    """Create/archive experiment dirs (ref train.py:30)."""
    from trainner_tpu.utils.logging_utils import mkdir_and_rename, mkdirs

    paths = opt["path"]
    if not paths.get("resume_state"):
        mkdir_and_rename(paths["experiments_root"])
    mkdirs([paths.get(k) for k in
            ("models", "training_state", "log", "val_images")])


def configure_loggers(opt):
    from trainner_tpu.options import dict2str
    from trainner_tpu.utils.logging_utils import (ScalarWriter,
                                                  get_root_logger)

    log_dir = opt["path"]["log"]
    logger = get_root_logger("base", log_dir, "train")
    get_root_logger("val", log_dir, "val", screen=False)
    logger.info(dict2str(opt))
    tb = None
    if (opt.get("logger") or {}).get("tensorboard", True):
        tb = ScalarWriter(os.path.join(log_dir, "tb"))
    return logger, tb


def get_resume_state(opt):
    """Locate resume state (file or dir -> latest) (ref train.py:81)."""
    from trainner_tpu.options import check_resume
    from trainner_tpu.utils.checkpoint import latest_state_path

    rs = opt["path"].get("resume_state")
    if not rs:
        return None
    path = rs if os.path.isfile(rs) else latest_state_path(rs)
    if path is None:
        return None
    import json

    meta = {"epoch": 0, "iter": 0}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    check_resume(opt, meta.get("iter", 0))
    return {"path": path, **meta}


def get_dataloaders(opt):
    from trainner_tpu.data import create_dataloader, create_dataset

    loaders = {}
    for phase_key, dataset_opt in (opt.get("datasets") or {}).items():
        phase = phase_key.split("_")[0]
        ds = create_dataset(dataset_opt)
        loaders[phase] = create_dataloader(ds, dataset_opt)
    if "train" not in loaders:
        raise ValueError("no train dataset in options")
    return loaders


def create_trainer(opt, mesh=None):
    """Model-strategy factory (ref models/__init__.py create_model:46).

    dtype policy: training defaults to bf16 network bodies (the TPU AMP
    replacement); inference defaults to f32 like the reference's fp32
    test path. An explicit `use_amp` overrides either direction.
    SRFlow always trains f32 (flow logdets are precision-sensitive).
    """
    import jax.numpy as jnp

    model = (opt.get("model") or "sr").lower()
    amp_default = bool(opt.get("is_train", True))
    dtype = jnp.bfloat16 if opt.get("use_amp", amp_default) \
        else jnp.float32
    if model in ("sftgan", "sftgan_acd"):
        from trainner_tpu.train.sftgan_trainer import SFTGANTrainer

        return SFTGANTrainer(opt, mesh=mesh, dtype=dtype)
    if model in ("pbr", "sr_pbr", "pbr_sr"):
        from trainner_tpu.train.pbr_trainer import PBRTrainer

        return PBRTrainer(opt, mesh=mesh, dtype=dtype)
    if model in ("sr", "srgan", "srragan"):
        from trainner_tpu.train.sr_trainer import SRTrainer

        return SRTrainer(opt, mesh=mesh, dtype=dtype)
    if model in ("srflow",):
        from trainner_tpu.train.srflow_trainer import SRFlowTrainer

        return SRFlowTrainer(opt, mesh=mesh)
    if model in ("vsr", "vsrgan", "evsrgan", "video"):
        from trainner_tpu.train.vsr_trainer import VSRTrainer

        return VSRTrainer(opt, mesh=mesh, dtype=dtype)
    if model in ("dvd",):
        from trainner_tpu.train.dvd_trainer import DVDTrainer

        return DVDTrainer(opt, mesh=mesh, dtype=dtype)
    if model in ("ppon",):
        from trainner_tpu.train.ppon_trainer import PPONTrainer

        return PPONTrainer(opt, mesh=mesh, dtype=dtype)
    if model in ("pix2pix",):
        from trainner_tpu.train.pix2pix_trainer import Pix2PixTrainer

        return Pix2PixTrainer(opt, mesh=mesh, dtype=dtype)
    if model in ("cyclegan",):
        from trainner_tpu.train.cyclegan_trainer import CycleGANTrainer

        return CycleGANTrainer(opt, mesh=mesh, dtype=dtype)
    if model in ("wbc",):
        from trainner_tpu.train.wbc_trainer import WBCTrainer

        return WBCTrainer(opt, mesh=mesh, dtype=dtype)
    raise NotImplementedError(f"model [{model}] not recognized")


def _batch_arrays(batch):
    return {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}


def make_otf_degradation(opt):
    """Build the on-device degradation step from the train dataset options
    (the TPU-native move of ref aligned_dataset.py:142-158's worker-side
    pipeline into the accelerator input step). Returns fn(rng, batch) or
    None."""
    train_ds = None
    for phase_key, ds in (opt.get("datasets") or {}).items():
        if phase_key.split("_")[0] == "train":
            train_ds = ds
            break
    if train_ds is None:
        return None
    from trainner_tpu.data.pipeline import BatchDegrader, get_unpaired_params

    lr_p, hr_p = get_unpaired_params(train_ds)
    lr_deg = BatchDegrader(train_ds, "lr", lr_p) if lr_p else None
    hr_deg = BatchDegrader(train_ds, "hr", hr_p) if hr_p else None
    if (lr_deg is None or lr_deg.is_noop) and \
            (hr_deg is None or hr_deg.is_noop):
        return None
    lr_from_hr = lr_deg is not None and \
        any(n == "resize" for n, _ in lr_deg.stages)

    import jax
    import jax.numpy as jnp

    def apply(rng, batch):
        # stays ON DEVICE end-to-end (outputs feed the jitted train step)
        batch = dict(batch)
        r1, r2 = jax.random.split(rng)
        if hr_deg is not None and not hr_deg.is_noop and "HR" in batch:
            batch["HR"] = hr_deg(r1, jnp.asarray(batch["HR"]))
        if lr_deg is not None and not lr_deg.is_noop:
            src = batch["HR"] if lr_from_hr else batch["LR"]
            batch["LR"] = lr_deg(r2, jnp.asarray(src))
        return batch

    return apply


def validate(trainer, state, val_loader, opt, epoch, current_step,
             logger, tb):
    """Validation pass: PSNR/SSIM(+LPIPS) + image dumps
    (ref train.py:299-407)."""
    import jax.numpy as jnp

    from trainner_tpu.data.common import save_img, tensor2img
    from trainner_tpu.utils.metrics import MetricsDict

    metrics = MetricsDict((opt["train"] or {}).get("metrics") or "psnr,ssim",
                          lpips_weights=opt["path"].get("lpips_weights"))
    val_dir = opt["path"].get("val_images")
    save_imgs = bool((opt.get("logger") or {}).get("save_val_imgs", True))
    scale = int(opt.get("scale") or 1)
    znorm = False
    for i, batch in enumerate(val_loader):
        in_key = "LR" if "LR" in batch else "A"
        gt_key = "HR" if "HR" in batch or in_key == "LR" else "B"
        lr = jnp.asarray(batch[in_key])
        sr = np.asarray(trainer.eval_step(state, lr))
        gt = batch.get(gt_key)
        name = os.path.splitext(os.path.basename(
            batch.get(f"{in_key}_path", [str(i)])[0]))[0]
        sr_img = tensor2img(sr[0], znorm)
        if gt is not None:
            metrics.calculate_metrics(sr_img, tensor2img(gt[0], znorm),
                                      crop_size=scale)
        if save_imgs and val_dir:
            img_dir = os.path.join(val_dir, name)
            os.makedirs(img_dir, exist_ok=True)
            save_img(sr_img,
                     os.path.join(img_dir, f"{name}_{current_step}.png"))
    avgs = metrics.get_averages()
    import logging

    msg = " ".join(f"{m['name']}: {m['average']:.6g}" for m in avgs)
    logger.info(f"# Validation # epoch {epoch} iter {current_step} | {msg}")
    logging.getLogger("val").info(
        f"epoch {epoch} iter {current_step} | {msg}")
    if tb is not None:
        for m in avgs:
            tb.add_scalar(f"val/{m['name']}", m["average"], current_step)
    return {m["name"]: m["average"] for m in avgs}


def fit(trainer, opt, loaders, state, start_epoch, current_step, logger,
        tb):
    """The hot loop (ref train.py:196)."""
    import jax
    import jax.numpy as jnp

    from trainner_tpu.utils.checkpoint import save_checkpoint
    from trainner_tpu.utils.metrics import Timer

    # TPU preemptions deliver SIGTERM: route it into the same graceful
    # save-and-exit path as Ctrl-C (ref train.py only handles the latter)
    import signal

    def _sigterm(_signum, _frame):
        raise KeyboardInterrupt

    try:
        signal.signal(signal.SIGTERM, _sigterm)
    except ValueError:
        pass  # not in the main thread (e.g. under a test runner)

    degrade = make_otf_degradation(opt)
    deg_rng = jax.random.PRNGKey(
        int((opt.get("train") or {}).get("manual_seed") or 0) + 7)

    def device_batches(loader):
        """Prefetch the next batch to device while the current step runs
        (ref pin_memory + async H2D; data/loader.device_prefetch)."""
        from trainner_tpu.data.loader import device_prefetch

        mesh = getattr(trainer, "mesh", None)
        sharding = None
        if mesh is not None:
            from trainner_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(mesh)

        def arrays_only(it):
            for b in it:
                yield {k: v for k, v in b.items()
                       if isinstance(v, np.ndarray)}

        return device_prefetch(arrays_only(loader), size=2,
                               sharding=sharding)

    train_opt = opt["train"] or {}
    logger_opt = opt.get("logger") or {}
    niter = int(float(train_opt.get("niter") or 5e5))
    print_freq = int(logger_opt.get("print_freq") or 200)
    save_freq = int(logger_opt.get("save_checkpoint_freq") or 5e3)
    val_freq = int(float(train_opt.get("val_freq") or 5e3))
    overwrite_chkp = bool(logger_opt.get("overwrite_chkp"))
    display_freq = int(logger_opt.get("display_freq") or 0)
    train_loader = loaders["train"]
    total_epochs = max(1, int(math.ceil(niter / max(len(train_loader), 1))))
    timer = Timer()
    logger.info(
        f"Start training from epoch {start_epoch}, iter {current_step}; "
        f"total epochs {total_epochs}, iters {niter}")

    # rolling LR batches for the SWA BatchNorm-statistics refresh on save
    # (ref base_model.py:180 update_bn over the loader; we keep the most
    # recent batches instead of a full extra epoch)
    import collections as _collections

    bn_refresh_batches = _collections.deque(
        maxlen=int(train_opt.get("swa_update_bn_batches", 4) or 4))

    def _swa_extra():
        if not (getattr(state, "swa_params", None) is not None
                and hasattr(trainer, "refresh_swa_bn")
                and getattr(state.g, "extra", None)
                and "batch_stats" in state.g.extra
                and bn_refresh_batches):
            return None
        return trainer.refresh_swa_bn(state, list(bn_refresh_batches))

    epoch = start_epoch
    try:
        while current_step < niter:
            for arrays in device_batches(train_loader):
                if current_step >= niter:
                    break
                current_step += 1
                timer.tic()
                if degrade is not None:
                    deg_rng, r = jax.random.split(deg_rng)
                    arrays = degrade(r, arrays)
                if "LR" in arrays:
                    bn_refresh_batches.append(arrays["LR"])
                state, logs = trainer.train_step(state, arrays)
                t_iter = timer.toc()

                if current_step % print_freq == 0:
                    lr_now = trainer.schedG.get_lr(int(state.step))
                    eta = (niter - current_step) * \
                        timer.get_average_time()
                    loss_str = " ".join(
                        f"{k}: {float(v):.4e}" for k, v in
                        sorted(logs.items()))
                    logger.info(
                        f"<epoch:{epoch:3d}, iter:{current_step:8,d}, "
                        f"lr:{lr_now:.3e}, t:{t_iter:.3f}s, "
                        f"eta:{eta / 3600:.2f}h> {loss_str}")
                    if tb is not None:
                        tb.add_scalar("lr", lr_now, current_step)
                        tb.add_scalar("time/iteration", t_iter,
                                      current_step)
                        for k, v in logs.items():
                            tb.add_scalar(f"train/{k}", float(v),
                                          current_step)

                if display_freq and current_step % display_freq == 0 \
                        and "A" in arrays:
                    # i2i sample grids A | G(A) | B (ref train.py:409-438)
                    from trainner_tpu.data.common import (save_img_comp,
                                                          tensor2img)

                    fake = np.asarray(trainer.eval_step(
                        state, jnp.asarray(arrays["A"][:1])))[0]
                    grid_dir = os.path.join(
                        opt["path"]["experiments_root"], "samples")
                    os.makedirs(grid_dir, exist_ok=True)
                    save_img_comp(
                        [tensor2img(np.asarray(arrays["A"][0])),
                         tensor2img(fake),
                         tensor2img(np.asarray(arrays["B"][0]))],
                        os.path.join(grid_dir,
                                     f"{current_step:08d}.png"))

                if current_step % save_freq == 0:
                    save_checkpoint(state, opt, epoch, current_step,
                                    latest_only=overwrite_chkp,
                                    swa_extra=_swa_extra())
                    logger.info(f"Models and training state saved at iter "
                                f"{current_step}.")

                if "val" in loaders and current_step % val_freq == 0:
                    validate(trainer, state, loaders["val"], opt, epoch,
                             current_step, logger, tb)
            epoch += 1
    except KeyboardInterrupt:
        # graceful interrupt: save latest and exit (ref train.py:453-461)
        logger.info("Training interrupted. Saving latest models and state.")
        save_checkpoint(state, opt, epoch, current_step, latest_only=True,
                        swa_extra=_swa_extra())
        raise SystemExit(0)

    save_checkpoint(state, opt, epoch, current_step,
                    swa_extra=_swa_extra())
    logger.info("Training finished. Saved final models and state.")
    return state


def main(argv=None):
    from trainner_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    opt = parse_options(argv)
    resume = get_resume_state(opt)
    dir_check(opt)
    logger, tb = configure_loggers(opt)

    seed = (opt["train"] or {}).get("manual_seed") or 0
    np.random.seed(int(seed))

    # conv/matmul precision (round-5 matched-init finding: on TPU,
    # "f32" convs default to bf16 MXU passes; `highest` restores
    # true-f32 accumulation — the torch reference's CPU/CUDA f32 conv
    # semantics — at ~3-6x MXU cost. The matched-init 10k quality A/B
    # only lands inside the torch band under `highest`; the production
    # bf16 recipe is unaffected by this knob. docs/performance.md r5.)
    prec = (opt["train"] or {}).get("matmul_precision") \
        or opt.get("matmul_precision")
    if prec:
        import jax as _jax

        _jax.config.update("jax_default_matmul_precision", str(prec))
        logger.info(f"jax_default_matmul_precision = {prec}")

    # aux observability hooks (SURVEY.md §5): NaN guard + profiler trace
    if opt.get("debug_nans"):
        from trainner_tpu.utils.debug import enable_nan_checks

        enable_nan_checks(True)
        logger.info("jax_debug_nans enabled")
    if opt.get("profile"):
        import jax as _jax

        trace_dir = os.path.join(opt["path"]["log"], "trace")
        _jax.profiler.start_trace(trace_dir)
        logger.info(f"jax.profiler trace -> {trace_dir}")

    loaders = get_dataloaders(opt)

    import jax

    # device mesh (the nn.DataParallel replacement — SURVEY.md §2.9):
    # default: all local devices on the 'data' axis; optional fsdp axis
    # via `parallel: {data: N, fsdp: M}` in the options file.
    mesh = None
    par = opt.get("parallel") or {}
    train_bs = 1
    for k, ds in (opt.get("datasets") or {}).items():
        if k.split("_")[0] == "train":
            train_bs = int(ds.get("batch_size", 1) or 1)
    if len(jax.devices()) > 1 or par:
        from trainner_tpu.parallel.mesh import MeshConfig, make_mesh

        data_ax = int(par.get("data", -1) or -1)
        fsdp_ax = max(1, int(par.get("fsdp", 1) or 1))
        tensor_ax = max(1, int(par.get("tensor", 1) or 1))
        n_dev = len(jax.devices())
        if data_ax <= 0:
            data_ax = n_dev // (fsdp_ax * tensor_ax)
        if data_ax < 1 or data_ax * fsdp_ax * tensor_ax != n_dev:
            logger.warning(
                f"parallel axes {data_ax}x{fsdp_ax}x{tensor_ax} do not "
                f"tile the {n_dev} available devices; running "
                "single-device")
        elif train_bs % data_ax == 0:
            mesh = make_mesh(MeshConfig(data=data_ax, fsdp=fsdp_ax,
                                        tensor=tensor_ax))
            logger.info(f"Device mesh: {dict(mesh.shape)} over "
                        f"{n_dev} devices")
        else:
            logger.warning(
                f"batch_size {train_bs} not divisible by data axis "
                f"{data_ax}; running single-device")

    trainer = create_trainer(opt, mesh=mesh)

    # infer shapes from one batch to init state
    first = next(iter(loaders["train"]))
    arrays = _batch_arrays(first)
    state = trainer.init_state_from_batch(jax.random.PRNGKey(int(seed)),
                                          arrays) \
        if hasattr(trainer, "init_state_from_batch") else \
        trainer.init_state(jax.random.PRNGKey(int(seed)),
                           arrays["LR"].shape, arrays["HR"].shape)

    start_epoch, current_step = 0, 0
    if resume:
        from trainner_tpu.utils.checkpoint import load_state

        state, meta = load_state(resume["path"], state)
        start_epoch = int(meta.get("epoch", 0))
        current_step = int(meta.get("iter", int(state.step)))
        logger.info(f"Resuming training from epoch {start_epoch}, "
                    f"iter {current_step}.")
    elif opt["path"].get("pretrain_model_G"):
        from trainner_tpu.utils.checkpoint import load_params

        g_params = load_params(opt["path"]["pretrain_model_G"],
                               state.g.params)
        state = state.replace(g=state.g.replace(params=g_params))
        logger.info(f"Loaded pretrained G from "
                    f"{opt['path']['pretrain_model_G']}")

    if mesh is not None:
        # place the state under its mesh sharding (params/opt-state over
        # fsdp, output channels over tensor, replicated over data) —
        # without this only batches were sharded and the fsdp/tensor knobs
        # were inert in the CLI path (they applied only in
        # dryrun_multichip/tests); mirrors __graft_entry__.dryrun_multichip
        from trainner_tpu.parallel.mesh import param_sharding

        state = jax.tree.map(jax.device_put, state,
                             param_sharding(state, mesh))
        logger.info("Train state placed under mesh sharding "
                    f"(fsdp={mesh.shape.get('fsdp', 1)}, "
                    f"tensor={mesh.shape.get('tensor', 1)})")

    fit(trainer, opt, loaders, state, start_epoch, current_step, logger,
        tb)


if __name__ == "__main__":
    main()
