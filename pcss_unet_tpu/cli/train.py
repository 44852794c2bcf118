"""Training CLI (reference main.py role).

Reference flags preserved: ``--loss_type {standard,perturb}``,
``--perturb_weight`` (main.py:870-873), config via INI (main.py:875-885).
Additional overrides are new framework surface.  ``--batch_size 0`` engages
the memory governor's doubling search (main.py:766-780 role — and unlike
the reference, the result is used)."""

import argparse
import logging
import os

from pcss_unet_tpu.config import load_config, save_config
from pcss_unet_tpu.data.pipeline import Loader, PackedDataset
from pcss_unet_tpu.models import unet_from_config
from pcss_unet_tpu.train.loop import fit
from pcss_unet_tpu.utils.logging import setup_logger
from pcss_unet_tpu.utils.memory import find_optimal_batch_size, param_count
from pcss_unet_tpu.utils.prng import set_seed


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Train the shadow U-Net")
    p.add_argument("--config", default="config.ini")
    # reference CLI surface (main.py:870-873)
    p.add_argument("--loss_type", choices=["standard", "perturb"], default=None)
    p.add_argument("--perturb_weight", type=float, default=None)
    # framework overrides
    p.add_argument("--batch_size", type=int, default=None,
                   help="0 → auto (memory-governor doubling search)")
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--ema_decay", type=float, default=None,
                   help="exponential-moving-average decay for a parallel "
                        "set of serving weights (0 = off); deploy with "
                        "cli.infer --ema")
    p.add_argument("--grad_accum_steps", type=int, default=None,
                   help="split each batch into N sequential microbatches "
                        "inside the jitted step (fp32 gradient "
                        "accumulation, one optimizer update) — trains "
                        "reference-scale 2048x1024 batches within one "
                        "chip's HBM; batch_size must divide by it")
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--processed_data_dir", default=None)
    p.add_argument("--save_dir", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--no_shuffle", action="store_true",
                   help="reference-parity mode: train without shuffling "
                        "(the reference's default, main.py:850)")
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--data_parallel", type=int, default=None)
    p.add_argument("--spatial_parallel", type=int, default=None)
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of the first steps")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for multi-host slices")
    p.add_argument("--grain", action="store_true",
                   help="use the Grain-backed input pipeline")
    p.add_argument("--grain_workers", type=int, default=0)
    # distillation (paper.md:143 deployment trimming)
    p.add_argument("--distill_teacher", default=None,
                   help="teacher checkpoint (Orbax dir or .pth) — enables "
                        "distillation of the (trimmed) model being trained")
    p.add_argument("--distill_teacher_depth", type=int, default=None)
    p.add_argument("--distill_teacher_width", type=int, default=None)
    p.add_argument("--distill_weight", type=float, default=None)
    p.add_argument("--allow_random_vgg", action="store_true",
                   help="proceed even when no converted ImageNet VGG-19 "
                        "artifact exists (vgg_weights_path unset/missing): "
                        "the perceptual term then runs on seeded-random "
                        "features — a usable embedding, but NOT loss-value "
                        "parity with the reference (customLoss.py:20)")
    args = p.parse_args(argv)

    if args.multihost:
        from pcss_unet_tpu.utils.distributed import initialize_multihost

        initialize_multihost()

    overrides = {k: v for k, v in vars(args).items()
                 if k not in ("config", "no_shuffle", "no_resume",
                              "profile_dir", "multihost", "grain",
                              "grain_workers", "allow_random_vgg")
                 and v is not None}
    cfg = load_config(args.config, overrides)

    # Persistent XLA compile cache: reference-scale train steps take 20+
    # minutes to compile on tunneled TPU hosts; a resumed/retried run
    # must not pay that twice.  Opt out with PCSS_COMPILE_CACHE=0.
    if os.environ.get("PCSS_COMPILE_CACHE", "1") != "0":
        from pcss_unet_tpu.utils.compilecache import enable_persistent_cache

        enable_persistent_cache()

    # The reference trains its perceptual term on ImageNet VGG-19 features
    # (customLoss.py:20).  Without the converted artifact this framework
    # can only offer seeded-random features — an explicit DECISION, not a
    # warning buried in logs (VERDICT r3 next-#7): refuse unless the user
    # opts in.  alpha == 1.0 means the VGG term has zero weight
    # (customLoss.py:160 blend), so pure-L1 runs are unaffected.
    from pcss_unet_tpu.models.vgg import vgg_weights_provenance

    vgg_prov = vgg_weights_provenance(cfg.vgg_weights_path)
    if (cfg.alpha < 1.0 and vgg_prov == "random-seeded-fallback"
            and not args.allow_random_vgg):
        raise SystemExit(
            "loss_type %r blends a perceptual (VGG) term (alpha=%.2f < 1) "
            "but no converted ImageNet VGG-19 artifact is available "
            "(vgg_weights_path=%r). Either produce the artifact on a "
            "machine with torchvision:\n"
            "    python scripts/convert_vgg_weights.py --out "
            "vgg19_imagenet.npz\n"
            "and set vgg_weights_path, or pass --allow_random_vgg to train "
            "on seeded-random VGG features (usable, but not loss-value "
            "parity with the reference), or set alpha = 1.0 for pure L1."
            % (cfg.loss_type, cfg.alpha, cfg.vgg_weights_path))
    if args.no_shuffle:
        cfg = cfg.replace(shuffle=False)
    if args.no_resume:
        cfg = cfg.replace(resume=False)

    setup_logger(cfg.log_dir)
    set_seed(cfg.seed)
    model = unet_from_config(cfg)

    train_ds = PackedDataset(cfg.processed_data_dir, "train")
    try:
        val_ds = PackedDataset(cfg.processed_data_dir, "val")
    except FileNotFoundError:
        logging.warning("no val pack found; training without validation "
                        "(best checkpoint keyed on train loss, "
                        "main.py:548-561 behavior)")
        val_ds = None

    if cfg.batch_size == 0 or cfg.grad_accum_steps == 0:
        # memory-governor prologue shared by both auto modes: parameter
        # count and the shape the step will actually train on (crops when
        # configured, else the full pack frames)
        import jax
        import jax.numpy as jnp

        key = jax.random.PRNGKey(0)
        variables = model.init({"params": key, "dropout": key},
                               jnp.zeros((1, 64, 64, 4), jnp.float32), True)
        n = param_count(variables["params"])
        h, w = train_ds.sample_hw
        if cfg.crop_height and cfg.crop_width:
            h, w = cfg.crop_height, cfg.crop_width

    if cfg.batch_size == 0:
        cfg = cfg.replace(batch_size=min(
            find_optimal_batch_size(n, h, w, cfg.optimizer_type),
            max(1, len(train_ds))))  # no point exceeding the dataset
        logging.info("auto-selected batch_size=%d", cfg.batch_size)

    if cfg.grad_accum_steps == 0:
        # auto: smallest microbatch split whose PER-CHIP activations fit
        # HBM (under data parallelism each chip sees batch/dp samples).
        # The calibrated analytic model gives the starting candidate; with
        # governor=xla the authoritative check is the compiler's own
        # static memory plan for the real train step (train/governor.py —
        # the analytic flat-factor model underestimated ~9× at 2K and
        # OOM'd on real hardware, logs/bench_train_r4.jsonl).
        import jax

        from pcss_unet_tpu.utils.memory import check_memory, find_accum_steps

        dp = (cfg.data_parallel if cfg.data_parallel > 0
              else max(1, jax.device_count()))
        per_chip = max(1, cfg.batch_size // dp)
        a = find_accum_steps(n, per_chip, h, w, cfg.optimizer_type)
        picked_by = "analytic"
        if cfg.governor == "xla":
            from pcss_unet_tpu.data.device_cache import (cache_eligible,
                                                         dataset_nbytes)
            from pcss_unet_tpu.train.governor import \
                find_accum_steps_compiled

            reserve = (dataset_nbytes(train_ds)
                       if cache_eligible(cfg, train_ds) else 0)
            a_xla = find_accum_steps_compiled(
                cfg, model, train_ds.means, train_ds.stds, per_chip, h, w,
                reserve_bytes=reserve, start=a)
            if a_xla is not None:
                a, picked_by = a_xla, "xla plan"
        if a == per_chip and not check_memory(n, 1, h, w,
                                              cfg.optimizer_type):
            logging.warning("even microbatch 1 exceeds the HBM estimate; "
                            "proceeding with grad_accum_steps=%d and "
                            "letting XLA decide", a)
        cfg = cfg.replace(grad_accum_steps=a)
        logging.info("auto-selected grad_accum_steps=%d (per-chip "
                     "microbatch %d over dp=%d, %s)", a, per_chip // a, dp,
                     picked_by)

    from pcss_unet_tpu.models.vgg import vgg_weights_provenance
    from pcss_unet_tpu.train.checkpoint import check_resume_compat

    if cfg.resume:
        # before resolved_config.json is overwritten below: refuse to
        # auto-resume into checkpoints from a structurally different run
        check_resume_compat(cfg, cfg.save_dir)
    save_config(cfg, f"{cfg.save_dir}/resolved_config.json",
                extra={"vgg_weights":
                       vgg_weights_provenance(cfg.vgg_weights_path)})
    shard_kw = {}
    if args.multihost:
        from pcss_unet_tpu.utils.distributed import host_shard_args

        shard_kw = host_shard_args()
    if args.grain:
        from pcss_unet_tpu.data.grain_pipeline import GrainLoader

        train_loader = GrainLoader(train_ds, cfg.batch_size,
                                   shuffle=cfg.shuffle, seed=cfg.seed,
                                   read_workers=args.grain_workers, **shard_kw)
    else:
        crop = ((cfg.crop_height, cfg.crop_width)
                if cfg.crop_height and cfg.crop_width else None)
        train_loader = Loader(train_ds, cfg.batch_size, shuffle=cfg.shuffle,
                              seed=cfg.seed, crop_hw=crop, **shard_kw)
    val_loader = (Loader(val_ds, cfg.batch_size, shuffle=False, **shard_kw)
                  if val_ds is not None else None)
    result = fit(cfg, model, train_loader, val_loader,
                 profile_dir=args.profile_dir)
    logging.info("training done; best val loss %.6f", result.best_val_loss)


if __name__ == "__main__":
    main()
