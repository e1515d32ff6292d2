"""Training CLI (reference tools/train.py): config + --work-dir/--resume/
--seed/--cfg-options, three-stage recipe support (coarse/fine pretrain via
BaselinePretrain configs, fusion via PatchFusion configs).

Distributed launch: JAX SPMD — single process per host; multi-host via
`--coordinator/--num-processes/--process-id` (replacing torch.distributed
launchers, reference tools/dist_train.sh).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train PatchFusion (TPU)")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ckp-path", default=None, help="resume checkpoint")
    p.add_argument("--log-name", default=None)
    p.add_argument("--tags", nargs="+", default=None)
    p.add_argument("--wandb", action="store_true", dest="use_wandb")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--amp", action="store_true",
                   help="bf16 mixed precision (reference tools/train.py:40 "
                        "--amp): modules compute in bf16, frozen branches "
                        "stored bf16, trainable masters + optimizer f32")
    p.add_argument("--seed", type=int, default=621)
    p.add_argument("--cfg-options", nargs="+", default=[])
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    from patchfusion_tpu.config import Config, parse_cfg_option
    from patchfusion_tpu.parallel.mesh import initialize_distributed
    from patchfusion_tpu.utils.misc import (fix_random_seed, log_env,
                                            setup_logger)

    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        opts = dict(kv.split("=", 1) for kv in args.cfg_options)
        cfg.merge_from_dict({k: parse_cfg_option(v)
                             for k, v in opts.items()})

    work_dir = args.work_dir or os.path.join(
        "./work_dir", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(os.path.join(work_dir, "config.py"))
    logger = setup_logger(log_file=os.path.join(work_dir, "train.log"))
    log_env(logger)
    fix_random_seed(args.seed)

    if args.use_wandb:
        try:
            import wandb
            wandb.init(project=cfg.get("project", "patchfusion"),
                       name=args.log_name, tags=args.tags,
                       config=cfg.to_dict() if hasattr(cfg, "to_dict")
                       else dict(cfg))
        except Exception as e:  # offline image: wandb may be unavailable
            logger.warning("wandb unavailable (%s); console logging only", e)
            args.use_wandb = False

    import jax
    import jax.numpy as jnp

    from patchfusion_tpu.config.registry import DATASETS
    from patchfusion_tpu.data.loader import DataLoader, ShardedSampler
    import patchfusion_tpu.data.u4k  # noqa: F401 (register datasets)
    import patchfusion_tpu.data.general  # noqa: F401
    from patchfusion_tpu.engine.trainer import Trainer
    from patchfusion_tpu.engine.training import (create_train_state,
                                                 make_onecycle_optimizer,
                                                 make_train_step)
    from patchfusion_tpu.models.builder import build_patchfusion
    from patchfusion_tpu.models.patchfusion import PatchFusionNet

    if cfg.model["type"] != "PatchFusion":
        raise SystemExit(
            "branch pretraining uses tools/train_branch.py; this entry "
            "trains the PatchFusion fusion stage")

    amp = args.amp or cfg.get("train_dtype", "f32") == "bf16"
    net, tile_cfg = build_patchfusion(
        cfg.model["config"],
        dtype=jnp.bfloat16 if amp else jnp.float32)
    if amp:
        logger.info("mixed precision: bf16 compute, f32 masters")

    def build_loader(dcfg, shuffle):
        ds_cfg = dict(dcfg["dataset"])
        ds_cfg["patch_raw_shape"] = tile_cfg.patch_raw_shape
        ds = DATASETS.build(ds_cfg)
        sampler = ShardedSampler(len(ds), jax.process_count(),
                                 jax.process_index(), shuffle=shuffle,
                                 seed=args.seed)
        return DataLoader(ds, batch_size=dcfg.get("batch_size", 1),
                          sampler=sampler,
                          num_workers=dcfg.get("num_workers", 4),
                          drop_last=shuffle)

    train_loader = build_loader(cfg.train_dataloader, shuffle=True)
    logger.info("train dataset: %d samples, %d steps/epoch",
                len(train_loader.dataset), len(train_loader))
    try:
        val_loader = build_loader(cfg.val_dataloader, shuffle=False)
    except (FileNotFoundError, KeyError):
        val_loader = None
        logger.warning("val dataloader unavailable; skipping in-training "
                       "validation")

    tcfg = cfg.train_cfg
    steps_per_epoch = max(1, len(train_loader))
    total_steps = steps_per_epoch * tcfg["max_epochs"]
    ow = cfg.optim_wrapper
    ps = cfg.param_scheduler
    tx = make_onecycle_optimizer(
        max_lr=ow["optimizer"]["lr"], total_steps=total_steps,
        pct_start=ps.get("pct_start", 0.25),
        div_factor=ps.get("div_factor", 10),
        final_div_factor=ps.get("final_div_factor", 10000),
        base_momentum=ps.get("base_momentum", 0.85),
        max_momentum=ps.get("max_momentum", 0.95),
        weight_decay=ow["optimizer"].get("weight_decay", 0.001),
        clip_norm=ow.get("clip_grad", {}).get("max_norm", 0.1))

    # init params; load branch ckpts if configured
    mc = cfg.model["config"]
    if mc.get("load_branch") and mc.get("pretrain_model"):
        from patchfusion_tpu.api import PatchFusion
        model = PatchFusion.from_config(
            mc, ckpts=(mc["pretrain_model"][0], mc["pretrain_model"][1],
                       args.ckp_path))
        variables = model.variables
    else:
        from patchfusion_tpu.api import _init_variables
        variables = _init_variables(net, tile_cfg, args.seed)

    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx,
                               frozen_dtype=jnp.bfloat16 if amp else None)
    start_epoch = 0
    if args.resume and args.ckp_path and args.ckp_path.endswith(".ckpt"):
        from patchfusion_tpu.engine.checkpoint import (load_checkpoint,
                                                       restore_opt_state)
        blob = load_checkpoint(args.ckp_path)
        state = state._replace(
            step=jnp.asarray(blob["step"]),
            trainable=blob["trainable"],
            batch_stats=blob["batch_stats"],
            opt_state=restore_opt_state(state.opt_state,
                                        blob["opt_state"]))
        start_epoch = int(blob.get("epoch", 0))
        logger.info("resumed from %s (epoch %s)", args.ckp_path,
                    blob.get("epoch"))

    logger.info("variables initialized (%d params leaves)",
                len(jax.tree.leaves(variables["params"])))
    step_fn = make_train_step(net, tx, min_depth=mc["min_depth"],
                              max_depth=mc["max_depth"])

    val_fn = None
    if val_loader is not None:
        import numpy as np

        from patchfusion_tpu.engine.inference import PatchFusionInference
        from patchfusion_tpu.engine.training import merge_params

        val_engine = PatchFusionInference(net, None, tile_cfg,
                                          process_num=4)

        def val_fn(state, batch):
            """m1 tiled inference + metrics on one val image (the
            reference's val_epoch protocol, trainer.py:137-216). The engine
            is reused — variables are a call argument, so swapping them
            does not recompile."""
            val_engine.variables = {
                "params": merge_params(state.trainable, state.frozen),
                "batch_stats": state.batch_stats}
            depth = val_engine.infer(np.asarray(batch["image_lr"]),
                                     np.asarray(batch["image_hr"])[0],
                                     cai_mode="m1")
            ds = val_loader.dataset
            metrics = ds.get_metrics(
                np.asarray(batch["depth_gt"])[0], np.asarray(depth),
                disp_gt_edges=np.asarray(batch["boundary"])[0]
                if "boundary" in batch else None)
            return metrics, depth

    trainer = Trainer(net, tx, state, step_fn, train_loader,
                      val_loader=val_loader, val_fn=val_fn,
                      max_epochs=tcfg["max_epochs"],
                      val_interval=tcfg.get("val_interval", 2),
                      save_checkpoint_interval=tcfg.get(
                          "save_checkpoint_interval", 16),
                      log_interval=tcfg.get("log_interval", 100),
                      train_log_img_interval=tcfg.get(
                          "train_log_img_interval", 500),
                      val_log_img_interval=tcfg.get(
                          "val_log_img_interval", 50),
                      work_dir=work_dir, use_wandb=args.use_wandb,
                      logger=logger, start_epoch=start_epoch)
    trainer.run()


if __name__ == "__main__":
    main()
