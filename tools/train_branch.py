"""Stage-1/2 branch pretraining CLI (the reference runs these through the
same tools/train.py with BaselinePretrain configs; split here for clarity).
Trains a single DA-ZoeDepth branch: target=coarse on whole images,
target=fine on random crops (reference baseline_pretrain.py:347-360)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--seed", type=int, default=621)
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from patchfusion_tpu.config import Config, parse_cfg_option
    from patchfusion_tpu.config.registry import DATASETS
    from patchfusion_tpu.data.loader import DataLoader, ShardedSampler
    import patchfusion_tpu.data.u4k  # noqa: F401
    from patchfusion_tpu.engine.checkpoint import save_params
    from patchfusion_tpu.engine.training import (make_branch_train_step,
                                                 make_onecycle_optimizer)
    from patchfusion_tpu.models.builder import build_zoedepth_branch
    from patchfusion_tpu.parallel.mesh import make_mesh
    from patchfusion_tpu.utils.misc import fix_random_seed, setup_logger
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        opts = dict(kv.split("=", 1) for kv in args.cfg_options)
        cfg.merge_from_dict({k: parse_cfg_option(v)
                             for k, v in opts.items()})
    fix_random_seed(args.seed)
    work_dir = args.work_dir or os.path.join(
        "./work_dir", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    logger = setup_logger(log_file=os.path.join(work_dir, "train.log"))

    mcfg = cfg.model
    target = mcfg["target"]
    branch_cfg = mcfg["coarse_branch" if target == "coarse"
                      else "fine_branch"]
    net = build_zoedepth_branch(branch_cfg, mcfg["min_depth"],
                                mcfg["max_depth"])

    ds_cfg = dict(cfg.train_dataloader["dataset"])
    ds = DATASETS.build(ds_cfg)
    sampler = ShardedSampler(len(ds), jax.process_count(),
                             jax.process_index(), shuffle=True,
                             seed=args.seed)
    loader = DataLoader(ds, batch_size=cfg.train_dataloader["batch_size"],
                        sampler=sampler,
                        num_workers=cfg.train_dataloader["num_workers"],
                        drop_last=True)

    tcfg = cfg.train_cfg
    total = max(1, len(loader)) * tcfg["max_epochs"]
    ow = cfg.optim_wrapper
    ps = cfg.param_scheduler
    tx = make_onecycle_optimizer(
        max_lr=ow["optimizer"]["lr"], total_steps=total,
        pct_start=ps.get("pct_start", 0.5),
        div_factor=ps.get("div_factor", 1),
        final_div_factor=ps.get("final_div_factor", 10000),
        weight_decay=ow["optimizer"].get("weight_decay", 0.01),
        clip_norm=ow.get("clip_grad", {}).get("max_norm", 0.1))

    h, w = ds_cfg["transform_cfg"]["network_process_size"]
    params = net.init(jax.random.PRNGKey(args.seed),
                      jnp.zeros((1, h, w, 3)))["params"]
    opt_state = tx.init(params)

    mesh = make_mesh(axis="data")
    data_s = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)
    step = jax.jit(make_branch_train_step(
        net, tx, target=target, min_depth=mcfg["min_depth"],
        max_depth=mcfg["max_depth"]), out_shardings=(repl, repl, repl))

    for epoch in range(1, tcfg["max_epochs"] + 1):
        sampler.set_epoch(epoch)
        for it, batch in enumerate(loader):
            device_batch = {
                k: jax.device_put(v, data_s) for k, v in batch.items()
                if isinstance(v, np.ndarray)}
            params, opt_state, logs = step(params, opt_state, device_batch)
            if it % tcfg.get("log_interval", 100) == 0:
                logger.info("epoch %d iter %d loss %.4f", epoch, it,
                            float(logs["total_loss"]))
        if epoch % tcfg.get("save_checkpoint_interval", 24) == 0 \
                or epoch == tcfg["max_epochs"]:
            if jax.process_index() == 0:
                path = os.path.join(work_dir, f"checkpoint_{epoch:02d}.ckpt")
                save_params(path, params)
                logger.info("saved %s", path)


if __name__ == "__main__":
    main()
