"""Evaluation / inference CLI (reference tools/test.py).

--test-type selects the dataloader (normal=val, test_in, test_out,
general); --cai-mode m1/m2/rN; --ckp-path accepts either the native .ckpt,
a triple 'coarse.pth,fine.pth,fusion.pth', or a HF snapshot directory.
(The reference's --test-type consistency is a documented dead path —
tester.run_consistency does not exist there; not reproduced.)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Test PatchFusion (TPU)")
    p.add_argument("config")
    p.add_argument("--ckp-path", default=None)
    p.add_argument("--work-dir", default="./work_dir/test")
    p.add_argument("--test-type", default="normal",
                   choices=["normal", "test_in", "test_out", "general"])
    p.add_argument("--cai-mode", default="m1")
    p.add_argument("--process-num", type=int, default=4)
    p.add_argument("--chunk-policy", default="greedy",
                   choices=["greedy", "divisor"],
                   help="tile chunking: greedy (fastest) or divisor "
                        "(single compiled chunk body, lighter cold start)")
    p.add_argument("--mesh", default="auto",
                   choices=["auto", "patch", "none"],
                   help="shard the tile batch over a `patch` device mesh "
                        "(ICI tile parallelism); auto = when >1 device")
    p.add_argument("--image-raw-shape", nargs="+", type=int,
                   default=[2160, 3840])
    p.add_argument("--patch-split-num", nargs="+", type=int, default=[4, 4])
    p.add_argument("--save", action="store_true")
    p.add_argument("--gray-scale", action="store_true")
    p.add_argument("--image-dir", default=None,
                   help="general mode: folder of images")
    p.add_argument("--gt-dir", default=None)
    p.add_argument("--dataset-name", default="")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def main():
    args = parse_args()

    from patchfusion_tpu.config import Config, parse_cfg_option
    from patchfusion_tpu.config.registry import DATASETS
    from patchfusion_tpu.data.loader import DataLoader, ShardedSampler
    import patchfusion_tpu.data.u4k  # noqa: F401
    import patchfusion_tpu.data.general  # noqa: F401
    from patchfusion_tpu.engine.tester import Tester
    from patchfusion_tpu.models.patchfusion import TileConfig
    from patchfusion_tpu.utils.misc import setup_logger

    import jax

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        opts = dict(kv.split("=", 1) for kv in args.cfg_options)
        cfg.merge_from_dict({k: parse_cfg_option(v)
                             for k, v in opts.items()})

    logger = setup_logger()
    ckp = args.ckp_path
    from patchfusion_tpu.parallel.mesh import resolve_cli_mesh
    mesh = resolve_cli_mesh(args.mesh)
    if mesh is not None:
        logger.info("patch mesh: %d devices", mesh.devices.size)

    if cfg.model["type"] == "BaselinePretrain":
        # stage-1/2 branch eval (reference baseline_pretrain.py:364-419)
        from patchfusion_tpu.api import BaselinePretrain
        mcfg = cfg.model
        target = mcfg["target"]
        branch_cfg = mcfg["coarse_branch" if target == "coarse"
                          else "fine_branch"]
        pps = cfg.train_dataloader["dataset"]["transform_cfg"][
            "network_process_size"]
        kw = dict(target=target,
                  image_raw_shape=tuple(args.image_raw_shape),
                  patch_split_num=tuple(args.patch_split_num),
                  patch_process_shape=tuple(pps), mesh=mesh)
        if ckp and ckp.endswith(".pth"):
            model = BaselinePretrain.from_torch(
                branch_cfg, mcfg["min_depth"], mcfg["max_depth"], ckp, **kw)
        else:
            model = BaselinePretrain(branch_cfg, mcfg["min_depth"],
                                     mcfg["max_depth"], **kw)
            if ckp:
                from patchfusion_tpu.engine.checkpoint import load_params
                model.params = load_params(ckp)["params"]

        class _Engine:
            def infer(self, image_lr, image_hr, cai_mode="m1", rng=None):
                return model.infer(image_lr=image_lr, image_hr=image_hr,
                                   cai_mode=cai_mode,
                                   process_num=args.process_num, rng=rng)
        engine = _Engine()
    else:
        from patchfusion_tpu.api import PatchFusion
        mc = cfg.model["config"]
        if ckp and os.path.isdir(ckp):
            model = PatchFusion.from_pretrained(ckp)
        elif ckp and "," in ckp:
            paths = ckp.split(",")
            model = PatchFusion.from_config(
                mc, ckpts=(paths[0], paths[1],
                           paths[2] if len(paths) > 2 else None))
        else:
            model = PatchFusion.from_config(mc)
            if ckp:
                from patchfusion_tpu.engine.checkpoint import load_checkpoint
                blob = load_checkpoint(ckp)
                model.variables["params"].update(blob["trainable"])
                model.variables["batch_stats"] = blob.get("batch_stats", {})

        tile_cfg = TileConfig(tuple(args.image_raw_shape),
                              tuple(args.patch_split_num),
                              model.tile_cfg.patch_process_shape)
        engine = model.engine(args.process_num, tile_cfg, mesh=mesh,
                              chunk_policy=args.chunk_policy)
        if mesh is not None:
            logger.info("shard report (%s): %s", args.cai_mode,
                        engine.shard_report(args.cai_mode))

    if args.test_type == "general":
        dcfg = dict(cfg.general_dataloader)
        ds_cfg = dict(dcfg["dataset"])
        if args.image_dir:
            ds_cfg["rgb_image_dir"] = args.image_dir
        if args.gt_dir:
            ds_cfg["gt_dir"] = args.gt_dir
        if args.dataset_name:
            ds_cfg["dataset_name"] = args.dataset_name
        ds_cfg["image_resolution"] = tuple(args.image_raw_shape)
    else:
        key = {"normal": "val_dataloader", "test_in": "test_in_dataloader",
               "test_out": "test_out_dataloader"}[args.test_type]
        dcfg = dict(cfg[key])
        ds_cfg = dict(dcfg["dataset"])

    dataset = DATASETS.build(ds_cfg)
    sampler = ShardedSampler(len(dataset), jax.process_count(),
                             jax.process_index())
    loader = DataLoader(dataset, batch_size=1, sampler=sampler,
                        num_workers=dcfg.get("num_workers", 2))

    tester = Tester(engine, loader, work_dir=args.work_dir, save=args.save,
                    gray_scale=args.gray_scale, logger=logger)
    metrics = tester.run(cai_mode=args.cai_mode)
    if metrics:
        logger.info("metrics: %s", metrics)


if __name__ == "__main__":
    main()
