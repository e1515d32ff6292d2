"""Inference/evaluation run loop (reference estimator/tester/tester.py).

Per-image tiled inference through the compiled engine, optional colorized +
uint16 PNG artifact dumps (tester.py:66-76), metric computation against GT
with SEE boundary edges, and cross-process metric gathering (tester.py:
78-95). Rank-sharding of the dataset happens in the loader's ShardedSampler.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import numpy as np

from patchfusion_tpu.utils.misc import setup_logger


class Tester:
    __test__ = False  # not a pytest class despite the Test* name

    def __init__(self, engine, dataloader, work_dir: str = "./work_dir",
                 save: bool = False, gray_scale: bool = False, logger=None):
        self.engine = engine
        self.dataloader = dataloader
        self.work_dir = work_dir
        self.save = save
        self.gray_scale = gray_scale
        self.logger = logger or setup_logger()

    def _rebucket(self, image_raw_shape):
        """Engine for a non-default raw resolution (reference tester.py:46
        `image_raw_shape` argument -> prepare_tile_cfg re-bucketing). The
        compiled engine is shape-static, so a different raw shape needs a
        fresh engine over a re-derived TileConfig; everything else (net,
        variables, chunking, mesh) carries over."""
        tc = getattr(self.engine, "tile_cfg", None)
        if tc is None or tuple(image_raw_shape) == tuple(tc.image_raw_shape):
            return self.engine
        from patchfusion_tpu.engine.inference import PatchFusionInference
        from patchfusion_tpu.models.patchfusion import TileConfig
        new_tc = TileConfig(tuple(image_raw_shape), tc.patch_split_num,
                            tc.patch_process_shape)
        return PatchFusionInference(
            self.engine.net, self.engine.variables, new_tc,
            process_num=self.engine.process_num, fusion=self.engine.fusion,
            mesh=self.engine.mesh, patch_axis=self.engine.patch_axis,
            rn_times_process_num=self.engine.rn_times_process_num,
            chunk_policy=self.engine.chunk_policy)

    def run(self, cai_mode: str = "m1",
            image_raw_shape=None, seed: int = 0) -> Dict[str, float]:
        rng = np.random.default_rng(seed)
        results: List[Dict[str, float]] = []
        dataset = self.dataloader.dataset
        engine = (self._rebucket(image_raw_shape)
                  if image_raw_shape is not None else self.engine)
        if self.save:
            os.makedirs(self.work_dir, exist_ok=True)

        for i, batch in enumerate(self.dataloader):
            image_lr = np.asarray(batch["image_lr"])
            image_hr = np.asarray(batch["image_hr"])[0]
            depth = engine.infer(image_lr, image_hr, cai_mode=cai_mode,
                                 rng=rng)
            depth = np.asarray(depth)

            if self.save:
                from patchfusion_tpu.utils.colorize import save_depth_png
                base = batch["img_file_basename"][0]
                save_depth_png(
                    depth,
                    os.path.join(self.work_dir, f"{base}.png"),
                    os.path.join(self.work_dir, f"{base}_uint16.png"),
                    gray_scale=self.gray_scale)

            if "depth_gt" in batch:
                metrics = dataset.get_metrics(
                    np.asarray(batch["depth_gt"])[0],
                    depth,
                    disp_gt_edges=np.asarray(batch["boundary"])[0]
                    if "boundary" in batch else None)
                results.append(metrics)
            if i % 10 == 0:
                self.logger.info("tested %d/%d", i + 1,
                                 len(self.dataloader))

        if jax.process_count() > 1:
            from patchfusion_tpu.parallel.gather import gather_metric_dicts
            # size trims the ShardedSampler wraparound duplicates, the
            # reference collect_results_gpu(results, len(dataset)) behavior
            results = gather_metric_dicts(results, size=len(dataset))
        if not results:
            return {}
        return dataset.evaluate(results, logger=self.logger)
