"""Training run loop (reference estimator/trainer/trainer.py).

Epoch-based loop with per-iteration OneCycle stepping, periodic validation
with cross-process metric gathering, checkpointing (fusion-only save for
PatchFusion, matching reference get_save_dict patchfusion.py:179-187), and
optional wandb logging. SPMD data parallelism: the jitted train step runs
under a `data` mesh with batch-sharded inputs and replicated state; XLA
inserts the gradient psum (the DDP allreduce equivalent).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from patchfusion_tpu.engine.checkpoint import save_checkpoint
from patchfusion_tpu.engine.training import TrainState
from patchfusion_tpu.parallel.mesh import make_mesh
from patchfusion_tpu.utils.misc import setup_logger

BATCH_KEYS = ("image_lr", "crops_image_hr", "depth_gt", "crop_depths",
              "bboxs")
# keys the jitted train step actually consumes (engine/training.py); the
# rest of collect_input_args (depth_gt, image_hr) are log-only in the
# reference train loop too — uploading a 66 MB 4K GT tensor per step
# through the remote-TPU tunnel would dominate step time
STEP_KEYS = ("image_lr", "crops_image_hr", "crop_depths", "bboxs")


def collect_input(batch: Dict[str, Any], collect_keys) -> Dict[str, Any]:
    """Whitelist the batch keys that reach the model (reference
    trainer.py:128-134 + config collect_input_args)."""
    return {k: batch[k] for k in collect_keys if k in batch}


class Trainer:
    def __init__(self, net, tx, state: TrainState, train_step: Callable,
                 train_loader, val_loader=None, val_fn=None,
                 max_epochs: int = 16, val_interval: int = 2,
                 save_checkpoint_interval: int = 16, log_interval: int = 100,
                 work_dir: str = "./work_dir", use_wandb: bool = False,
                 collect_keys=BATCH_KEYS, eval_start: int = 0,
                 train_log_img_interval: int = 500,
                 val_log_img_interval: int = 50,
                 logger=None, donate: bool = True, start_epoch: int = 0):
        self.net = net
        self.tx = tx
        self.state = state
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.val_fn = val_fn
        self.max_epochs = max_epochs
        # resume continues AFTER the checkpoint's epoch (reference
        # trainer.py resume semantics: epoch loop picks up where it left)
        self.start_epoch = start_epoch
        self.val_interval = val_interval
        self.save_interval = save_checkpoint_interval
        self.log_interval = log_interval
        self.work_dir = work_dir
        self.collect_keys = collect_keys
        self.eval_start = eval_start
        self.train_log_img_interval = train_log_img_interval
        self.val_log_img_interval = val_log_img_interval
        self.logger = logger or setup_logger()
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                self.wandb = wandb
            except ImportError:
                self.logger.warning("wandb unavailable; logging to console")

        # the global batch must divide over the data axis; drop to the
        # largest usable device count otherwise
        ndev = len(jax.devices())
        batch = getattr(train_loader, "batch_size", 1) * jax.process_count()
        while ndev > 1 and batch % ndev != 0:
            ndev -= 1
        self.mesh = make_mesh(jax.devices()[:ndev], axis="data")
        self.data_sharding = NamedSharding(self.mesh, P("data"))
        self.repl = NamedSharding(self.mesh, P())
        self.state = jax.device_put(self.state, self.repl)
        # Donating the state into the step saves the ~3 GB old/new
        # params+opt coexistence (measured in tools/profile_train.py) — the
        # margin that lets the reference-recipe vitl step fit one v5e chip.
        # Safe with the in-training validation engine because val_fn
        # reassigns `val_engine.variables` from the LIVE `self.state` on
        # every call (tools/train.py) — the unchanged frozen branches alias
        # straight through the step (donated input buffer == output buffer),
        # so no stale reference is ever dereferenced.
        self._jit_step = jax.jit(train_step,
                                 out_shardings=(self.repl, self.repl),
                                 donate_argnums=(0,) if donate else ())
        # the public handle (tests may wrap it to spy on losses)
        self._step = self._jit_step
        self._first_step_synced = False

    def _sync_before_first_step(self, device_batch) -> None:
        """Multi-process runs: compile the train step ahead-of-time and
        rendezvous before the first execution. The CPU (Gloo) and DCN
        collective contexts initialize lazily on the FIRST collective with
        a hard ~30 s peer timeout; per-process compile skew (minutes for
        the full-scale step) otherwise kills the job at the step's gradient
        psum ("Gloo context initialization failed: DEADLINE_EXCEEDED",
        observed on the 2-process virtual-mesh run). The AOT compile lands
        in the persistent compile cache, so the subsequent jit call pays a
        deserialize at worst."""
        if self._first_step_synced:
            return
        self._first_step_synced = True
        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils
        self._jit_step.lower(self.state, device_batch).compile()
        multihost_utils.sync_global_devices("pf-train-first-step")

    def _put(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        multiproc = jax.process_count() > 1
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                if multiproc:
                    # each process loads only ITS sampler shard (reference
                    # DistributedSampler semantics, tools/train.py:174); the
                    # per-host local batch assembles into one global
                    # batch-sharded array over the data mesh
                    out[k] = jax.make_array_from_process_local_data(
                        self.data_sharding, v)
                else:
                    out[k] = jax.device_put(v, self.data_sharding)
        return out

    def train_epoch(self, epoch: int) -> None:
        if hasattr(self.train_loader, "sampler"):
            self.train_loader.sampler.set_epoch(epoch)
        t0 = time.time()
        it = -1
        for it, batch in enumerate(self.train_loader):
            device_batch = self._put(collect_input(
                batch, [k for k in self.collect_keys if k in STEP_KEYS]))
            self._sync_before_first_step(device_batch)
            self.state, logs = self._step(self.state, device_batch)
            if it % self.log_interval == 0:
                # host readback = a pipeline sync point; at the default
                # interval (100) it costs <0.1% of step time, but don't
                # lower log_interval to 1 on a remote-tunnel TPU
                loss = float(logs["total_loss"])
                dt = time.time() - t0
                self.logger.info(
                    "epoch %d iter %d loss %.4f (%.2fs/it)", epoch, it,
                    loss, dt / max(it, 1))
                if self.wandb:
                    self.wandb.log({"Train/total_loss": loss,
                                    "epoch": epoch})
            if it % self.train_log_img_interval == 0:
                self.log_images(batch, logs.get("pred"), epoch,
                                prefix="Train")
        jax.block_until_ready(self.state.step)
        dt = time.time() - t0
        # local_devices: in multi-process runs jax.devices()[0] is the
        # GLOBAL first device, which is non-addressable on ranks > 0 and
        # memory_stats() raises INVALID_ARGUMENT there
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:  # CPU backends may not implement memory_stats
            stats = {}
        peak = stats.get("peak_bytes_in_use")
        self.logger.info(
            "epoch %d done: %d iters in %.1fs (%.2f steps/s)%s", epoch,
            it + 1, dt, (it + 1) / max(dt, 1e-9),
            f", peak HBM {peak / 2**30:.2f} GiB" if peak else "")

    def log_images(self, batch: Dict[str, Any], pred, epoch: int,
                   prefix: str = "Train") -> None:
        """Colorized depth/GT/RGB panels (reference trainer.py:55-125)."""
        if self.wandb is None:
            return
        from patchfusion_tpu.utils.colorize import colorize
        rgb = np.asarray(batch.get("crops_image_hr",
                                   batch.get("image_lr")))[0]
        panels = {f"{prefix}/rgb": self.wandb.Image(rgb)}
        if pred is not None:
            panels[f"{prefix}/depth_pred"] = self.wandb.Image(
                colorize(np.asarray(pred)[0, ..., 0]))
        gt = batch.get("crop_depths", batch.get("depth_gt"))
        if gt is not None:
            panels[f"{prefix}/depth_gt"] = self.wandb.Image(
                colorize(np.asarray(gt)[0, ..., 0]))
        self.wandb.log(panels)

    def val_epoch(self, epoch: int) -> Optional[Dict[str, float]]:
        """Validation (reference trainer.py:137-216): per-image inference +
        metric gather across processes."""
        if self.val_loader is None or self.val_fn is None:
            return None
        t0 = time.time()
        results = []
        for it, batch in enumerate(self.val_loader):
            r = self.val_fn(self.state, batch)
            # val_fn may return (metrics, depth) to enable image panels
            # (reference trainer.py:152-189 logs every val_log_img_interval)
            if isinstance(r, tuple):
                metrics_i, depth = r
                if it % self.val_log_img_interval == 0:
                    self.log_images(batch, np.asarray(depth)[None, ..., None],
                                    epoch, prefix="Val")
                results.append(metrics_i)
            else:
                results.append(r)
        if jax.process_count() > 1:
            from patchfusion_tpu.parallel.gather import gather_metric_dicts
            results = gather_metric_dicts(
                results, size=len(self.val_loader.dataset))
        metrics = self.val_loader.dataset.evaluate(results,
                                                   logger=self.logger)
        # the training stall a val epoch costs (per-image tiled inference;
        # first call per run also pays the m1 engine compile)
        self.logger.info("val epoch %d: %d images in %.1fs wall", epoch,
                         len(results), time.time() - t0)
        if self.wandb:
            self.wandb.log({f"Val/{k}": v for k, v in metrics.items()})
        return metrics

    def save(self, epoch: int) -> None:
        if jax.process_index() != 0:
            return
        os.makedirs(self.work_dir, exist_ok=True)
        path = os.path.join(self.work_dir, f"checkpoint_{epoch:02d}.ckpt")
        save_checkpoint(path, self.state, epoch)
        self.logger.info("saved checkpoint to %s", path)

    def run(self) -> None:
        for epoch in range(self.start_epoch + 1, self.max_epochs + 1):
            self.train_epoch(epoch)
            if epoch >= self.eval_start and epoch % self.val_interval == 0:
                self.val_epoch(epoch)
            if epoch % self.save_interval == 0 or epoch == self.max_epochs:
                self.save(epoch)
