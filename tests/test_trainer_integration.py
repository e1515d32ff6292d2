"""Trainer integration: tiny PatchFusion, synthetic dataset, 2 epochs of DP
training through the full Trainer loop + checkpoint write/read."""

import os

import jax
import numpy as np
import pytest

import __graft_entry__ as graft
from patchfusion_tpu.data.loader import DataLoader
from patchfusion_tpu.engine.checkpoint import load_checkpoint
from patchfusion_tpu.engine.trainer import Trainer
from patchfusion_tpu.engine.training import (create_train_state,
                                             make_onecycle_optimizer,
                                             make_train_step)
from patchfusion_tpu.models.builder import build_patchfusion


class SyntheticU4K:
    """Matches the u4k train-mode sample dict at toy scale."""

    def __init__(self, n=8, rng=None):
        self.n = n
        self.rng = rng or np.random.default_rng(0)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "image_lr": rng.random((42, 56, 3), np.float32),
            "crops_image_hr": rng.random((42, 56, 3), np.float32),
            "depth_gt": rng.random((84, 112, 1), np.float32) * 70 + 1,
            "crop_depths": rng.random((42, 56, 1), np.float32) * 70 + 1,
            "bboxs": np.array([0., 0., 56., 42.], np.float32),
            "img_file_basename": f"img{i}",
        }


def test_trainer_two_epochs(tmp_path):
    config = graft._tiny_config()
    net, tile_cfg = build_patchfusion(config)

    import jax.numpy as jnp
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 42, 56, 3)), jnp.zeros((1, 42, 56, 3)),
                         jnp.asarray([[0., 0., 56., 42.]]))

    loader = DataLoader(SyntheticU4K(8), batch_size=4, num_workers=2,
                        drop_last=True)
    tx = make_onecycle_optimizer(1e-4, total_steps=4)
    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx)
    step = make_train_step(net, tx)
    # snapshot BEFORE training: the Trainer donates the state into the
    # step, so the init arrays' buffers are consumed by the first step
    w0 = np.array(variables["params"]["fusion_conv_0"]["kernel"])
    trainer = Trainer(net, tx, state, step, loader, max_epochs=2,
                      val_interval=10, save_checkpoint_interval=2,
                      log_interval=1, work_dir=str(tmp_path))
    trainer.run()

    assert int(trainer.state.step) == 4
    ck = os.path.join(str(tmp_path), "checkpoint_02.ckpt")
    assert os.path.exists(ck)
    blob = load_checkpoint(ck)
    assert blob["epoch"] == 2
    # frozen branches are excluded (reference get_save_dict semantics)
    assert "coarse_branch" not in blob["trainable"]
    assert "fusion" in blob["trainable"]
    # params actually moved
    w1 = np.asarray(trainer.state.trainable["fusion_conv_0"]["kernel"])
    assert not np.allclose(w0, w1)


class FakeWandb:
    """Captures wandb.log calls (image-panel logging test)."""

    def __init__(self):
        self.logged = []

    class Image:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    def log(self, d):
        self.logged.append(d)


def test_trainer_logs_image_panels(tmp_path):
    """Reference trainer.py:246-268 logs colorized pred/GT/RGB panels during
    training and validation; verify the panels actually reach wandb.log
    (round-1 gap: log_images existed but had no call site)."""
    config = graft._tiny_config()
    net, tile_cfg = build_patchfusion(config)

    import jax.numpy as jnp
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 42, 56, 3)), jnp.zeros((1, 42, 56, 3)),
                         jnp.asarray([[0., 0., 56., 42.]]))
    loader = DataLoader(SyntheticU4K(4), batch_size=2, num_workers=0,
                        drop_last=True)
    tx = make_onecycle_optimizer(1e-4, total_steps=2)
    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx)
    step = make_train_step(net, tx)
    trainer = Trainer(net, tx, state, step, loader, max_epochs=1,
                      val_interval=10, save_checkpoint_interval=10,
                      log_interval=1, train_log_img_interval=2,
                      work_dir=str(tmp_path))
    trainer.wandb = FakeWandb()
    trainer.train_epoch(1)
    panels = [d for d in trainer.wandb.logged if "Train/depth_pred" in d]
    assert len(panels) == 1  # iters 0..1, interval 2 -> logged at iter 0
    assert "Train/rgb" in panels[0] and "Train/depth_gt" in panels[0]
    img = panels[0]["Train/depth_pred"].arr
    assert img.ndim == 3 and img.shape[-1] in (3, 4)  # colorized
