"""train_remat must be a pure memory/compute tradeoff: identical param
tree, identical loss and gradients (nn.remat is a lift transform). Without
it a batch-4 vitl train step needs 42 GB — 2.7x a v5e chip (BASELINE.md
"Training step on v5e-1")."""

import jax
import jax.numpy as jnp

import __graft_entry__ as g
from patchfusion_tpu.engine.training import (create_train_state,
                                             make_onecycle_optimizer,
                                             make_train_step)
from patchfusion_tpu.models.builder import build_patchfusion


def test_remat_train_step_identical():
    cfg = g._tiny_config()
    net0, _ = build_patchfusion(cfg)
    cfg_r = dict(cfg, train_remat=True)
    net1, _ = build_patchfusion(cfg_r)

    ex = (jnp.zeros((1, 42, 56, 3)), jnp.zeros((1, 42, 56, 3)),
          jnp.asarray([[0., 0., 56., 42.]]))
    v0 = g._shape_init(net0, *ex)
    v1 = g._shape_init(net1, *ex)
    assert jax.tree.map(lambda a: a.shape, v0) == \
        jax.tree.map(lambda a: a.shape, v1)

    tx = make_onecycle_optimizer(1e-4, 100)
    batch = {"image_lr": jnp.ones((2, 42, 56, 3)) * 0.3,
             "crops_image_hr": jnp.ones((2, 42, 56, 3)) * 0.4,
             "crop_depths": jnp.ones((2, 42, 56, 1)) * 5.0,
             "bboxs": jnp.tile(jnp.asarray([[0., 0., 56., 42.]]), (2, 1))}
    outs = []
    for net, v in [(net0, v0), (net1, v1)]:
        st = create_train_state(v["params"], v.get("batch_stats", {}), tx)
        _, logs = jax.jit(make_train_step(net, tx))(st, batch)
        outs.append((float(logs["total_loss"]), float(logs["grad_norm"])))
    assert outs[0] == outs[1], outs
