"""bf16 mixed-precision training (--amp, the reference tools/train.py:40-44
analogue): the bf16-built net must produce the same loss and the same
gradient *direction* as the f32 step, with f32 trainable masters (optimizer
math unchanged) and bf16-stored frozen branches.

Tolerances: loss tracks within bf16 forward rounding (<5%); gradients are
compared by cosine similarity of the flattened vector — bf16 backward noise
perturbs the norm substantially on a toy random-init model (measured ~35%
on the tiny config), but a conversion/permutation bug would destroy the
direction, which is what we guard."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from patchfusion_tpu.engine.training import (create_train_state,
                                             make_onecycle_optimizer,
                                             merge_params)
from patchfusion_tpu.models.builder import build_patchfusion
from patchfusion_tpu.models.losses import SILogLoss
from patchfusion_tpu.models.patchfusion import PatchFusionNet


def _seeded(variables):
    leaves, treedef = jax.tree.flatten(variables["params"])
    key = jax.random.PRNGKey(0)
    leaves = [0.05 * jax.random.normal(jax.random.fold_in(key, i), l.shape,
                                       jnp.float32).astype(l.dtype)
              if l.dtype in (jnp.float32, jnp.bfloat16) else l
              for i, l in enumerate(leaves)]
    variables["params"] = jax.tree.unflatten(treedef, leaves)
    return variables


def test_amp_train_step_parity():
    cfg = g._tiny_config()
    ex = (jnp.zeros((1, 42, 56, 3)), jnp.zeros((1, 42, 56, 3)),
          jnp.asarray([[0., 0., 56., 42.]]))
    rng = np.random.default_rng(0)
    batch = {"image_lr": jnp.asarray(rng.random((2, 42, 56, 3), np.float32)),
             "crops_image_hr": jnp.asarray(
                 rng.random((2, 42, 56, 3), np.float32)),
             "crop_depths": jnp.asarray(
                 rng.random((2, 42, 56, 1), np.float32) * 40 + 1),
             "bboxs": jnp.tile(jnp.asarray([[0., 0., 56., 42.]]), (2, 1))}
    tx = make_onecycle_optimizer(1e-4, 100)
    sig = SILogLoss()

    outs = {}
    for name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        net, _ = build_patchfusion(cfg, dtype=dtype)
        v = _seeded(g._shape_init(net, *ex))
        st = create_train_state(
            v["params"], v.get("batch_stats", {}), tx,
            frozen_dtype=jnp.bfloat16 if dtype == jnp.bfloat16 else None)
        if dtype == jnp.bfloat16:
            # storage split: frozen branches bf16, trainable masters f32
            assert all(l.dtype == jnp.bfloat16 for l in
                       jax.tree.leaves(st.frozen)
                       if jnp.issubdtype(l.dtype, jnp.floating))
            assert all(l.dtype == jnp.float32 for l in
                       jax.tree.leaves(st.trainable)
                       if jnp.issubdtype(l.dtype, jnp.floating))

        def loss_of(trainable, st=st, net=net):
            variables = {"params": merge_params(trainable, st.frozen),
                         "batch_stats": st.batch_stats}
            pred, _ = net.apply(
                variables, batch["image_lr"], batch["crops_image_hr"],
                batch["bboxs"], train=True, mutable=["batch_stats"],
                method=PatchFusionNet.train_forward)
            return sig(pred, batch["crop_depths"], 1e-3, 80.0)

        loss, grads = jax.jit(jax.value_and_grad(loss_of))(st.trainable)
        # grads are cotangents of the f32 masters -> f32, so the optax
        # update keeps f32 masters under amp
        assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(grads)
                   if jnp.issubdtype(l.dtype, jnp.floating))
        flat = np.concatenate([np.asarray(l, np.float32).ravel()
                               for l in jax.tree.leaves(grads)])
        outs[name] = (float(loss), flat)

    lf, gf = outs["f32"]
    lb, gb = outs["bf16"]
    assert abs(lb - lf) / max(abs(lf), 1e-6) < 0.05, (lf, lb)
    cos = float(np.dot(gf, gb) /
                max(np.linalg.norm(gf) * np.linalg.norm(gb), 1e-12))
    assert cos > 0.9, cos
