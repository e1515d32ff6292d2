"""Training step + optimizer (reference estimator/trainer/trainer.py wiring:
AdamW + grad-norm clip 0.1 + per-iteration OneCycleLR, configs/**
optim_wrapper/param_scheduler).

The PatchFusion stage trains ONLY the fusion (fusion convs + guided-fusion
U-Net + PF decoder head); both ZoeDepth branches are frozen
(patchfusion.py:112-115). We make that structural: the optimizer state and
gradients exist only for the trainable subtree, and the frozen branch params
ride along as a separate pytree — no masked zero-updates, no wasted memory.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from patchfusion_tpu.models.losses import SILogLoss
from patchfusion_tpu.models.patchfusion import PatchFusionNet

Array = jax.Array

FROZEN_KEYS = ("coarse_branch", "fine_branch")


def split_params(params: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """-> (trainable, frozen): the frozen subtree is the two branches
    (reference patchfusion.py:112-115)."""
    frozen = {k: params[k] for k in FROZEN_KEYS if k in params}
    trainable = {k: v for k, v in params.items() if k not in FROZEN_KEYS}
    return trainable, frozen


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    return {**trainable, **frozen}


def make_onecycle_optimizer(max_lr: float, total_steps: int,
                            pct_start: float = 0.25,
                            div_factor: float = 10.0,
                            final_div_factor: float = 10000.0,
                            base_momentum: float = 0.85,
                            max_momentum: float = 0.95,
                            weight_decay: float = 0.001,
                            clip_norm: float = 0.1) -> optax.GradientTransformation:
    """AdamW + OneCycle (cosine) LR + cycled b1 momentum + norm clipping —
    the reference's mmengine optim_wrapper + torch OneCycleLR
    (configs/.../depthanything_vitl_patchfusion_u4k.py:96-108)."""
    if total_steps > 1:
        # optax's onecycle yields nan when a phase rounds to zero steps
        # (pct_start*total_steps < 1 at tiny step counts) — clamp so both
        # phases are at least one step long
        pct_start = min(max(pct_start, 1.0 / total_steps),
                        1.0 - 1.0 / total_steps)
        lr = optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=max_lr,
            pct_start=pct_start, div_factor=div_factor,
            final_div_factor=final_div_factor)
    else:
        lr = optax.constant_schedule(max_lr / div_factor)

    def b1_schedule(step):
        # torch cycle_momentum: momentum anneals max->base while lr rises,
        # then base->max while lr falls (cosine)
        warm = total_steps * pct_start
        up = jnp.clip(step / jnp.maximum(warm, 1), 0, 1)
        down = jnp.clip((step - warm) / jnp.maximum(total_steps - warm, 1),
                        0, 1)
        cos_up = 0.5 * (1 + jnp.cos(jnp.pi * up))          # 1 -> 0
        cos_down = 0.5 * (1 - jnp.cos(jnp.pi * down))      # 0 -> 1
        m = jnp.where(step <= warm,
                      base_momentum + (max_momentum - base_momentum) * cos_up,
                      base_momentum + (max_momentum - base_momentum)
                      * cos_down)
        return m

    opt = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adamw(
                learning_rate, b1=b1, weight_decay=weight_decay))(
            learning_rate=lr, b1=b1_schedule),
    )
    return opt


class TrainState(NamedTuple):
    step: Array
    trainable: Dict[str, Any]
    frozen: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_state: Any


def create_train_state(params: Dict[str, Any], batch_stats: Dict[str, Any],
                       tx: optax.GradientTransformation,
                       frozen_dtype=None) -> TrainState:
    """frozen_dtype=bf16 is the --amp storage split: the frozen ZoeDepth
    branches (no optimizer state, no gradients) are stored at the compute
    precision, halving their HBM footprint, while the trainable fusion
    params keep f32 masters (the reference's torch.amp analogue,
    tools/train.py:40-44 — there autocast computes in fp16; here the
    bf16-built net computes in bf16 and this controls storage)."""
    trainable, frozen = split_params(params)
    if frozen_dtype is not None:
        frozen = jax.tree.map(
            lambda x: x.astype(frozen_dtype)
            if x.dtype == jnp.float32 else x, frozen)
    return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                      frozen=frozen, batch_stats=batch_stats,
                      opt_state=tx.init(trainable))


def make_train_step(net: PatchFusionNet, tx: optax.GradientTransformation,
                    loss_fn: Optional[SILogLoss] = None,
                    min_depth: float = 1e-3, max_depth: float = 80.0):
    """One SPMD training step (reference trainer.py:219-272 inner loop +
    patchfusion.py:372-397 train forward). Batch dict keys follow the
    reference collect_input_args: image_lr, crops_image_hr, crop_depths,
    bboxs."""
    sig = loss_fn or SILogLoss()

    def step(state: TrainState, batch: Dict[str, Array]
             ) -> Tuple[TrainState, Dict[str, Array]]:
        def loss_of(trainable):
            variables = {"params": merge_params(trainable, state.frozen),
                         "batch_stats": state.batch_stats}
            pred, mutated = net.apply(
                variables, batch["image_lr"], batch["crops_image_hr"],
                batch["bboxs"], train=True, mutable=["batch_stats"],
                method=PatchFusionNet.train_forward)
            loss = sig(pred, batch["crop_depths"], min_depth, max_depth)
            return loss, (mutated["batch_stats"], pred)

        (loss, (new_stats, pred)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.trainable)
        updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(step=state.step + 1, trainable=new_trainable,
                               frozen=state.frozen, batch_stats=new_stats,
                               opt_state=new_opt)
        logs = {"total_loss": loss, "sig_loss": loss,
                "grad_norm": optax.global_norm(grads),
                # first-crop prediction for the trainer's periodic image
                # panels (reference trainer.py:246-268; log_images reads
                # index 0 only). Returning just pred[:1] keeps the Trainer's
                # replicated out_shardings from all-gathering the whole
                # batch prediction on every step
                "pred": pred[:1]}
        return new_state, logs

    return step


def make_branch_train_step(branch_net, tx, target: str = "coarse",
                           min_depth: float = 1e-3, max_depth: float = 80.0):
    """Stage-1/2 pretraining step (reference baseline_pretrain.py:347-360):
    train a single ZoeDepth branch on whole images (coarse) or random crops
    (fine)."""
    sig = SILogLoss()

    def step(params, opt_state, batch):
        x = batch["image_lr"] if target == "coarse" \
            else batch["crops_image_hr"]
        y = batch["depth_gt"] if target == "coarse" \
            else batch["crop_depths"]

        def loss_of(p):
            out = branch_net.apply({"params": p}, x)
            return sig(out["metric_depth"], y, min_depth, max_depth)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, \
            {"total_loss": loss}

    return step
