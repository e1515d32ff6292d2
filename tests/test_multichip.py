"""Multi-chip tests on the 8-device virtual CPU mesh: patch-sharded tiled
inference matches single-device output, and the data-parallel training step
runs with batch sharding (gradient psum + GSPMD SyncBN)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchfusion_tpu.engine.inference import PatchFusionInference
from patchfusion_tpu.engine.training import (create_train_state,
                                             make_onecycle_optimizer,
                                             make_train_step)
from patchfusion_tpu.models.builder import build_patchfusion
from patchfusion_tpu.parallel.mesh import make_mesh

import __graft_entry__ as graft


@pytest.fixture(scope="module")
def tiny():
    config = graft._tiny_config()
    net, tile_cfg = build_patchfusion(config)
    rng = jax.random.PRNGKey(0)
    image_lr = jnp.zeros((1, 42, 56, 3), jnp.float32)
    crops = jnp.zeros((1, 42, 56, 3), jnp.float32)
    bboxs = jnp.asarray([[0., 0., 56., 42.]], jnp.float32)
    variables = net.init(rng, image_lr, crops, bboxs)
    return net, tile_cfg, variables


def test_patch_sharded_inference_matches_single(tiny, rng):
    net, tile_cfg, variables = tiny
    img = rng.random((84, 112, 3), dtype=np.float32)
    lr = rng.random((1, 42, 56, 3), dtype=np.float32)

    single = PatchFusionInference(net, variables, tile_cfg, process_num=2)
    d1 = np.asarray(single.infer(lr, img, cai_mode="m1"))

    mesh = make_mesh(jax.devices()[:4], axis="patch")
    sharded = PatchFusionInference(net, variables, tile_cfg, mesh=mesh)
    d2 = np.asarray(sharded.infer(lr, img, cai_mode="m1"))

    assert d1.shape == d2.shape == (84, 112)
    np.testing.assert_allclose(d1, d2, rtol=2e-4, atol=2e-4)

    # m2: 9 tiles on 4 devices exercises the pad-to-device-multiple path
    d3 = np.asarray(single.infer(lr, img, cai_mode="m2"))
    d4 = np.asarray(sharded.infer(lr, img, cai_mode="m2"))
    np.testing.assert_allclose(d3, d4, rtol=2e-4, atol=2e-4)


def test_dp_train_step_runs_and_syncs(tiny):
    """Gradient correctness across shards: the same global batch must give
    the same update whether run on 1 device or sharded over 8."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    net, tile_cfg, variables = tiny
    tx = make_onecycle_optimizer(1e-4, total_steps=10)
    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx)
    step = make_train_step(net, tx)

    rng = np.random.default_rng(0)
    b = 8
    batch = {
        "image_lr": rng.random((b, 42, 56, 3), dtype=np.float32),
        "crops_image_hr": rng.random((b, 42, 56, 3), dtype=np.float32),
        "crop_depths": (rng.random((b, 42, 56, 1), dtype=np.float32) * 70
                        + 1),
        "bboxs": np.tile(np.array([[0., 0., 56., 42.]], np.float32),
                         (b, 1)),
    }

    # single device
    s1, logs1 = jax.jit(step)(state, batch)

    # 8-way data parallel
    mesh = make_mesh(jax.devices()[:8], axis="data")
    data_s = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sharded_batch = {k: jax.device_put(v, data_s) for k, v in batch.items()}
    s8, logs8 = jax.jit(step, out_shardings=(repl, repl))(
        jax.device_put(state, repl), sharded_batch)

    np.testing.assert_allclose(float(logs1["total_loss"]),
                               float(logs8["total_loss"]), rtol=1e-4)
    # compare one updated weight tensor
    w1 = np.asarray(s1.trainable["fusion_conv_0"]["kernel"])
    w8 = np.asarray(s8.trainable["fusion_conv_0"]["kernel"])
    np.testing.assert_allclose(w1, w8, rtol=1e-4, atol=1e-5)
