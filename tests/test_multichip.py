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


def test_rn_sharded_matches_single(tiny, rng):
    """rN with injected origins: the mesh engine (tile groups = device
    count) and the single-device engine (groups = process_num) blend the
    same random tiles to the same raw-res canvas."""
    net, tile_cfg, variables = tiny
    img = rng.random((84, 112, 3), dtype=np.float32)
    lr = rng.random((1, 42, 56, 3), dtype=np.float32)
    origins = np.stack([rng.integers(0, 84 - 42, 8),
                        rng.integers(0, 112 - 56, 8)], -1).astype(np.int32)

    single = PatchFusionInference(net, variables, tile_cfg, process_num=2)
    d1 = np.asarray(single.infer(lr, img, cai_mode="r8",
                                 rand_origins=origins))

    mesh = make_mesh(jax.devices()[:4], axis="patch")
    sharded = PatchFusionInference(net, variables, tile_cfg, mesh=mesh)
    d2 = np.asarray(sharded.infer(lr, img, cai_mode="r8",
                                  rand_origins=origins))
    assert d1.shape == d2.shape == (84, 112)
    np.testing.assert_allclose(d1, d2, rtol=2e-4, atol=2e-4)


def test_shard_report():
    """The scaling ledger: tile counts, padding waste, coarse replication —
    at toy scale and at the canonical p49 4x4 split on 8 devices."""
    from patchfusion_tpu.models.patchfusion import TileConfig

    tc = TileConfig((84, 112), (2, 2), (42, 56))
    mesh = make_mesh(jax.devices()[:4], axis="patch")
    eng = PatchFusionInference(None, {}, tc, mesh=mesh)
    r = eng.shard_report("m2")
    assert r["pass_tiles"] == [4, 2, 2, 1] and r["regular_tiles"] == 9
    assert r["regular_padded"] == 12 and r["devices"] == 4
    assert r["coarse_pass_replicas"] == 4

    r8 = eng.shard_report("r8")
    assert r8["random_tiles"] == 8 and r8["random_padded"] == 8
    assert r8["tiles_per_device"] == (12 + 8) // 4

    # canonical: p49 (m2 at 4x4) on a v5e-8 pads 49 -> 56, 12.5% waste
    tc49 = TileConfig((2160, 3840), (4, 4), (392, 518))
    mesh8 = make_mesh(jax.devices()[:8], axis="patch")
    eng49 = PatchFusionInference(None, {}, tc49, mesh=mesh8)
    r49 = eng49.shard_report("m2")
    assert r49["regular_tiles"] == 49 and r49["regular_padded"] == 56
    assert r49["padding_waste_frac"] == 0.125
    assert eng49.shard_report("m1")["padding_waste_frac"] == 0.0
