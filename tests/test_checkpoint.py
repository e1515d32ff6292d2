"""Checkpoint IO: native msgpack save/load round trip of a TrainState, and
params-only export."""

import jax
import jax.numpy as jnp
import numpy as np

from patchfusion_tpu.engine.checkpoint import (load_checkpoint, load_params,
                                               save_checkpoint, save_params)
from patchfusion_tpu.engine.training import (create_train_state,
                                             make_onecycle_optimizer)


def _tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_trainstate_roundtrip(tmp_path, rng):
    params = {
        "coarse_branch": {"w": rng.random((4, 4), np.float32)},
        "fine_branch": {"w": rng.random((4, 4), np.float32)},
        "fusion_conv_0": {"kernel": rng.random((3, 3, 2, 2), np.float32)},
        "head": {"b": rng.random((8,), np.float32)},
    }
    stats = {"fusion": {"inc": {"bn1": {
        "mean": np.zeros(4, np.float32), "var": np.ones(4, np.float32)}}}}
    tx = make_onecycle_optimizer(1e-4, total_steps=10)
    state = create_train_state(params, stats, tx)
    # frozen branches excluded from the save (reference get_save_dict)
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, epoch=3)
    blob = load_checkpoint(path)
    assert blob["epoch"] == 3
    assert "frozen" not in blob
    _tree_equal(blob["trainable"], state.trainable)
    _tree_equal(blob["batch_stats"], state.batch_stats)

    path2 = str(tmp_path / "w.msgpack")
    save_params(path2, params, stats)
    blob2 = load_params(path2)
    _tree_equal(blob2["params"], params)
    _tree_equal(blob2["batch_stats"], stats)


def test_onecycle_schedule_shape():
    import optax
    tx = make_onecycle_optimizer(1e-4, total_steps=100, pct_start=0.25,
                                 div_factor=10, final_div_factor=10000)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    # drive a few steps; lr hyperparam should rise then fall
    lrs = []
    for i in range(100):
        g = {"w": jnp.ones((3,))}
        _, state = tx.update(g, state, params)
        inner = state[1].hyperparams
        lrs.append(float(inner["learning_rate"]))
    assert abs(max(lrs) - 1e-4) < 1e-6
    assert lrs[0] < 2e-5  # starts at max_lr/div_factor
    assert lrs[-1] < 1e-6  # anneals to max_lr/final_div
    assert np.argmax(lrs) < 35  # peak near pct_start
