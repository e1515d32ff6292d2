"""Engine chunking invariance: the process_num memory cap must not change
results (divisor chunks, single-stream pass batching)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as graft
from patchfusion_tpu.engine.inference import PatchFusionInference, _chunked
from patchfusion_tpu.models.builder import build_patchfusion


def test_chunked_greedy_selection():
    calls = []

    def fn(x):
        calls.append(x.shape[0])
        return x * 2

    x = jnp.arange(12.0)[:, None]
    out = _chunked(fn, [x], chunk=8)  # greedy: 8 + remainder 4
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2)
    assert calls[0] == 8 and calls[-1] == 4

    out = _chunked(fn, [x], chunk=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2)


def test_engine_chunking_invariance(rng):
    config = graft._tiny_config()
    net, tile_cfg = build_patchfusion(config)
    lr = jnp.zeros((1, 42, 56, 3))
    crops = jnp.zeros((1, 42, 56, 3))
    bboxs = jnp.asarray([[0., 0., 56., 42.]])
    variables = net.init(jax.random.PRNGKey(0), lr, crops, bboxs)

    image_lr = rng.random((1, 42, 56, 3), dtype=np.float32)
    image_hr = rng.random((84, 112, 3), dtype=np.float32)
    outs = []
    for pn in (None, 2):
        eng = PatchFusionInference(net, variables, tile_cfg, process_num=pn)
        outs.append(np.asarray(eng.infer(image_lr, image_hr,
                                         cai_mode="m1")))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-4)


def test_infer_batch_matches_per_image(rng):
    """infer_batch (batched coarse pass + lax.map tile streams) must equal
    B independent per-image infer calls for every mode."""
    config = graft._tiny_config()
    net, tile_cfg = build_patchfusion(config)
    lr = jnp.zeros((1, 42, 56, 3))
    crops = jnp.zeros((1, 42, 56, 3))
    bboxs = jnp.asarray([[0., 0., 56., 42.]])
    variables = net.init(jax.random.PRNGKey(0), lr, crops, bboxs)

    b = 3
    images_lr = rng.random((b, 1, 42, 56, 3), dtype=np.float32)
    images_hr = rng.random((b, 84, 112, 3), dtype=np.float32)
    eng = PatchFusionInference(net, variables, tile_cfg, process_num=2)

    # r4 exercises the m2 shifted passes too (mode "r" includes them)
    for cai_mode in ("m1", "r4"):
        rand = None
        if cai_mode.startswith("r"):
            n = (int(cai_mode[1:]) // 2) * 2
            rand = np.stack([eng.random_origins(n, np.random.default_rng(i))
                             for i in range(b)])
        singles = [np.asarray(eng.infer(
            images_lr[i], images_hr[i], cai_mode=cai_mode,
            rand_origins=None if rand is None else rand[i]))
            for i in range(b)]
        batched = np.asarray(eng.infer_batch(
            images_lr[:, 0], images_hr, cai_mode=cai_mode,
            rand_origins=rand))
        assert batched.shape == (b,) + singles[0].shape
        for i in range(b):
            np.testing.assert_allclose(batched[i], singles[i],
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"{cai_mode} image {i}")


def test_chunked_divisor_policy():
    """divisor policy: one uniform body, no remainder call."""
    shapes = []

    def fn(x):
        shapes.append(x.shape[0])
        return x * 2

    x = jnp.arange(49.0)[:, None]
    out = _chunked(fn, [x], chunk=16, policy="divisor")  # -> 7x7
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2)
    assert set(shapes) == {7}
