"""End-to-end 2-process DP TRAINING run (VERDICT r4 item 4): a REAL
2-process jax.distributed run (4 virtual CPU devices per process = the
8-device data mesh) drives the FULL Trainer loop — per-host ShardedSampler
loader shards assembled into global batch-sharded arrays, the jitted train
step with its XLA-inserted gradient psum (the DDP allreduce equivalent,
reference tools/train.py:164-165), OneCycle/AdamW updates, and rank-0
checkpointing — and its per-step losses must match a single-process run of
the same global batch.

The reference trains batch 4 over 4 GPUs via torch DDP
(docs/user_training.md:72, configs/_base_/datasets/u4k.py:4); this is the
TPU-native mapping BASELINE.md prescribes (reference batch-4 parity =
2 chips x f32 batch 2 or 4 chips x amp batch 1), demonstrated as an actual
multi-process training run rather than a one-step dryrun.

Loss parity tolerance: the 2-process global batch holds the SAME samples as
the single-process batch but interleaved (rank r takes idx[r::world]), so
the mean loss and summed gradients agree up to float reduction order.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Worker: one training process. Run with 4 local virtual devices; two of
# these form the 8-device global data mesh.
WORKER = """
import json, sys
sys.path.insert(0, %r)
import numpy as np

coord, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

from patchfusion_tpu.parallel.mesh import initialize_distributed
initialize_distributed(coord, 2, pid)

import jax
import jax.numpy as jnp
assert jax.process_count() == 2 and len(jax.devices()) == 8, (
    jax.process_count(), len(jax.devices()))

import __graft_entry__ as graft
from patchfusion_tpu.data.loader import DataLoader, ShardedSampler
from patchfusion_tpu.engine.trainer import Trainer
from patchfusion_tpu.engine.training import (create_train_state,
                                             make_onecycle_optimizer,
                                             make_train_step)
from patchfusion_tpu.models.builder import build_patchfusion
from tests.test_trainer_integration import SyntheticU4K

config = graft._tiny_config()
net, tile_cfg = build_patchfusion(config)
variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 42, 56, 3)),
                     jnp.zeros((1, 42, 56, 3)),
                     jnp.asarray([[0., 0., 56., 42.]]))

ds = SyntheticU4K(16)
sampler = ShardedSampler(len(ds), jax.process_count(), jax.process_index(),
                         shuffle=True, seed=7)
# local batch 4 -> global batch 8 over the 8-device mesh
loader = DataLoader(ds, batch_size=4, sampler=sampler, num_workers=1,
                    drop_last=True)
tx = make_onecycle_optimizer(1e-4, total_steps=4)  # 2 epochs x 2 iters
state = create_train_state(variables["params"],
                           variables.get("batch_stats", {}), tx)
step = make_train_step(net, tx)
trainer = Trainer(net, tx, state, step, loader, max_epochs=2,
                  val_interval=10, save_checkpoint_interval=2,
                  log_interval=1, work_dir=out_dir + "/wd%%d" %% pid)

losses = []
inner = trainer._step
def spy(state, batch):
    new_state, logs = inner(state, batch)
    losses.append(float(logs["total_loss"]))
    return new_state, logs
trainer._step = spy
trainer.run()

if pid == 0:
    import os
    ck = os.path.join(out_dir + "/wd0", "checkpoint_02.ckpt")
    with open(out_dir + "/losses.json", "w") as f:
        json.dump({"losses": losses, "step": int(trainer.state.step),
                   "ckpt_exists": os.path.exists(ck)}, f)
print(f"rank {pid}: losses {losses}")
""" % REPO


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_dp_training_matches_single(tmp_path):
    # ---- single-process oracle: same global batches on the 8-device mesh
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as graft
    from patchfusion_tpu.data.loader import DataLoader, ShardedSampler
    from patchfusion_tpu.engine.trainer import Trainer
    from patchfusion_tpu.engine.training import (create_train_state,
                                                 make_onecycle_optimizer,
                                                 make_train_step)
    from patchfusion_tpu.models.builder import build_patchfusion
    from tests.test_trainer_integration import SyntheticU4K

    config = graft._tiny_config()
    net, tile_cfg = build_patchfusion(config)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 42, 56, 3)),
                         jnp.zeros((1, 42, 56, 3)),
                         jnp.asarray([[0., 0., 56., 42.]]))
    ds = SyntheticU4K(16)
    sampler = ShardedSampler(len(ds), 1, 0, shuffle=True, seed=7)
    loader = DataLoader(ds, batch_size=8, sampler=sampler, num_workers=1,
                        drop_last=True)
    tx = make_onecycle_optimizer(1e-4, total_steps=4)
    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx)
    step = make_train_step(net, tx)
    trainer = Trainer(net, tx, state, step, loader, max_epochs=2,
                      val_interval=10, save_checkpoint_interval=10,
                      log_interval=1, work_dir=str(tmp_path / "single"))
    golden = []
    inner = trainer._step

    def spy(state, batch):
        new_state, logs = inner(state, batch)
        golden.append(float(logs["total_loss"]))
        return new_state, logs

    trainer._step = spy
    trainer.run()
    assert len(golden) == 4 and all(np.isfinite(g) for g in golden)

    # ---- the real 2-process run
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    coord = f"localhost:{_free_port()}"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, str(pid), str(tmp_path)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in (0, 1)]
    # this host is a single vCPU: the two workers time-slice one core
    # through the full train-step compile (or cache deserialize), so the
    # budget is generous; warm .jax_cache_cpu runs finish in a few minutes
    for p in procs:
        so, se = p.communicate(timeout=1500)
        assert p.returncode == 0, se[-3000:]

    with open(tmp_path / "losses.json") as f:
        dist = json.load(f)
    assert dist["step"] == 4
    assert dist["ckpt_exists"], "rank-0 checkpoint missing"
    # same samples per global step (interleaved across ranks) -> same mean
    # loss up to reduction order
    np.testing.assert_allclose(dist["losses"], golden, rtol=2e-4)
