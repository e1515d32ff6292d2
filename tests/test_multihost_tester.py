"""End-to-end 2-process Tester run (VERDICT r2 item 3): a REAL 2-process
jax.distributed run drives the FULL eval path — ShardedSampler rank split,
tiled inference per rank, gather_metric_dicts with dataset-size trimming,
dataset.evaluate — and must reproduce the single-process metrics exactly.

The 5-image dataset over 2 ranks exercises the ragged + wraparound-pad case
(each rank sees 3 indices, image 0 duplicated); the reference counterpart is
tools/dist_test.sh -> Tester.run -> collect_results_gpu(results,
len(dataset)) (estimator/tester/tester.py:46-95).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, sys
sys.path.insert(0, %r)
import numpy as np
import jax

coord, pid, data_dir, out_path = (sys.argv[1], int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
from patchfusion_tpu.parallel.mesh import initialize_distributed
initialize_distributed(coord, 2, pid)  # includes the context warm-up sync

import __graft_entry__ as graft
from patchfusion_tpu.api import PatchFusion
from patchfusion_tpu.data.general import ImageDataset
from patchfusion_tpu.data.loader import DataLoader, ShardedSampler
from patchfusion_tpu.engine.tester import Tester

model = PatchFusion.from_config(graft._tiny_config())
ds = ImageDataset(rgb_image_dir=data_dir + "/imgs",
                  gt_dir=data_dir + "/gts", dataset_name="gta",
                  network_process_size=(42, 56),
                  resize_mode="depth-anything", image_resolution=(84, 112))
sampler = ShardedSampler(len(ds), jax.process_count(), jax.process_index())
loader = DataLoader(ds, batch_size=1, sampler=sampler, num_workers=1)
tester = Tester(model.engine(process_num=2), loader,
                work_dir=data_dir + "/out%%d" %% pid)
metrics = tester.run(cai_mode="m1")
if pid == 0:
    with open(out_path, "w") as f:
        json.dump(metrics, f)
print(f"rank {pid}: {len(metrics)} metrics")
""" % REPO


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _make_data(root):
    rng = np.random.default_rng(7)
    os.makedirs(root / "imgs")
    os.makedirs(root / "gts")
    for i in range(5):
        img = (rng.random((84, 112, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "imgs" / f"im{i}.png")
        depth = (rng.random((84, 112)) * 60 + 2).astype(np.float32)
        Image.fromarray((depth * 256).astype(np.uint16)).save(
            root / "gts" / f"im{i}.png")


@pytest.mark.timeout(560)
def test_two_process_tester_matches_single(tmp_path):
    _make_data(tmp_path)

    # single-process oracle (runs on this process's CPU backend)
    import __graft_entry__ as graft
    from patchfusion_tpu.api import PatchFusion
    from patchfusion_tpu.data.general import ImageDataset
    from patchfusion_tpu.data.loader import DataLoader
    from patchfusion_tpu.engine.tester import Tester

    model = PatchFusion.from_config(graft._tiny_config())
    ds = ImageDataset(rgb_image_dir=str(tmp_path / "imgs"),
                      gt_dir=str(tmp_path / "gts"), dataset_name="gta",
                      network_process_size=(42, 56),
                      resize_mode="depth-anything",
                      image_resolution=(84, 112))
    loader = DataLoader(ds, batch_size=1, num_workers=1)
    golden = Tester(model.engine(process_num=2), loader,
                    work_dir=str(tmp_path / "out")).run(cai_mode="m1")
    assert golden and all(np.isfinite(v) for v in golden.values())

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out = tmp_path / "metrics.json"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 device per process
    coord = f"localhost:{_free_port()}"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, str(pid), str(tmp_path),
         str(out)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in (0, 1)]
    for p in procs:
        so, se = p.communicate(timeout=540)
        assert p.returncode == 0, se[-3000:]

    with open(out) as f:
        dist = json.load(f)
    assert set(dist) == set(golden)
    for k in golden:
        np.testing.assert_allclose(dist[k], golden[k], rtol=1e-5,
                                   err_msg=k)
