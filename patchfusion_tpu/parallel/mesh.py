"""Device mesh + sharding policy.

The reference's only distributed strategies (SURVEY §2.6) are:
  * DDP data parallelism for training/eval (NCCL allreduce,
    reference tools/train.py:164, estimator/utils/dist.py:31-33), and
  * within-host tile batching for inference (baseline_pretrain.py:293-307).

TPU-native mapping: ONE `jax.sharding.Mesh` with
  * a `data` axis — batch-sharded training (gradient psum inserted by XLA;
    BatchNorm reductions over the sharded batch axis give SyncBN for free
    under GSPMD, replacing the reference's convert_syncbn), and
  * a `patch` axis — the tile batch of the inference engine sharded over
    ICI (the reference's process_num loop becomes cross-chip parallelism).

Both axes are the same devices viewed 1-D; training and inference use the
view they need.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data"
              ) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def make_patch_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D `patch` mesh: the tile-batch shard axis of the inference engine
    (ICI tile parallelism — the multi-chip form of the reference's
    process_num loop, baseline_pretrain.py:293-307)."""
    return make_mesh(devices, axis="patch")


def resolve_cli_mesh(arg: str) -> Optional[Mesh]:
    """CLI `--mesh` policy: 'none' -> single-device engine; 'patch' ->
    patch mesh over all local devices (error if only one); 'auto' -> patch
    mesh iff more than one device is visible."""
    n = len(jax.devices())
    if arg == "none":
        return None
    if arg == "patch":
        if n < 2:
            raise SystemExit("--mesh patch needs >1 device "
                             f"(found {n}); use --mesh none")
        return make_patch_mesh()
    if arg == "auto":
        return make_patch_mesh() if n > 1 else None
    raise ValueError(f"unknown mesh policy {arg!r}")


def data_sharding(mesh: Mesh) -> NamedSharding:
    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Device-put a host batch with its leading axis sharded over the mesh."""
    return jax.device_put(x, data_sharding(mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (the reference's `setup_env`/`init_dist`,
    estimator/utils/dist.py:6-42, re-expressed as jax.distributed)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        # warm the cross-process collective context NOW, while all
        # processes are aligned at the initialize rendezvous: the backend
        # (Gloo on CPU) creates its context lazily on the FIRST collective
        # with a hard ~30 s peer timeout — if that first collective is a
        # metric gather issued after minutes of per-rank skew (uneven
        # shards, compile cache differences), context creation times out
        # and the job dies (observed in the 2-process Tester test under
        # load)
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("patchfusion-dist-init")
