"""patchfusion_tpu — a TPU-native (JAX/XLA/Pallas) framework for tile-based
high-resolution monocular metric depth estimation.

Re-designed from scratch with the capabilities of zhyever/PatchFusion
(CVPR 2024): a coarse whole-image depth network, a fine per-tile depth
network, and a guided-fusion network with global-to-local attention that
stitches per-tile metric depth into seamless 4K output.

Design principles (TPU-first, not a torch port):
  * static shapes everywhere — one compiled XLA program per
    (image_raw_shape, patch_split_num, cai_mode) bucket;
  * tiles are a batch axis: `vmap`/sharded batches instead of Python loops;
  * resize / roi_align are expressed as separable interpolation matmuls that
    run on the MXU;
  * NHWC layout throughout (TPU-preferred), converted at the torch-checkpoint
    boundary;
  * multi-chip = `jax.sharding.Mesh` with a `data` axis (training) and a
    `patch` axis (tile-parallel inference) over ICI.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compile cache for every entry point (CLI tools, tests,
# subprocess smokes): full-scale programs take minutes to compile; cache
# keys include platform+version so one directory serves CPU and TPU.
# Opt out with JAX_COMPILATION_CACHE_DIR="".
#
# The env var alone is NOT enough in this image: sitecustomize registers
# the remote-TPU backend at interpreter startup, importing jax before any
# tool/package code runs, which freezes jax's jax_compilation_cache_dir
# config default as None — the cache then silently never initializes
# (this was the round-2..4 "executables never persist" mystery). So apply
# the directory through jax.config.update too (utils/cache.py).
if _os.environ.get("JAX_COMPILATION_CACHE_DIR") != "":
    from patchfusion_tpu.utils.cache import (
        enable_persistent_cache as _enable_persistent_cache)
    # export the chosen dir so child processes and dir-listing diagnostics
    # (bench.py) agree with the live config
    _os.environ["JAX_COMPILATION_CACHE_DIR"] = _enable_persistent_cache()

from patchfusion_tpu.config import Config, ConfigDict  # noqa: F401
