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
# keys include platform+version so one directory serves CPU and TPU. Set
# before any jax backend init (importing this package precedes jax use in
# all tools). Opt out with JAX_COMPILATION_CACHE_DIR="".
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

from patchfusion_tpu.config import Config, ConfigDict  # noqa: F401
