"""Persistent XLA compilation-cache setup.

Call `enable_persistent_cache()` AFTER importing jax and BEFORE the first
compile. Setting `JAX_COMPILATION_CACHE_DIR` via `os.environ` inside a tool
does NOT work in this environment: the image's sitecustomize registers the
remote-TPU (axon) PJRT backend at interpreter startup, importing jax before
any tool code runs, so jax's `jax_compilation_cache_dir` config default is
frozen as None and the cache silently never initializes ("cache is
disabled/not initialized" at debug level). That — not a tunnel limitation —
was why rounds 2-4 always recompiled: the axon PJRT plugin serializes AND
deserializes executables fine once the cache is actually on (measured:
second-process cache hit restores in well under a second for a small
program; big engine executables deserialize instead of paying the
multi-minute XLA compile).

The cache key folds the backend's platform_version (libtpu build string),
so entries are stable across processes on the same image.
"""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
REPO_CACHE = os.path.join(_REPO, ".jax_cache")
# CPU-forced runs (tests, dryruns) keep their entries out of the TPU cache
# directory (both are gitignored; they persist on-disk across rounds)
REPO_CACHE_CPU = os.path.join(_REPO, ".jax_cache_cpu")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_seconds: float = 10.0) -> str:
    """Turn on jax's persistent compilation cache at `cache_dir` (default:
    the env var JAX_COMPILATION_CACHE_DIR if set, else <repo>/.jax_cache,
    or <repo>/.jax_cache_cpu when the process forces the CPU platform).
    Returns the directory used."""
    import jax

    if cache_dir is None:
        env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
        if env:
            cache_dir = env
        elif os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            cache_dir = REPO_CACHE_CPU
        else:
            cache_dir = REPO_CACHE
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(os.environ.get(
                          "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          min_compile_seconds)))
    return cache_dir
