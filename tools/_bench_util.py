"""Timing helpers that survive the remote-TPU (axon) tunnel.

Two problems with naive timing here:
  * `block_until_ready` can return before execution finishes — fence by
    reading back a scalar that depends on the whole output;
  * every dispatch+readback pays a ~tens-of-ms host<->device round trip,
    which swamps sub-100ms measurements.

`device_time` solves both: it runs `inner` iterations of the op INSIDE one
jit program (lax.scan with a forced data dependency between iterations so
XLA cannot CSE or parallelize them), fences once, and divides. The reported
time is pure device time per iteration plus RTT/inner.
"""

import functools
import time

import jax
import jax.numpy as jnp


def fetch(out) -> float:
    """Host readback of a scalar depending on the whole (pytree) output."""
    acc = 0.0
    for leaf in jax.tree.leaves(out):
        acc = acc + jnp.sum(jnp.abs(jnp.ravel(leaf)[:1]).astype(jnp.float32))
    return float(acc)


def device_time(fn, args, inner: int = 10, repeats: int = 3) -> float:
    """Median per-iteration device time of fn(*args).

    fn's first argument must be an array (the dependency is threaded through
    it); remaining args are closed over unchanged.
    """
    first, rest = args[0], args[1:]

    @functools.partial(jax.jit, static_argnums=())
    def loop(x0, *rest):
        def body(carry, _):
            x, _prev = carry
            # optimization_barrier ties EVERY argument to the loop-varying
            # carry: without it XLA hoists subgraphs that depend only on
            # loop-invariant args out of the scan and the measurement
            # undercounts (observed 10x for multi-input modules)
            x_it, *rest_it = jax.lax.optimization_barrier((x, *rest))
            out = fn(x_it, *rest_it)
            # serialize iterations with a REAL data dependency on EVERY
            # element of EVERY output leaf. Two earlier forms were wrong:
            #   * `leaf*0` — the algebraic simplifier folds mul-by-zero,
            #     deleting the carry chain (measured ABOVE the MXU peak);
            #   * `ravel(leaf)[0]` — a slice directly on the output lets
            #     XLA dead-code-NARROW the op under test (a matmul whose
            #     only consumer is one element becomes a single dot row:
            #     single-op probes read 2x+ peak, and multi-output modules
            #     lose every leaf after the first).
            # A max over all leaves is not distributable over the op's
            # algebra and consumes all elements; its cost is a VPU
            # reduction XLA fuses into the producer's epilogue. The
            # 1e-30-scaled nudge perturbs x by far less than bf16
            # resolution.
            dep = jnp.float32(0)
            for leaf in jax.tree.leaves(out):
                dep = jnp.maximum(
                    dep, jnp.max(jnp.abs(leaf).astype(jnp.float32)))
            return (x + (dep * jnp.float32(1e-30)).astype(x.dtype),
                    dep), None
        (xf, last), _ = jax.lax.scan(body, (x0, jnp.zeros((), jnp.float32)),
                                     None, length=inner)
        return last

    fetch(loop(first, *rest))  # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        fetch(loop(first, *rest))
        ts.append((time.time() - t0) / inner)
    ts.sort()
    return ts[len(ts) // 2]
