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
            leaf = jax.tree.leaves(out)[0]
            # serialize iterations with a REAL data dependency. `leaf*0`
            # is NOT safe here: XLA's algebraic simplifier folds mul-by-
            # zero, deleting the carry chain — the loop body then has no
            # cross-trip dependence and measurements came out ABOVE the
            # MXU peak (observed 380-460 "TF/s" at inner=100). A tiny
            # scaled nudge is unfoldable and perturbs the input by ~1e-30,
            # far below bf16 resolution for the op under test.
            dep = jnp.ravel(leaf)[0].astype(jnp.float32) * jnp.float32(1e-30)
            return (x + dep.astype(x.dtype),
                    jnp.ravel(leaf)[0].astype(jnp.float32)), None
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
