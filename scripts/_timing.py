"""Shared dispatch-free device-timing harness for the scripts/ benches.

One canonical implementation because the per-script copies drifted and the
drift is exactly where measurement bugs crept in (round-3 review):

* N iterations of the body inside ONE ``lax.fori_loop`` dispatch — per-call
  tunnel overhead (~1.6 ms) never enters the numbers;
* the body's input is perturbed with an i-dependent, non-foldable value
  (`+ (i % 3) * eps`, or XOR for integer inputs) — ``x + i*0`` constant-
  folds and the loop body becomes hoistable;
* the carry reduces over the WHOLE output pytree — reducing a slice lets
  XLA slice through concats and dead-code-eliminate entire stages (the
  canonical failure: ``packed[:, :4]`` silently dropped PAF scoring);
* sync via ``device_get`` of the scalar — axon's ``block_until_ready``
  can return early for some programs.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _perturb(x, i):
    if x.dtype == jnp.uint8:
        return x ^ (i & 1).astype(jnp.uint8)
    return x + ((i % 3).astype(jnp.float32) * 1e-6).astype(x.dtype)


def _reduce_all(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)


def timed_loop(body, x, n=20, reps=5, unit=1):
    """Best-of-``reps`` seconds for ``n`` in-graph iterations of
    ``body(x_perturbed)``, divided by ``n * unit`` (``unit`` = batch for
    per-frame ms).  Returns milliseconds."""

    @jax.jit
    def f(x):
        def step(i, acc):
            return acc + _reduce_all(body(_perturb(x, i)))
        return jax.lax.fori_loop(0, n, step, jnp.float32(0.0))

    np.asarray(jax.device_get(f(x)))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(f(x)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n / unit * 1e3
