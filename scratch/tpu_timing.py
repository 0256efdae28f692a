"""Reliable TPU timing on axon: chained ops + differential-N timing.

block_until_ready returns early on this platform; device_get carries ~30ms
RTT. We chain N dependent iterations inside jit-compiled loops, sync via
device_get of a small slice, and report t = (T(2N) - T(N)) / N which cancels
both RTT and dispatch constants.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np


def timed_chain(make_loop, x0, N=16, reps=3):
    """make_loop(n) -> jitted fn running n chained iterations on x0."""
    fN, f2N = make_loop(N), make_loop(2 * N)
    # warm both
    jax.device_get(jnp.sum(fN(x0)))
    jax.device_get(jnp.sum(f2N(x0)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(fN(x0)))
        t1 = time.perf_counter()
        jax.device_get(jnp.sum(f2N(x0)))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / N)
    return float(np.median(ts))
