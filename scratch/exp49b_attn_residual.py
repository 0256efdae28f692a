"""Prefill residual breakdown: attention kernel, rmsnorm, hadamard, KV
scatter at the [16, 1024] 8B prefill shape (chained differential timing).
Companion to exp49's GEMM rows (bigm stack ~1.38 s of the 2.48 s step)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_timing import timed_chain
from qspec_tpu.config import ModelConfig
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.attention import paged_attention

B, Q, S = 16, 1024, 128
cfg = ModelConfig.llama3_8b(quant="w4")
L = cfg.num_layers
rng = np.random.default_rng(1)

nps = (Q + S - 1) // S + 1
P = B * nps + 1
cache = kvc.allocate(kvc.KVCacheConfig(L, cfg.num_kv_heads, cfg.head_dim,
                                       P, S))
tables = jnp.asarray((1 + np.arange(B * nps).reshape(B, nps)).astype(np.int32))
pos = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None], (B, Q))
ctx = jnp.full((B,), Q, jnp.int32)
q0 = jnp.asarray(rng.standard_normal((B, Q, cfg.num_heads, cfg.head_dim))
                 .astype(np.float32), jnp.bfloat16)
scale = cfg.head_dim ** -0.5


import time


def _sync(x):
    a = jax.tree.leaves(x)[0]
    jax.device_get(a[(0,) * a.ndim])


def timed_diff(make, args, N=8, reps=3):
    """Differential chained timing with the big operands passed as
    ARGUMENTS (closing the multi-GB cache over jit uploads it to the
    remote compiler as a constant — the exp46 lesson, verify skill)."""
    fN, f2N = make(N), make(2 * N)
    _sync(fN(*args))
    _sync(f2N(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fN(*args))
        t1 = time.perf_counter()
        _sync(f2N(*args))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / N)
    return float(np.median(ts))


def attn_make(nit):
    @jax.jit
    def run(q, cache):
        def body(i, qc):
            o = paged_attention(qc, cache, 0, tables, ctx, scale,
                                q_positions=pos)
            return qc + o.astype(qc.dtype) * jnp.bfloat16(1e-30)
        return jax.lax.fori_loop(0, nit, body, q)
    return run


t_at = timed_diff(attn_make, (q0, cache), N=8, reps=3)
print(f"attention prefill [B16 Q1024] {t_at*1e3:7.2f} ms/layer; "
      f"x{L} = {t_at*L:.3f} s", flush=True)

# rmsnorm (per layer x2) + hadamard (down-proj input rotation)
from qspec_tpu.ops.rmsnorm_quant import rmsnorm_ref
from qspec_tpu.ops.hadamard import hadamard_transform

x0 = jnp.asarray(rng.standard_normal((B * Q, cfg.hidden_size))
                 .astype(np.float32), jnp.bfloat16)
g = jnp.ones((cfg.hidden_size,), jnp.bfloat16)


def norm_make(nit):
    @jax.jit
    def run(x):
        def body(i, xc):
            return rmsnorm_ref(xc, g, eps=1e-5).astype(xc.dtype)
        return jax.lax.fori_loop(0, nit, body, x)
    return run


t_n = timed_chain(norm_make, x0, N=16, reps=3)
print(f"rmsnorm [16384x4096] {t_n*1e3:7.2f} ms; x{2*L} = {t_n*2*L:.3f} s",
      flush=True)

xi = jnp.asarray(rng.standard_normal((B * Q, cfg.intermediate_size))
                 .astype(np.float32), jnp.bfloat16)


def had_make(nit):
    @jax.jit
    def run(x):
        def body(i, xc):
            return hadamard_transform(xc).astype(xc.dtype)
        return jax.lax.fori_loop(0, nit, body, x)
    return run


t_h = timed_chain(had_make, xi, N=8, reps=3)
print(f"hadamard [16384x14336] {t_h*1e3:7.2f} ms; x{L} = {t_h*L:.3f} s",
      flush=True)

# KV scatter: one layer's [B*Q] slot write
from qspec_tpu.ops.kv_cache import update_layer

k0 = jnp.asarray(rng.standard_normal((B * Q, cfg.num_kv_heads, cfg.head_dim))
                 .astype(np.float32), jnp.bfloat16)
slots = (tables[:, :nps - 1].repeat(S, axis=1)[:, :Q] * S
         + jnp.arange(Q, dtype=jnp.int32)[None] % S).reshape(-1)


def kv_make(nit):
    @jax.jit
    def run(c, k):
        def body(i, c):
            return update_layer(c, 0, k, k, slots)
        return jax.lax.fori_loop(0, nit, body, c).kv_pages[0, 0, 0, 0]
    return run


try:
    t_kv = timed_diff(kv_make, (cache, k0), N=8, reps=3)
    print(f"kv write [B16 Q1024] {t_kv*1e3:7.2f} ms; x{L} = {t_kv*L:.3f} s",
          flush=True)
except Exception as e:
    print(f"kv write timing skipped: {type(e).__name__}: {e}", flush=True)
