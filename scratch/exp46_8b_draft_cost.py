"""Where does the 8b-draft round spend its time?

Forced-acceptance bench measured 1.11x vs AR at full acceptance where the
traffic model predicts >3x. Time the production executables separately at
the bench shapes: AR multi_decode (32 steps), the draft scan alone (k=8),
the verify pass alone (Q=9), and the fused spec_rounds (R=8).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig
from qspec_tpu.engine import model_runner as mr
from qspec_tpu.models.llama import init_params_device
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.sampling import SamplingTensors

B, K, R, CTX = 16, 8, 8, 1024
S = 128
cfg = ModelConfig.llama3_8b(quant="w4")
import dataclasses as dc
dcfg = ModelConfig(vocab_size=cfg.vocab_size, hidden_size=512,
                   intermediate_size=1536, num_layers=4, num_heads=4,
                   num_kv_heads=4, head_dim=128, quant="none",
                   lm_head_quant="int8")

t0 = time.time()
params = init_params_device(cfg, seed=0)
dparams = init_params_device(dcfg, seed=1)
jax.block_until_ready((params, dparams))
print(f"params built {time.time()-t0:.1f}s", flush=True)

n_pages_seq = (CTX + 64 * (K + 1) + S - 1) // S + 1
P = B * n_pages_seq + 1
cache = kvc.allocate(kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads,
                                       cfg.head_dim, num_pages=P, page_size=S))
dcache = kvc.allocate(kvc.KVCacheConfig(dcfg.num_layers, dcfg.num_kv_heads,
                                        dcfg.head_dim, num_pages=P,
                                        page_size=S))
tables = jnp.asarray(
    (1 + np.arange(B * n_pages_seq).reshape(B, n_pages_seq)).astype(np.int32))
last = jnp.ones((B,), jnp.int32)
prev = jnp.ones((B,), jnp.int32)
pos = jnp.full((B,), CTX, jnp.int32)
budget = jnp.full((B,), 10_000, jnp.int32)
st = SamplingTensors.greedy(B)
key = jax.random.PRNGKey(0)

import functools


def timeit(name, fn, *args, iters=6, **kw):
    out = fn(*args, **kw)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


# Donating executables with cache REBINDING: each call consumes its cache
# and returns the next one, so exactly one copy is live (the production
# call pattern; the non-donating variant held 3 copies of the 3.8 GB cache
# and OOM'd).
import functools


def timeit_state(name, fn, state, iters=6):
    state = fn(state)
    jax.device_get(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.device_get(jax.tree.leaves(state)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt, state


ar = functools.partial(mr.multi_decode_step, cfg=cfg, scheme="w4a16",
                       num_steps=32)
dt_ar, cache = timeit_state(
    "multi_decode x32",
    lambda c: ar(params, c, last, pos, tables, budget, st, key, None)[-1],
    cache)
dt_ar /= 32
print(f"  AR per step: {dt_ar*1e3:.2f} ms -> {B/dt_ar:.0f} tok/s", flush=True)

dr = functools.partial(mr.draft_steps, cfg=dcfg, scheme="bf16", k=K)
dt_d, dcache = timeit_state(
    "draft_steps k=8",
    lambda c: dr(dparams, c, last, pos, tables, st, key)[-1], dcache)
print(f"  draft per fwd: {dt_d/K*1e3:.2f} ms", flush=True)

d_toks = jnp.ones((B, K), jnp.int32)
d_probs = jnp.full((B, K, cfg.vocab_size), 1.0 / cfg.vocab_size, jnp.float32)
vf = functools.partial(mr.verify_step, cfg=cfg, scheme="w4a16")
dt_v, cache = timeit_state(
    "verify Q=9",
    lambda c: vf(params, c, last, d_toks, d_probs, pos, tables, st, key)[-1],
    cache)

sr = functools.partial(mr.spec_rounds_step, cfg=cfg, draft_cfg=dcfg,
                       draft_scheme="bf16", verify_scheme="w4a16", k=K,
                       num_rounds=R, draft_axis_name=None, force_accept=K)
dt_s, (dcache, cache) = timeit_state(
    "spec_rounds R=8",
    lambda cs: sr(params, cs[0], cs[1], last, prev, pos, tables, tables,
                  budget, jnp.asarray(True), st, key, None, dparams)[-2:],
    (dcache, cache), iters=3)
per_round = dt_s / R
print(f"  per round: {per_round*1e3:.2f} ms; emitted/round at full acc = "
      f"{K+1} -> {B*(K+1)/per_round:.0f} tok/s "
      f"(vs AR {B/dt_ar:.0f})", flush=True)
print(f"  round decomposition: draft {dt_d*1e3:.1f} + verify {dt_v*1e3:.1f} "
      f"= {(dt_d+dt_v)*1e3:.1f} ms vs measured {per_round*1e3:.1f}", flush=True)
