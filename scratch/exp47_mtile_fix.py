"""A/B the _choose_bm fix: verify(Q=9) and the fused spec round vs one AR
step at Llama-3-8B dims, all within one process/window (ratios only)."""
import functools
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

B, K, R, CTX, S = 16, 8, 8, 1024, 128
cfg = ModelConfig.llama3_8b(quant="w4")
dcfg = ModelConfig(vocab_size=cfg.vocab_size, hidden_size=512,
                   intermediate_size=1536, num_layers=4, num_heads=4,
                   num_kv_heads=4, head_dim=128, quant="none",
                   lm_head_quant="int8")
t0 = time.time()
params = init_params_device(cfg, seed=0)
dparams = init_params_device(dcfg, seed=1)
jax.block_until_ready((params, dparams))
print(f"params {time.time()-t0:.0f}s", flush=True)

nps = (CTX + 64 * (K + 1) + S - 1) // S + 1
P = B * nps + 1
cache = kvc.allocate(kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads,
                                       cfg.head_dim, P, S))
dcache = kvc.allocate(kvc.KVCacheConfig(dcfg.num_layers, dcfg.num_kv_heads,
                                        dcfg.head_dim, P, S))
tables = jnp.asarray((1 + np.arange(B * nps).reshape(B, nps)).astype(np.int32))
last = jnp.ones((B,), jnp.int32)
pos = jnp.full((B,), CTX, jnp.int32)
budget = jnp.full((B,), 100000, jnp.int32)
st = SamplingTensors.greedy(B)
key = jax.random.PRNGKey(0)


def _sync(state):
    # device_get of a SCALAR element: blocks until the producing
    # computation is done without pulling the multi-GB cache through the
    # tunnel (block_until_ready returns early on axon; a full device_get
    # of the 3.8 GB cache took ~2 minutes and silently dominated every
    # earlier timing in exp46)
    a = jax.tree.leaves(state)[0]
    jax.device_get(a[(0,) * a.ndim])


def timeit_state(name, fn, state, iters=8, per=1):
    state = fn(state)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    _sync(state)
    dt = (time.perf_counter() - t0) / iters / per
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt, state


ar = functools.partial(mr.multi_decode_step, cfg=cfg, scheme="w4a16",
                       num_steps=32)
dt_ar, cache = timeit_state(
    "AR step (of x32 fused)",
    lambda c: ar(params, c, last, pos, tables, budget, st, key, None)[-1],
    cache, per=32)

d_toks = jnp.ones((B, K), jnp.int32)
d_probs = jnp.full((B, K, cfg.vocab_size), 1.0 / cfg.vocab_size, jnp.float32)
vf = functools.partial(mr.verify_step, cfg=cfg, scheme="w4a16")
dt_v, cache = timeit_state(
    "verify Q=9",
    lambda c: vf(params, c, last, d_toks, d_probs, pos, tables, st, key)[-1],
    cache)
print(f"  verify / AR-step = {dt_v/dt_ar:.2f}x  (pre-fix ~30x)", flush=True)

sr = functools.partial(mr.spec_rounds_step, cfg=cfg, draft_cfg=dcfg,
                       draft_scheme="bf16", verify_scheme="w4a16", k=K,
                       num_rounds=R, draft_axis_name=None, force_accept=K)
dt_r, _ = timeit_state(
    "spec round (of R=8 fused)",
    lambda cs: sr(params, cs[0], cs[1], last, last, pos, tables, tables,
                  budget, jnp.asarray(True), st, key, None, dparams)[-2:],
    (dcache, cache), iters=4, per=R)
print(f"  round / AR-step = {dt_r/dt_ar:.2f}x; device speedup at full acc "
      f"= {(K+1)*dt_ar/dt_r:.2f}x, at acc 0.926 ~ "
      f"{5.97*dt_ar/dt_r:.2f}x", flush=True)
