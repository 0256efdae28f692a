import time, numpy as np, jax, jax.numpy as jnp
from qspec_tpu.config import *
from qspec_tpu.engine.model_runner import decode_step
from qspec_tpu.models.llama import init_params_device
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.sampling import SamplingTensors

cfg = ModelConfig(hidden_size=2048, intermediate_size=8192, num_layers=16,
                  num_heads=16, num_kv_heads=8, head_dim=128,
                  vocab_size=128256, quant="w4")
params = init_params_device(cfg, 0); jax.block_until_ready(params)
kvc_cfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                            num_pages=16*16+8, page_size=16)
cache = kvc.allocate(kvc_cfg)
B = 4
last = jnp.ones((B,), jnp.int32); pos = jnp.full((B,), 100, jnp.int32)
tables = jnp.asarray(np.arange(1, 1+B*16).reshape(B,16), jnp.int32)
st = SamplingTensors.greedy(B)
key = jax.random.PRNGKey(0)
toks, cache = decode_step(params, cache, last, pos, tables, st, key, cfg=cfg, scheme="w4a16")
print("first tokens:", jax.device_get(toks), flush=True)
for trial in range(3):
    t0=time.time(); N=20
    for _ in range(N):
        toks, cache = decode_step(params, cache, last, pos, tables, st, key, cfg=cfg, scheme="w4a16")
        h = jax.device_get(toks)  # force full sync every step
    dt=(time.time()-t0)/N*1000
    print(f"decode w/ device_get: {dt:.1f} ms/step, toks={h}", flush=True)
# w4a4 draft single step cost
from qspec_tpu.engine.model_runner import draft_steps
d_toks, d_probs, cache2 = draft_steps(params, cache, last, pos, tables, st, key, cfg=cfg, scheme="w4a4", k=3)
jax.block_until_ready(d_toks)
t0=time.time(); N=10
for _ in range(N):
    d_toks, d_probs, cache2 = draft_steps(params, cache2, last, pos, tables, st, key, cfg=cfg, scheme="w4a4", k=3)
    jax.device_get(d_toks)
print(f"draft k=3: {(time.time()-t0)/N*1000:.1f} ms/round", flush=True)
from qspec_tpu.engine.model_runner import verify_step
res, cache = verify_step(params, cache, last, d_toks, d_probs, pos, tables, st, key, cfg=cfg, scheme="w4a16")
jax.block_until_ready(res.tokens)
t0=time.time()
for _ in range(N):
    res, cache = verify_step(params, cache, last, d_toks, d_probs, pos, tables, st, key, cfg=cfg, scheme="w4a16")
    jax.device_get(res.tokens)
print(f"verify k+1: {(time.time()-t0)/N*1000:.1f} ms/step", flush=True)
