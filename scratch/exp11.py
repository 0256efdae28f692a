import time, numpy as np, jax, jax.numpy as jnp
from qspec_tpu.config import *
from qspec_tpu.engine.model_runner import prefill_step
from qspec_tpu.models.llama import init_params_device
from qspec_tpu.ops import kv_cache as kvc

cfg = ModelConfig(hidden_size=2048, intermediate_size=8192, num_layers=16,
                  num_heads=16, num_kv_heads=8, head_dim=128,
                  vocab_size=128256, quant="w4")
params = init_params_device(cfg, 0); jax.block_until_ready(params)
print("params ready", flush=True)
kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                         num_pages=300, page_size=16)
cache = kvc.allocate(kcfg)
toks = jnp.ones((1, 512), jnp.int32)
positions = jnp.arange(512, dtype=jnp.int32)[None]
tables = jnp.asarray(np.arange(1, 18)[None], jnp.int32)
tables = jnp.pad(tables, ((0,0),(0, 17)))
ctx = jnp.asarray([200], jnp.int32)

t0=time.time()
logits, cache = prefill_step(params, cache, toks, positions, tables, ctx, cfg=cfg, scheme="w4a16")
jax.device_get(logits); print("prefill compile+run", time.time()-t0, flush=True)
for trial in range(3):
    t0=time.time(); N=3
    for _ in range(N):
        logits, cache = prefill_step(params, cache, toks, positions, tables, ctx, cfg=cfg, scheme="w4a16")
    jax.device_get(logits)
    print(f"prefill steady: {(time.time()-t0)/N*1000:.0f} ms/call", flush=True)
