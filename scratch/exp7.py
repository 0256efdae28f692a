import time, numpy as np, jax, jax.numpy as jnp
from qspec_tpu.config import *
from qspec_tpu.engine.model_runner import decode_step, draft_steps, verify_step
from qspec_tpu.models.llama import init_params_device
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.sampling import SamplingTensors

cfg = ModelConfig(hidden_size=2048, intermediate_size=8192, num_layers=16,
                  num_heads=16, num_kv_heads=8, head_dim=128,
                  vocab_size=128256, quant="w4")
t0=time.time(); params = init_params_device(cfg, 0); jax.block_until_ready(params)
print("params", time.time()-t0, flush=True)
kvc_cfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                            num_pages=16*16+8, page_size=16)
cache = kvc.allocate(kvc_cfg)
B = 4
last = jnp.ones((B,), jnp.int32); pos = jnp.full((B,), 100, jnp.int32)
tables = jnp.asarray(np.arange(1, 1+B*16).reshape(B,16), jnp.int32)
st = SamplingTensors.greedy(B)
key = jax.random.PRNGKey(0)

t0=time.time()
toks, cache = decode_step(params, cache, last, pos, tables, st, key, cfg=cfg, scheme="w4a16")
jax.block_until_ready(toks); print("decode compile+run", time.time()-t0, flush=True)
for trial in range(3):
    t0=time.time(); N=10
    for _ in range(N):
        toks, cache = decode_step(params, cache, last, pos, tables, st, key, cfg=cfg, scheme="w4a16")
    jax.block_until_ready(toks)
    print(f"decode steady: {(time.time()-t0)/N*1000:.1f} ms/step", flush=True)
wbytes = 16*(2048*3072+2048*2048+2048*16384+8192*2048)/2 + 2*128256*2048*2
print(f"weight bytes ~{wbytes/1e9:.2f} GB -> ideal {wbytes/819e9*1000:.2f} ms/step", flush=True)
