import time, numpy as np, jax, jax.numpy as jnp
from qspec_tpu.config import *
from qspec_tpu.engine.model_runner import decode_step, draft_steps, verify_step
from qspec_tpu.models.llama import init_params_device
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.sampling import SamplingTensors

cfg = ModelConfig(hidden_size=2048, intermediate_size=8192, num_layers=16,
                  num_heads=16, num_kv_heads=8, head_dim=128,
                  vocab_size=128256, quant="w4")
params = init_params_device(cfg, 0); jax.block_until_ready(params)
print("params ready", flush=True)
kvc_cfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                            num_pages=264, page_size=16)
B = 4
last = jnp.ones((B,), jnp.int32); pos = jnp.full((B,), 100, jnp.int32)
tables = jnp.asarray(np.arange(1, 1+B*16).reshape(B,16), jnp.int32)
st = SamplingTensors.greedy(B)
key = jax.random.PRNGKey(0)

# RTT measure
tiny = jax.jit(lambda a: a + 1)
x = jnp.zeros((4,), jnp.int32)
jax.device_get(tiny(x))
t0=time.time(); N=20
for _ in range(N): h = jax.device_get(tiny(x))
rtt = (time.time()-t0)/N
print(f"rtt (tiny jit + device_get): {rtt*1000:.1f} ms", flush=True)

def chain(fn, cache0, n, label):
    # warm
    out = fn(cache0)
    cache1 = out[-1]
    jax.device_get(out[0].tokens if hasattr(out[0], "tokens") else out[0])
    t0=time.time()
    for _ in range(n):
        out = fn(cache1)
        cache1 = out[-1]
    jax.device_get(out[0].tokens if hasattr(out[0], "tokens") else out[0])
    dt = (time.time()-t0 - rtt)/n
    print(f"{label}: {dt*1000:.2f} ms/call (n={n}, chained, single sync)", flush=True)
    return cache1

cache = kvc.allocate(kvc_cfg)
cache = chain(lambda c: decode_step(params, c, last, pos, tables, st, key, cfg=cfg, scheme="w4a16"), cache, 20, "decode w4a16 B=4")
cache = chain(lambda c: draft_steps(params, c, last, pos, tables, st, key, cfg=cfg, scheme="w4a4", k=3), cache, 10, "draft k=3 w4a4 B=4")

d_toks = jnp.ones((B,3), jnp.int32)
d_probs = jnp.full((B,3,cfg.vocab_size), 1.0/cfg.vocab_size, jnp.float32)
cache = chain(lambda c: verify_step(params, c, last, d_toks, d_probs, pos, tables, st, key, cfg=cfg, scheme="w4a16"), cache, 10, "verify k+1=4 w4a16 B=4")
