import time, numpy as np, jax, jax.numpy as jnp
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from qspec_tpu.config import *
from qspec_tpu.engine.model_runner import prefill_step
from qspec_tpu.models.llama import init_params_device
from qspec_tpu.ops import kv_cache as kvc

def bench_prefill(cfg, scheme, Q=512):
    params = init_params_device(cfg, 0); jax.block_until_ready(params)
    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                             num_pages=300, page_size=16)
    cache = kvc.allocate(kcfg)
    toks = jnp.ones((1, Q), jnp.int32)
    positions = jnp.arange(Q, dtype=jnp.int32)[None]
    tables = jnp.pad(jnp.asarray(np.arange(1, 18)[None], jnp.int32), ((0,0),(0,17)))
    ctx = jnp.asarray([200], jnp.int32)
    t0=time.time()
    logits, cache = prefill_step(params, cache, toks, positions, tables, ctx, cfg=cfg, scheme=scheme)
    jax.device_get(logits); print(f"{scheme} compile+run {time.time()-t0:.1f}s", flush=True)
    t0=time.time(); N=3
    for _ in range(N):
        logits, cache = prefill_step(params, cache, toks, positions, tables, ctx, cfg=cfg, scheme=scheme)
    jax.device_get(logits)
    print(f"{scheme} prefill steady: {(time.time()-t0)/N*1000:.0f} ms/call", flush=True)

base = dict(hidden_size=2048, intermediate_size=8192, num_layers=16,
            num_heads=16, num_kv_heads=8, head_dim=128, vocab_size=128256)
bench_prefill(ModelConfig(**base, quant="none"), "bf16")
bench_prefill(ModelConfig(**base, quant="w4"), "w4a16")
