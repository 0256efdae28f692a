import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
from qspec_tpu.config import ModelConfig
from qspec_tpu.engine.model_runner import prefill_step
from qspec_tpu.models.llama import init_params
from qspec_tpu.ops import kv_cache as kvc

cfg = ModelConfig.tiny(quant="w4")
params = init_params(cfg, 0)
kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, num_pages=72, page_size=16)
rng = np.random.default_rng(7)
P = 23
prompt = rng.integers(1, 500, size=P).astype(np.int32)
toks = np.zeros((1, 64), np.int32); toks[0,:P] = prompt
positions = np.arange(64, dtype=np.int32)[None,:]
ctx = jnp.asarray([P], jnp.int32)

for tbl in ([1,2]+[0]*14, [1,2,3]+[0]*13, [5,9,33,2]+[0]*12):
    cache = kvc.allocate(kcfg)
    tables = jnp.asarray([tbl], jnp.int32)
    logits, _ = prefill_step(params, cache, jnp.asarray(toks), jnp.asarray(positions),
                             tables, ctx, cfg=cfg, scheme="w4a16")
    l = np.asarray(logits[0], np.float32)
    print("tbl", tbl[:4], "argmax", l.argmax(), "max", l.max(), "nan", np.isnan(l).any())

print("=== determinism check ===")
for rep in range(2):
    cache = kvc.allocate(kcfg)
    tables = jnp.asarray([[1,2]+[0]*14], jnp.int32)
    logits, _ = prefill_step(params, cache, jnp.asarray(toks), jnp.asarray(positions),
                             tables, ctx, cfg=cfg, scheme="w4a16")
    print("rep", rep, float(np.asarray(logits[0], np.float32).max()))

print("=== ctx mask sanity: write extra garbage into page 3, ctx unchanged ===")
cache = kvc.allocate(kcfg)
cache = cache._replace(k_pages=cache.k_pages.at[:, :, 3].set(7.0),
                       v_pages=cache.v_pages.at[:, :, 3].set(-3.0))
tables = jnp.asarray([[1,2,3]+[0]*13], jnp.int32)
logits, _ = prefill_step(params, cache, jnp.asarray(toks), jnp.asarray(positions),
                         tables, ctx, cfg=cfg, scheme="w4a16")
print("with garbage page3:", float(np.asarray(logits[0], np.float32).max()))
