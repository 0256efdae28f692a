"""exp33b: attention Q=1 vs Q=4 row-0 comparison (cache passed as arg)."""
import numpy as np, jax, jax.numpy as jnp
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from qspec_tpu.config import ModelConfig
import qspec_tpu.ops.kv_cache as kvc
from qspec_tpu.ops.attention import paged_attention

cfg = ModelConfig.llama3_8b(quant="w4")
B, PPS, S = 8, 8, 128
kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                         num_pages=1 + B * PPS, page_size=S)
key = jax.random.PRNGKey(7)
cache = kvc.allocate(kcfg)
cache = cache._replace(kv_pages=(jax.random.normal(
    key, cache.kv_pages.shape, jnp.float32) * 0.3).astype(jnp.bfloat16))
tables = jnp.asarray(np.arange(1, 1 + B * PPS).reshape(B, PPS), jnp.int32)
pos = jnp.full((B,), 700, jnp.int32)
q1 = jax.random.normal(jax.random.PRNGKey(5), (B, 1, cfg.num_heads, cfg.head_dim), jnp.bfloat16)
q4 = jnp.concatenate([q1, jax.random.normal(jax.random.PRNGKey(6), (B, 3, cfg.num_heads, cfg.head_dim), jnp.bfloat16)], axis=1)
scale = cfg.head_dim ** -0.5
p1 = pos[:, None]
p4 = pos[:, None] + jnp.arange(4)[None, :]

@jax.jit
def f1(q, cache):
    return paged_attention(q, cache, 0, tables, pos + 1, scale, q_positions=p1)

@jax.jit
def f4(q, cache):
    return paged_attention(q, cache, 0, tables, pos + 4, scale, q_positions=p4)

at1 = jax.device_get(f1(q1, cache))
at4 = jax.device_get(f4(q4, cache))[:, :1]
d = np.abs(at1.astype(np.float32) - at4.astype(np.float32))
print(f"attention Q1 vs Q4 row0: max|d|={d.max():.3e} bit-equal={np.array_equal(at1, at4)}", flush=True)

# also: ctx_len differences only (same Q=1, ctx 701 vs 704 with same kv):
at1b = jax.device_get(jax.jit(lambda q, c: paged_attention(
    q, c, 0, tables, pos + 4, scale, q_positions=p1))(q1, cache))
d2 = np.abs(at1.astype(np.float32) - at1b.astype(np.float32))
print(f"attention Q1 ctx+1 vs ctx+4 (same causal mask): max|d|={d2.max():.3e}", flush=True)
