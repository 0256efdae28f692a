import time, numpy as np, jax, jax.numpy as jnp, functools
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.config import ModelConfig
from qspec_tpu.models.llama import init_params_device, decoder_layer, AttentionBatch
from qspec_tpu.ops import kv_cache as kvc

cfg = ModelConfig(hidden_size=2048, intermediate_size=8192, num_layers=16,
                  num_heads=16, num_kv_heads=8, head_dim=128,
                  vocab_size=128256, quant="w4")
params = init_params_device(cfg, 0); jax.block_until_ready(params)
print("params ready", flush=True)
kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                         num_pages=264, page_size=16)
cache = kvc.allocate(kcfg)
B = 4
tables = jnp.asarray(np.arange(1, 1+B*16).reshape(B,16), jnp.int32)
batch = AttentionBatch(positions=jnp.full((B,1), 100, jnp.int32),
                       slot_mapping=jnp.full((B,1), 1700, jnp.int32),
                       block_tables=tables,
                       ctx_lens=jnp.full((B,), 101, jnp.int32))
x0 = jax.random.normal(jax.random.PRNGKey(0), (B, 2048), jnp.bfloat16)

# trunk only: scan of 16 decoder layers (no embed/lm_head/sampling)
def trunk_loop(n):
    @jax.jit
    def run(x, params, cache):
        def outer(i, x):
            def body(xc, layer_and_cache):
                layer, kp, vp = layer_and_cache
                y, _ = decoder_layer(xc, layer, (kp, vp), cfg, batch,
                                     params["rope_cache"], params["hadamards"],
                                     "w4a16", None)
                return y, None
            y, _ = jax.lax.scan(body, x, (params["layers"], cache.k_pages, cache.v_pages))
            return y
        return jax.lax.fori_loop(0, n, outer, x)
    return lambda x: run(x, params, cache)
t = timed_chain(trunk_loop, x0, N=8)
print(f"16-layer trunk w4a16 (B=4 decode): {t*1e3:.3f} ms", flush=True)

def trunk_loop_a4(n):
    @jax.jit
    def run(x, params, cache):
        def outer(i, x):
            def body(xc, layer_and_cache):
                layer, kp, vp = layer_and_cache
                y, _ = decoder_layer(xc, layer, (kp, vp), cfg, batch,
                                     params["rope_cache"], params["hadamards"],
                                     "w4a4", None)
                return y, None
            y, _ = jax.lax.scan(body, x, (params["layers"], cache.k_pages, cache.v_pages))
            return y
        return jax.lax.fori_loop(0, n, outer, x)
    return lambda x: run(x, params, cache)
t4 = timed_chain(trunk_loop_a4, x0, N=8)
print(f"16-layer trunk w4a4  (B=4 decode): {t4*1e3:.3f} ms", flush=True)
