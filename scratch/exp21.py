import time, numpy as np, jax, jax.numpy as jnp, functools
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.config import ModelConfig
import qspec_tpu.models.llama as llama_mod
import qspec_tpu.ops.kv_cache as kvc
from qspec_tpu.models.llama import init_params_device
from qspec_tpu.ops.sampling import SamplingTensors
import qspec_tpu.engine.model_runner as mr

cfg = ModelConfig(hidden_size=2048, intermediate_size=8192, num_layers=16,
                  num_heads=16, num_kv_heads=8, head_dim=128,
                  vocab_size=128256, quant="w4")
params = init_params_device(cfg, 0); jax.block_until_ready(params)
print("params ready", flush=True)
kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                         num_pages=264, page_size=16)
B = 4
tables = jnp.asarray(np.arange(1, 1+B*16).reshape(B,16), jnp.int32)
last = jnp.ones((B,), jnp.int32); pos = jnp.full((B,), 100, jnp.int32)
st = SamplingTensors.greedy(B)
key = jax.random.PRNGKey(0)

orig_update = kvc.update_layer
orig_attn = llama_mod.paged_attention

def measure(tag):
    def loop(n):
        @jax.jit
        def run(cache, params):
            def body(i, carry):
                cache, tok = carry
                t, cache = mr.decode_step.__wrapped__(params, cache, tok, pos,
                                                      tables, st, key,
                                                      cfg=cfg, scheme="w4a16")
                return (cache, t)
            cache, t = jax.lax.fori_loop(0, n, body, (cache, last))
            return t
        return lambda c: run(c, params)
    cache = kvc.allocate(kcfg)
    t = timed_chain(loop, cache, N=8)
    print(f"{tag}: {t*1e3:.3f} ms/step", flush=True)

measure("full decode")

kvc.update_layer = lambda cache, layer, k, v, slots: cache
measure("no kv-update")

llama_mod.paged_attention = lambda q, cache, layer, bt, cl, s, q_positions=None: q
measure("no kv-update + no attention")

kvc.update_layer = orig_update
llama_mod.paged_attention = orig_attn
# lm_head ablation: slice vocab to 8192
params_small = dict(params)
params_small["lm_head"] = params["lm_head"][:, :8192]
def loop2(n):
    @jax.jit
    def run(cache, params):
        def body(i, carry):
            cache, tok = carry
            t, cache = mr.decode_step.__wrapped__(params, cache, tok, pos,
                                                  tables, st4, key,
                                                  cfg=cfg, scheme="w4a16")
            return (cache, t)
        cache, t = jax.lax.fori_loop(0, n, body, (cache, last))
        return t
    return lambda c: run(c, params_small)
st4 = SamplingTensors.greedy(B)
cache = kvc.allocate(kcfg)
t = timed_chain(loop2, cache, N=8)
print(f"small lm_head (8k vocab): {t*1e3:.3f} ms/step", flush=True)
