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

cfg = ModelConfig.llama3_8b(quant="w4")
params = init_params_device(cfg, 0); jax.block_until_ready(params)
print("params ready", flush=True)
B = 8
kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                         num_pages=1 + B * 48, page_size=16)
tables = jnp.asarray(np.arange(1, 1 + B * 48).reshape(B, 48), jnp.int32)
last = jnp.ones((B,), jnp.int32); pos = jnp.full((B,), 700, jnp.int32)
st = SamplingTensors.greedy(B)
key = jax.random.PRNGKey(0)

orig_update = kvc.update_layer
orig_attn = llama_mod.paged_attention
orig_hh = llama_mod._head_hadamard
orig_mh = llama_mod._mlp_hadamard

def measure(tag, params_use=None):
    p = params if params_use is None else params_use
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
        return lambda c: run(c, p)
    cache = kvc.allocate(kcfg)
    t = timed_chain(loop, cache, N=8)
    print(f"{tag}: {t*1e3:.3f} ms/step", flush=True)

measure("full decode")

llama_mod._head_hadamard = lambda attn, h: attn
llama_mod._mlp_hadamard = lambda x, hK, hP: x
measure("no hadamards")
llama_mod._head_hadamard = orig_hh
llama_mod._mlp_hadamard = orig_mh

kvc.update_layer = lambda cache, layer, k, v, slots: cache
measure("no kv-update")

llama_mod.paged_attention = lambda q, cache, layer, bt, cl, s, q_positions=None: q
measure("no kv-update + no attention")

kvc.update_layer = orig_update
llama_mod.paged_attention = orig_attn

params_small = dict(params)
params_small["lm_head"] = params["lm_head"][:, :8192]
measure("small lm_head (8k vocab)", params_small)
