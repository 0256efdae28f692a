"""exp32: region ablation of the 8B decode step after the stacked-weight fix.

Baseline 7.58 ms (int8 KV). Regions: hadamards, kv-update, attention,
lm_head (int8 vs int4 vs tiny), sampling, norms.
"""
import numpy as np, jax, jax.numpy as jnp
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.config import ModelConfig
import qspec_tpu.models.llama as llama_mod
import qspec_tpu.ops.kv_cache as kvc
import qspec_tpu.ops.sampling as smp
from qspec_tpu.models.llama import init_params_device
from qspec_tpu.ops.sampling import SamplingTensors
import qspec_tpu.engine.model_runner as mr

cfg = ModelConfig.llama3_8b(quant="w4")  # lm_head -> int8
params = init_params_device(cfg, 0)
jax.device_get(jax.tree.leaves(params)[0][:1])
print("params ready", flush=True)
B, PPS = 8, 8
kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                         num_pages=1 + B * PPS, page_size=128, dtype="int8")
tables = jnp.asarray(np.arange(1, 1 + B * PPS).reshape(B, PPS), jnp.int32)
last = jnp.ones((B,), jnp.int32)
pos = jnp.full((B,), 700, jnp.int32)
st = SamplingTensors.greedy(B)
key = jax.random.PRNGKey(0)

orig_update = kvc.update_layer
orig_attn = llama_mod.paged_attention
orig_hh = llama_mod._head_hadamard
orig_mh = llama_mod._mlp_hadamard
orig_sample = smp.sample


def measure(tag, params_use=None, cfg_use=None):
    p = params if params_use is None else params_use
    c = cfg if cfg_use is None else cfg_use
    def loop(n):
        @jax.jit
        def run(cache, params):
            def body(i, carry):
                cache, tok = carry
                t, lp, cache = mr.decode_step.__wrapped__(
                    params, cache, tok, pos, tables, st, key,
                    cfg=c, scheme="w4a16")
                return (cache, t)
            cache, t = jax.lax.fori_loop(0, n, body, (cache, last))
            return t
        return lambda cch: run(cch, p)
    cache = kvc.allocate(kcfg)
    t = timed_chain(loop, cache, N=12)
    print(f"{tag}: {t*1e3:.3f} ms/step", flush=True)


measure("full decode (int8 KV, int8 head)")

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

# sampling ablation: argmax over 8 vocab entries + zero logprob
orig_swl = mr.sample_with_logprob
mr.sample_with_logprob = lambda logits, st, key: (
    jnp.argmax(logits[:, :8], axis=-1).astype(jnp.int32),
    jnp.zeros((logits.shape[0],), jnp.float32))
measure("cheap sampler (argmax over 8)")
mr.sample_with_logprob = orig_swl

# int4 lm_head
cfg4 = ModelConfig.llama3_8b(quant="w4", lm_head_quant="int4")
p4 = dict(params)
H = cfg.hidden_size
k2 = jax.random.PRNGKey(9)
w = jax.random.normal(k2, (H, cfg.vocab_size), jnp.float32) * 0.02
absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
scale = jnp.maximum(absmax, 1e-8) / 7.0
q = jnp.clip(jnp.round(w / scale), -8, 7).astype(jnp.int8)
from qspec_tpu.ops.packing import pack_int4
p4["lm_head"] = {"qw": pack_int4(q), "qs": scale[0]}
measure("int4 lm_head", p4, cfg4)

# tiny lm_head: isolates everything-but-head
p_small = dict(params)
p_small["lm_head"] = {"qw8": params["lm_head"]["qw8"][:, :8192],
                      "qs": params["lm_head"]["qs"][:8192]}
measure("tiny lm_head (8k vocab)", p_small)
