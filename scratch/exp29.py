"""exp29: full 8B decode-step timing after round-2 kernel work.

Measures on-device ms/step for: w4a16 decode (bf16 KV + int8 KV),
w4a4 draft step, verify (Q=4), and one full spec round, at B=8 ctx~700.
"""
import numpy as np, jax, jax.numpy as jnp
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.config import ModelConfig
import qspec_tpu.ops.kv_cache as kvc
from qspec_tpu.models.llama import init_params_device
from qspec_tpu.ops.sampling import SamplingTensors
import qspec_tpu.engine.model_runner as mr

cfg = ModelConfig.llama3_8b(quant="w4")  # lm_head auto -> int8
params = init_params_device(cfg, 0)
jax.device_get(jax.tree.leaves(params)[0][:1])
print("params ready", flush=True)
B = 8
PPS = 8  # pages per seq (128-token pages, ctx ~700 + lookahead)
st = SamplingTensors.greedy(B)
key = jax.random.PRNGKey(0)
tables = jnp.asarray(np.arange(1, 1 + B * PPS).reshape(B, PPS), jnp.int32)
last = jnp.ones((B,), jnp.int32)
pos = jnp.full((B,), 700, jnp.int32)

for kv_dtype in ("bfloat16", "int8"):
    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                             num_pages=1 + B * PPS, page_size=128,
                             dtype=kv_dtype)

    def loop(n):
        @jax.jit
        def run(cache, params):
            def body(i, carry):
                cache, tok = carry
                t, lp, cache = mr.decode_step.__wrapped__(
                    params, cache, tok, pos, tables, st, key,
                    cfg=cfg, scheme="w4a16")
                return (cache, t)
            cache, t = jax.lax.fori_loop(0, n, body, (cache, last))
            return t
        return lambda c: run(c, params)

    cache = kvc.allocate(kcfg)
    t = timed_chain(loop, cache, N=16)
    print(f"w4a16 decode step ({kv_dtype} KV): {t*1e3:.3f} ms -> "
          f"{B/t:.0f} tok/s device-side", flush=True)

kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                         num_pages=1 + B * PPS, page_size=128)

def draft_loop(n):
    @jax.jit
    def run(cache, params):
        def body(i, carry):
            cache, tok = carry
            t, lp, cache = mr.decode_step.__wrapped__(
                params, cache, tok, pos, tables, st, key,
                cfg=cfg, scheme="w4a4")
            return (cache, t)
        cache, t = jax.lax.fori_loop(0, n, body, (cache, last))
        return t
    return lambda c: run(c, params)

cache = kvc.allocate(kcfg)
t = timed_chain(draft_loop, cache, N=16)
print(f"w4a4 draft step: {t*1e3:.3f} ms", flush=True)

K = 3
d_toks = jnp.ones((B, K), jnp.int32)
d_probs = jnp.full((B, K, cfg.vocab_size), 1.0 / cfg.vocab_size, jnp.float32)

def verify_loop(n):
    @jax.jit
    def run(cache, params, d_probs):
        def body(i, carry):
            cache, tok = carry
            res, cache = mr.verify_step.__wrapped__(
                params, cache, tok, d_toks, d_probs, pos, tables, st, key,
                cfg=cfg, scheme="w4a16")
            return (cache, res.tokens[:, 0])
        cache, t = jax.lax.fori_loop(0, n, body, (cache, last))
        return t
    return lambda c: run(c, params, d_probs)

cache = kvc.allocate(kcfg)
t = timed_chain(verify_loop, cache, N=16)
print(f"verify step (Q=4): {t*1e3:.3f} ms", flush=True)

max_new = jnp.full((B,), 1000, jnp.int32)

def spec_loop(n):
    @jax.jit
    def run(dcache, cache, params):
        def body(i, carry):
            dcache, cache, tok = carry
            toks, accs, lps, dcache, cache = mr.spec_rounds_step.__wrapped__(
                params, dcache, cache, tok, pos, tables, max_new, st, key,
                cfg=cfg, draft_scheme="w4a4", verify_scheme="w4a16", k=K,
                num_rounds=1)
            return (dcache, cache, toks[0, :, 0])
        dcache, cache, t = jax.lax.fori_loop(0, n, body, (dcache, cache, last))
        return t
    return lambda c: run(c[0], c[1], params)

t = timed_chain(spec_loop, (kvc.allocate(kcfg), kvc.allocate(kcfg)), N=8)
print(f"spec round (3 draft + verify): {t*1e3:.3f} ms", flush=True)
