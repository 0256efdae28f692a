import time, numpy as np, jax, jax.numpy as jnp, functools
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.attention_pallas import paged_attention_pallas
from qspec_tpu.ops.sampling import SamplingTensors, sampling_probs, sample_with_logprob

L, Hkv, D, S, Pg = 16, 8, 128, 16, 264
B, Hq = 4, 16
kcfg = kvc.KVCacheConfig(L, Hkv, D, num_pages=Pg, page_size=S)
cache = kvc.allocate(kcfg)
slots = jnp.asarray([100, 200, 300, 400], jnp.int32)
k_new = jax.random.normal(jax.random.PRNGKey(0), (B, Hkv, D), jnp.bfloat16)

# 1. KV update, all 16 layers
def upd_loop(n):
    @jax.jit
    def run(c, k_new):
        def body(i, c):
            def layer_body(l, c):
                return kvc.update_layer(c, 0, k_new + l, k_new, slots)._replace()
            # emulate 16 layer updates on layer 0 (same cost profile)
            return jax.lax.fori_loop(0, L, layer_body, c)
        c = jax.lax.fori_loop(0, n, body, c)
        return c.k_pages[0, 6, 4, 0, :8]
    return lambda c: run(c, k_new)
t = timed_chain(upd_loop, cache, N=8)
print(f"kv update x16 layers (T=4): {t*1e3:.3f} ms", flush=True)

# 2. attention x16 layers, ctx ~ 112
q = jax.random.normal(jax.random.PRNGKey(1), (B, 1, Hq, D), jnp.bfloat16)
tables = jnp.asarray(np.arange(1, 1+B*16).reshape(B, 16), jnp.int32)
ctx = jnp.full((B,), 112, jnp.int32)
kp, vp = cache.k_pages[0], cache.v_pages[0]
def attn_loop(n):
    @jax.jit
    def run(q, kp, vp):
        def body(i, q):
            def layer_body(l, q):
                o = paged_attention_pallas(q, kp, vp, tables, ctx, 0.088)
                return (q + 0.0 * o)
            return jax.lax.fori_loop(0, L, layer_body, q)
        return jax.lax.fori_loop(0, n, body, q)
    return lambda q: run(q, kp, vp)
t = timed_chain(attn_loop, q, N=8)
print(f"paged attention x16 layers (B=4, ctx 112): {t*1e3:.3f} ms", flush=True)

# 3. sampling on [4, 128256]
logits = jax.random.normal(jax.random.PRNGKey(2), (B, 128256), jnp.float32)
st = SamplingTensors.greedy(B)
key = jax.random.PRNGKey(0)
def samp_loop(n):
    @jax.jit
    def run(lg):
        def body(i, lg):
            probs = sampling_probs(lg, st)
            tok, lp = sample_with_logprob(lg, st, key)
            return lg + 1e-6 * probs + 1e-6 * lp[:, None]
        return jax.lax.fori_loop(0, n, body, lg)
    return run
t = timed_chain(samp_loop, logits, N=8)
print(f"sampling_probs+sample [4,128k]: {t*1e3:.3f} ms", flush=True)

# 4. embed gather + lm_head
V, H = 128256, 2048
emb = jax.random.normal(jax.random.PRNGKey(3), (V, H), jnp.bfloat16)
lm = jax.random.normal(jax.random.PRNGKey(4), (H, V), jnp.bfloat16)
toks0 = jnp.asarray([5, 9, 11, 200], jnp.int32)
def head_loop(n):
    @jax.jit
    def run(toks, emb, lm):
        def body(i, toks):
            x = emb[toks]
            lg = jnp.dot(x, lm, preferred_element_type=jnp.float32)
            return jnp.argmax(lg, -1).astype(jnp.int32)
        return jax.lax.fori_loop(0, n, body, toks)
    return lambda t: run(t, emb, lm)
t = timed_chain(head_loop, toks0, N=8)
print(f"embed+lm_head+argmax: {t*1e3:.3f} ms", flush=True)
