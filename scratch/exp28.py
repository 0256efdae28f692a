"""exp28: interleaved-KV attention kernel on chip — bf16 + int8 paths.

8B decode shape: B=8, Hkv=8, D=128, S=128 pages, ctx=768 (6 pages/seq),
Q=1 and Q=4 (verify). Correctness vs dense ref + timing.
"""
import numpy as np
import jax
import jax.numpy as jnp

from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.attention import paged_attention_ref
from qspec_tpu.ops.attention_pallas import paged_attention_pallas

B, Hq, Hkv, D, S = 8, 32, 8, 128, 128
PAGES_PER_SEQ = 6
CTX = S * PAGES_PER_SEQ
L = 1
NP_ = 1 + B * PAGES_PER_SEQ

for dtype in ("bfloat16", "int8"):
    cfg = kvc.KVCacheConfig(num_layers=L, num_kv_heads=Hkv, head_dim=D,
                            num_pages=NP_, page_size=S, dtype=dtype)
    cache = kvc.allocate(cfg)
    key = jax.random.PRNGKey(0)
    T = B * CTX
    k_new = jax.random.normal(key, (T, Hkv, D), jnp.bfloat16)
    v_new = jax.random.normal(jax.random.PRNGKey(1), (T, Hkv, D), jnp.bfloat16)
    slots = jnp.asarray(np.arange(T) + S, jnp.int32)
    cache = jax.jit(kvc.update_layer)(cache, 0, k_new, v_new, slots)
    tables = jnp.asarray(np.arange(1, NP_).reshape(B, PAGES_PER_SEQ), jnp.int32)

    for Q in (1, 4):
        ctx = jnp.full((B,), CTX - 8 + Q, jnp.int32)
        q = jax.random.normal(jax.random.PRNGKey(2), (B, Q, Hq, D), jnp.bfloat16)
        out = paged_attention_pallas(q, cache.kv_pages, tables, ctx, D ** -0.5,
                                     kv_scales=cache.kv_scales)
        ref = paged_attention_ref(q, cache, 0, tables, ctx, D ** -0.5)
        err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)))
        print(f"{dtype} Q={Q}: maxerr {err:.4f}", flush=True)

        def loop(n):
            @jax.jit
            def run(q, kvp, sc):
                def body(i, q):
                    o = paged_attention_pallas(q, kvp, tables, ctx, D ** -0.5,
                                               kv_scales=sc)
                    return (q + o[:1, :1, :1, :1] * 1e-30).astype(q.dtype)
                return jax.lax.fori_loop(0, n, body, q)
            return lambda q: run(q, cache.kv_pages, cache.kv_scales)

        t = timed_chain(loop, q, N=400, reps=5)
        per = 1 if dtype == "int8" else 2
        gb = B * PAGES_PER_SEQ * 2 * Hkv * S * D * per / 1e9
        print(f"{dtype} Q={Q}: {t*1e6:.1f} us/layer-call -> {gb/t:.0f} GB/s "
              f"(x32 layers = {t*32*1e3:.2f} ms)", flush=True)
