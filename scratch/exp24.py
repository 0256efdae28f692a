"""Microbench: attention kernel alone at 8B decode shapes (32 layers worth)."""
import numpy as np, jax, jax.numpy as jnp, functools
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.ops.attention_pallas import paged_attention_pallas

L, Hkv, Hq, D = 32, 8, 32, 128
B, Q = 8, 1

def bench(S, n_pages_per_seq, ppc, tag):
    P = 1 + B * n_pages_per_seq
    key = jax.random.PRNGKey(0)
    kp = jax.random.normal(key, (L, P, S, Hkv, D), jnp.bfloat16)
    vp = jax.random.normal(key, (L, P, S, Hkv, D), jnp.bfloat16)
    tables = jnp.asarray(np.arange(1, 1 + B * n_pages_per_seq).reshape(B, -1), jnp.int32)
    ctx = jnp.full((B,), 700, jnp.int32)
    q = jax.random.normal(key, (B, Q, Hq, D), jnp.bfloat16)

    def loop(n):
        @jax.jit
        def run(q, kp, vp):
            def body(i, acc):
                def layer_body(l, acc2):
                    o = paged_attention_pallas(acc2[:, :, :Hq], kp, vp, tables, ctx,
                                               0.088, pages_per_chunk=ppc,
                                               layer=l % L)
                    return acc2.at[:, :, :Hq].set(o + 1e-6 * acc2[:, :, :Hq])
                return jax.lax.fori_loop(0, L, layer_body, acc)
            return jax.lax.fori_loop(0, n, body, q)
        return lambda qq: run(qq, kp, vp)
    t = timed_chain(loop, q, N=8)
    kv_gb = 2 * L * B * n_pages_per_seq * S * Hkv * D * 2 / 1e9
    print(f"{tag}: {t*1e3:.3f} ms/step ({kv_gb/t:.0f} GB/s effective)", flush=True)

# pure-DMA floor: contiguous reduction over the same bytes
def floor(S, n_pages_per_seq):
    P = 1 + B * n_pages_per_seq
    kp = jax.random.normal(jax.random.PRNGKey(0), (L, P, S, Hkv, D), jnp.bfloat16)
    def loop(n):
        @jax.jit
        def run(kp):
            def body(i, acc):
                return acc + jnp.sum(kp, axis=(1, 2, 3, 4))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((L,), jnp.float32))
        return lambda _:(run(kp))
    t = timed_chain(loop, None, N=8)
    gb = L * P * S * Hkv * D * 2 / 1e9
    print(f"dense-sum floor (1x cache read): {t*1e3:.3f} ms ({gb/t:.0f} GB/s)", flush=True)

floor(16, 48)
bench(16, 48, 8, "page16 ppc8 (current)")
bench(16, 48, 16, "page16 ppc16")
bench(16, 48, 24, "page16 ppc24")
bench(64, 12, 4, "page64 ppc4")
