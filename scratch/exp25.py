"""Isolate per-call overhead of the attention kernel: vary ctx, L, B."""
import numpy as np, jax, jax.numpy as jnp
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.ops.attention_pallas import paged_attention_pallas

Hkv, Hq, D, Q = 8, 32, 128, 1
B = 8

def bench(L, S, npps, ctx_val, ppc, tag, nb=B):
    P = 1 + nb * npps
    key = jax.random.PRNGKey(0)
    kp = jax.random.normal(key, (L, P, S, Hkv, D), jnp.bfloat16)
    vp = jax.random.normal(key, (L, P, S, Hkv, D), jnp.bfloat16)
    tables = jnp.asarray(np.arange(1, 1 + nb * npps).reshape(nb, -1), jnp.int32)
    ctx = jnp.full((nb,), ctx_val, jnp.int32)
    q = jax.random.normal(key, (nb, Q, Hq, D), jnp.bfloat16)

    def loop(n):
        @jax.jit
        def run(q, kp, vp):
            def body(i, acc):
                o = paged_attention_pallas(acc, kp, vp, tables, ctx,
                                           0.088, pages_per_chunk=ppc,
                                           layer=i % L)
                return o + 1e-6 * acc
            return jax.lax.fori_loop(0, n, body, q)
        return lambda qq: run(qq, kp, vp)
    t = timed_chain(loop, q, N=64)
    gb = nb * ctx_val * Hkv * D * 2 * 2 / 1e9
    print(f"{tag}: {t*1e3:.3f} ms/call ({gb/t:.0f} GB/s)", flush=True)

bench(32, 16, 48, 700, 8,  "L32 ctx700 ppc8")
bench(32, 16, 48, 100, 8,  "L32 ctx100 ppc8")
bench(1,  16, 48, 700, 8,  "L1  ctx700 ppc8")
bench(32, 16, 48, 700, 8,  "L32 ctx700 ppc8 B=1", nb=1)
bench(32, 16, 48, 700, 48, "L32 ctx700 ppc48")
bench(32, 64, 12, 700, 4,  "page64  ppc4 (new kernel)")
bench(32, 64, 12, 700, 2,  "page64  ppc2")
bench(32, 128, 6, 700, 2,  "page128 ppc2")
bench(32, 128, 6, 700, 1,  "page128 ppc1")
