"""exp27: lm_head timing on chip — bf16 dense vs int8 kernel vs int4 kernel,
at decode (M=8) and verify (M=32) shapes, V=128256."""
import numpy as np
import jax
import jax.numpy as jnp

from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.ops.linear_kernels import matmul_w8a16, matmul_w4a16

H, V = 4096, 128256
key = jax.random.PRNGKey(0)
w_bf = jax.random.normal(key, (H, V), jnp.bfloat16) * 0.02
w_i8 = jax.random.randint(key, (H, V), -128, 127, jnp.int8)
w_i4 = jax.random.randint(key, (H // 8, V), -2**31, 2**31 - 1, jnp.int32)
s = jax.random.uniform(key, (V,), jnp.float32, 0.001, 0.01)

for M in (8, 32):
    x0 = jax.random.normal(jax.random.PRNGKey(2), (M, H), jnp.bfloat16)

    def mk(fn, *args):
        def loop(n):
            @jax.jit
            def run(x, *a):
                def body(i, x):
                    o = fn(x, *a)
                    return (x + o[:1, :1].astype(jnp.bfloat16) * 1e-30).astype(jnp.bfloat16)
                return jax.lax.fori_loop(0, n, body, x)
            return lambda x: run(x, *args)
        return loop

    t = timed_chain(mk(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32),
                       w_bf), x0, N=200, reps=5)
    print(f"M={M} bf16 dense: {t*1e3:.3f} ms ({H*V*2/1e9/t:.0f} GB/s)", flush=True)
    t = timed_chain(mk(lambda x, w, s: matmul_w8a16(x, w, s, out_dtype=jnp.float32),
                       w_i8, s), x0, N=200, reps=5)
    print(f"M={M} int8 kernel: {t*1e3:.3f} ms ({H*V/1e9/t:.0f} GB/s)", flush=True)
    t = timed_chain(mk(lambda x, w, s: matmul_w4a16(x, w, s, out_dtype=jnp.float32),
                       w_i4, s), x0, N=200, reps=5)
    print(f"M={M} int4 kernel: {t*1e3:.3f} ms ({H*V/2/1e9/t:.0f} GB/s)", flush=True)
