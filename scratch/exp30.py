"""exp30: does lax.scan over stacked weights copy each layer's slab?

Same 8 matmuls (gate_up shape, M=8) three ways:
  a) unrolled python loop over 8 separate weight buffers (no slicing)
  b) lax.scan with the stacked [8, K/8, N] weights as xs (dynamic-slice/iter)
  c) fori_loop + explicit dynamic_slice from the stacked array

If (b)/(c) >> (a), the full-model scan is paying a copy per layer slab and
the kernels must index stacked weights internally (scalar prefetch), like
the KV cache already does.
"""
import numpy as np, jax, jax.numpy as jnp
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.ops.linear_kernels import matmul_w4a16

L, M, K, N = 8, 8, 4096, 28672
key = jax.random.PRNGKey(0)
w_stack = jax.random.randint(key, (L, K // 8, N), -2**31, 2**31 - 1, jnp.int32)
s_stack = jax.random.uniform(key, (L, N), jnp.float32, 0.001, 0.01)
w_list = [w_stack[i] for i in range(L)]  # materialized separate buffers
s_list = [s_stack[i] for i in range(L)]
x0 = jax.random.normal(jax.random.PRNGKey(2), (M, K), jnp.bfloat16)
gb = L * (K // 8) * N * 4 / 1e9


def poison(x, o):
    return (x + o[:1, :1].astype(jnp.bfloat16) * 1e-30).astype(jnp.bfloat16)


def mk_unrolled(n):
    @jax.jit
    def run(x, *ws):
        ws_l = ws[:L]
        ss_l = ws[L:]
        def body(i, x):
            for w, s in zip(ws_l, ss_l):
                o = matmul_w4a16(x, w, s)
                x = poison(x, o)
            return x
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, *w_list, *s_list)


def mk_scan(n):
    @jax.jit
    def run(x, w_stack, s_stack):
        def body(i, x):
            def sbody(x, xs):
                w, s = xs
                o = matmul_w4a16(x, w, s)
                return poison(x, o), None
            x, _ = jax.lax.scan(sbody, x, (w_stack, s_stack))
            return x
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, w_stack, s_stack)


def mk_dynslice(n):
    @jax.jit
    def run(x, w_stack, s_stack):
        def body(i, x):
            def lbody(li, x):
                w = jax.lax.dynamic_index_in_dim(w_stack, li, 0, keepdims=False)
                s = jax.lax.dynamic_index_in_dim(s_stack, li, 0, keepdims=False)
                o = matmul_w4a16(x, w, s)
                return poison(x, o)
            return jax.lax.fori_loop(0, L, lbody, x)
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, w_stack, s_stack)


for name, mk in [("unrolled-8-buffers", mk_unrolled), ("scan-stacked-xs", mk_scan),
                 ("fori-dynamic-slice", mk_dynslice)]:
    t = timed_chain(mk, x0, N=16)
    print(f"{name}: {t*1e3:.3f} ms per 8 matmuls ({gb/t:.0f} GB/s)", flush=True)
