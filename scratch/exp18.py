import time, numpy as np, jax, jax.numpy as jnp, functools
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.ops.linear_kernels import matmul_w4a16, matmul_w4a4
from qspec_tpu.ops.packing import quantize_weight_int4
from qspec_tpu.ops.quant import sym_quant_int4

H, I = 2048, 8192
rng = np.random.default_rng(0)
M = 16
shapes = [(H, 3072), (H, H), (H, 2*I), (I, H)]
ws = []
for k, n in shapes:
    w = rng.standard_normal((k, n), dtype=np.float32) * 0.02
    a, s = quantize_weight_int4(w)
    ws.append((jnp.asarray(a), jnp.asarray(s)))
ws = tuple(tuple(w) for w in ws)
x0 = jnp.asarray(rng.standard_normal((M, H), dtype=np.float32), jnp.bfloat16)
layer_gb = sum(k*n for k,n in shapes)/2/1e9

def stack_loop(n):
    @jax.jit
    def run(x, ws):
        def body(i, x):
            a = matmul_w4a16(x, ws[0][0], ws[0][1])
            x1 = matmul_w4a16(a[:, :H], ws[1][0], ws[1][1])
            g = matmul_w4a16(x1, ws[2][0], ws[2][1])
            return matmul_w4a16(g[:, :I], ws[3][0], ws[3][1])
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, ws)

t = timed_chain(stack_loop, x0, N=16)
print(f"w4a16 4-proj layer: {t*1e3:.3f} ms -> {layer_gb/t:.0f} GB/s", flush=True)

def stack_loop_a4(n):
    @jax.jit
    def run(x, ws):
        def body(i, x):
            q = sym_quant_int4(x)
            a = matmul_w4a4(q.values, q.scales, ws[0][0], ws[0][1])
            q = sym_quant_int4(a[:, :H]); x1 = matmul_w4a4(q.values, q.scales, ws[1][0], ws[1][1])
            q = sym_quant_int4(x1); g = matmul_w4a4(q.values, q.scales, ws[2][0], ws[2][1])
            q = sym_quant_int4(g[:, :I])
            return matmul_w4a4(q.values, q.scales, ws[3][0], ws[3][1])
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, ws)
t4 = timed_chain(stack_loop_a4, x0, N=16)
print(f"w4a4  4-proj layer: {t4*1e3:.3f} ms -> {layer_gb/t4:.0f} GB/s", flush=True)

wbf = jax.random.normal(jax.random.PRNGKey(1), (4096, 14336), jnp.bfloat16) * 0.02
xb = jax.random.normal(jax.random.PRNGKey(2), (M, 4096), jnp.bfloat16)
def mm_loop(n):
    @jax.jit
    def run(x, w):
        def body(i, x):
            o = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return o[:, :4096].astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, wbf)
tb = timed_chain(mm_loop, xb, N=16)
print(f"bf16 matmul 4096x14336 M=16: {tb*1e3:.3f} ms -> {4096*14336*2/1e9/tb:.0f} GB/s", flush=True)

big = jax.random.normal(jax.random.PRNGKey(3), (256, 1024, 1024), jnp.float32)
def red_loop(n):
    @jax.jit
    def run(acc, b):
        def body(i, acc):
            return acc + jnp.sum(b * (1.0 + acc * 0))
        return jax.lax.fori_loop(0, n, body, acc)
    return lambda a: run(a, big)
tr = timed_chain(red_loop, jnp.float32(0), N=4)
print(f"f32 reduce 1GB: {tr*1e3:.3f} ms -> {1.0/tr:.0f} GB/s", flush=True)
