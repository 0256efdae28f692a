import time, numpy as np, jax, jax.numpy as jnp, functools
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from qspec_tpu.ops.linear_kernels import matmul_w4a16, matmul_w4a4
from qspec_tpu.ops.packing import quantize_weight_int4
from qspec_tpu.ops.quant import sym_quant_int4

H, I, V, L = 2048, 8192, 128256, 16
rng = np.random.default_rng(0)
M = 16  # padded decode batch

def qw(k, n):
    w = rng.standard_normal((k, n), dtype=np.float32) * 0.02
    a, s = quantize_weight_int4(w)
    return jnp.asarray(a), jnp.asarray(s)

qkv = qw(H, 3072); o = qw(H, H); gu = qw(H, 2*I); dn = qw(I, H)
lm = jnp.asarray(rng.standard_normal((H, V), dtype=np.float32), jnp.bfloat16)
x0 = jnp.asarray(rng.standard_normal((M, H), dtype=np.float32), jnp.bfloat16)

@jax.jit
def linear_stack(x):
    def body(i, x):
        a = matmul_w4a16(x, qkv[0], qkv[1])      # [M, 3072]
        x1 = matmul_w4a16(a[:, :H], o[0], o[1])  # o-proj
        g = matmul_w4a16(x1, gu[0], gu[1])
        x2 = matmul_w4a16(g[:, :I] , dn[0], dn[1])
        return x2
    return jax.lax.fori_loop(0, L, body, x)

@jax.jit
def lm_head(x, w):
    return jnp.argmax(jnp.dot(x, w, preferred_element_type=jnp.float32), axis=-1)

def bench(f, x, name, gb):
    r = f(x); jax.block_until_ready(r)
    t0=time.perf_counter(); N=20
    for _ in range(N): r = f(x)
    jax.block_until_ready(r)
    dt=(time.perf_counter()-t0)/N
    print(f"{name}: {dt*1e3:.2f} ms ({gb/dt:.0f} GB/s)", flush=True)

wgb = L*(H*3072 + H*H + H*2*I + I*H)/2/1e9
bench(linear_stack, x0, "16-layer w4a16 linear stack", wgb)

# w4a4 stack
@jax.jit
def linear_stack_a4(x):
    def body(i, x):
        q = sym_quant_int4(x)
        a = matmul_w4a4(q.values, q.scales, qkv[0], qkv[1])
        q = sym_quant_int4(a[:, :H]); x1 = matmul_w4a4(q.values, q.scales, o[0], o[1])
        q = sym_quant_int4(x1); g = matmul_w4a4(q.values, q.scales, gu[0], gu[1])
        q = sym_quant_int4(g[:, :I]); x2 = matmul_w4a4(q.values, q.scales, dn[0], dn[1])
        return x2
    return jax.lax.fori_loop(0, L, body, x)
bench(linear_stack_a4, x0, "16-layer w4a4 linear stack", wgb)

def bench2(f, name, gb):
    r = f(x0, lm); jax.block_until_ready(r)
    import time as _t
    t0=_t.perf_counter(); N=20
    for _ in range(N): r = f(x0, lm)
    jax.block_until_ready(r)
    dt=(_t.perf_counter()-t0)/N
    print(f"{name}: {dt*1e3:.2f} ms ({gb/dt:.0f} GB/s)", flush=True)
bench2(lm_head, "lm_head bf16", H*V*2/1e9)
