import time, numpy as np, jax, jax.numpy as jnp
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
N = 256*1024*1024  # 1GB f32
x = jax.random.normal(jax.random.PRNGKey(0), (N//1024, 1024), jnp.float32)
@jax.jit
def red(a):
    return jnp.sum(a)
r = red(x); jax.block_until_ready(r)
t0=time.perf_counter(); K=10
for _ in range(K): r = red(x)
jax.block_until_ready(r)
dt=(time.perf_counter()-t0)/K
print(f"f32 sum 1GB: {dt*1e3:.2f} ms -> {1.0/dt:.0f} GB/s", flush=True)

y = x.astype(jnp.bfloat16)
@jax.jit
def red16(a): return jnp.sum(a.astype(jnp.float32))
r = red16(y); jax.block_until_ready(r)
t0=time.perf_counter()
for _ in range(K): r = red16(y)
jax.block_until_ready(r)
dt=(time.perf_counter()-t0)/K
print(f"bf16 sum 0.5GB: {dt*1e3:.2f} ms -> {0.5/dt:.0f} GB/s", flush=True)

# M sweep of bf16 matmul: how does streaming BW scale with M?
w = jax.random.normal(jax.random.PRNGKey(1), (4096, 14336), jnp.bfloat16)
for M in [16, 64, 128, 256, 512]:
    a = jax.random.normal(jax.random.PRNGKey(2), (M, 4096), jnp.bfloat16)
    f = jax.jit(lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    r = f(a, w); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(K): r = f(a, w)
    jax.block_until_ready(r)
    dt=(time.perf_counter()-t0)/K
    gb = 4096*14336*2/1e9
    print(f"bf16 matmul M={M}: {dt*1e3:.2f} ms -> {gb/dt:.0f} GB/s weights", flush=True)
