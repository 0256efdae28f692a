import jax, jax.numpy as jnp, numpy as np, time
print("devices:", jax.devices())
d = jax.devices()[0]

# 1. int4 dtype support
try:
    x = jnp.zeros((128, 256), jnp.int4)
    print("int4 array ok, nbytes on device:", x.nbytes)
except Exception as e:
    print("int4 array FAIL:", e)

# 2. dot_general int8xint8 -> int32
a = jnp.ones((128, 512), jnp.int8)
b = jnp.ones((512, 256), jnp.int8)
try:
    c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    c.block_until_ready()
    print("int8 dot ok:", c.dtype, c[0, 0])
except Exception as e:
    print("int8 dot FAIL:", e)

# 3. int4 dot
try:
    a4 = jnp.ones((128, 512), jnp.int4)
    b4 = jnp.ones((512, 256), jnp.int4)
    c4 = jax.lax.dot_general(a4, b4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    print("int4 dot ok:", c4.dtype, c4[0, 0])
except Exception as e:
    print("int4 dot FAIL:", type(e).__name__, str(e)[:200])

# 4. int4 -> bf16 convert + matmul timing vs bf16 (dequant fusion test), llama-ish shape
K, N, M = 4096, 4096, 8
wi4 = jnp.asarray(np.random.randint(-8, 8, (K, N)), jnp.int4)
scale = jnp.asarray(np.random.rand(N), jnp.bfloat16)
xa = jnp.asarray(np.random.randn(M, K), jnp.bfloat16)

@jax.jit
def deq_mm(x, w, s):
    return jnp.dot(x, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32) * s

@jax.jit
def bf16_mm(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32)

wb = wi4.astype(jnp.bfloat16)
for name, f, args in [("deq_mm_i4", deq_mm, (xa, wi4, scale)), ("bf16_mm", bf16_mm, (xa, wb))]:
    r = f(*args); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(50):
        r = f(*args)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 50
    gb = (K * N * (0.5 if "i4" in name else 2) + M * K * 2 + M * N * 4) / 1e9
    print(f"{name}: {dt*1e6:.0f} us, eff BW {gb/dt:.0f} GB/s")
