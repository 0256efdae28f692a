import time, numpy as np, jax, jax.numpy as jnp, functools
from qspec_tpu.ops.linear_kernels import matmul_w4a16, matmul_w4a4
from qspec_tpu.ops.packing import quantize_weight_int4
from qspec_tpu.ops.quant import sym_quant_int4

rng = np.random.default_rng(0)
K, N, M = 4096, 4096, 16
wp, ws = (jnp.asarray(a) for a in quantize_weight_int4(rng.standard_normal((K,N), dtype=np.float32)*0.02))
x = jnp.asarray(rng.standard_normal((M,K), dtype=np.float32), jnp.bfloat16)
xq = sym_quant_int4(x)
wb = jnp.asarray(rng.standard_normal((K,N), dtype=np.float32), jnp.bfloat16)

# (a) dispatch latency
tiny = jax.jit(lambda a: a + 1)
r = tiny(x); r.block_until_ready()
t0=time.perf_counter()
for _ in range(100): r = tiny(r)
r.block_until_ready()
print(f"dispatch latency: {(time.perf_counter()-t0)/100*1e6:.0f} us", flush=True)

ITER = 50
def loop(fn):
    @jax.jit
    def run(x0):
        def body(i, acc):
            return fn(acc)
        return jax.lax.fori_loop(0, ITER, body, x0)
    return run

# w4a16 loop: out [M,N] -> feed back slice to keep shape [M,K] (K==N here)
w16 = loop(lambda a: matmul_w4a16(a, wp, ws))
w44 = loop(lambda a: matmul_w4a16(a, wp, ws))  # placeholder
bf = loop(lambda a: jnp.dot(a, wb, preferred_element_type=jnp.float32).astype(jnp.bfloat16))

def bench(f, x0, name, wbytes):
    r = f(x0); jax.block_until_ready(r)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps): r = f(x0)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/reps/ITER
    print(f"{name}: {dt*1e6:.1f} us/op -> {wbytes/dt/1e9:.0f} GB/s weight-stream", flush=True)

bench(w16, x, "w4a16(loop)", K*N//2)
bench(bf, x, "bf16(loop)", K*N*2)

# w4a4: keep int8 activations flowing: quantize output back
@jax.jit
def w44_run(xq_vals, xq_scales):
    def body(i, carry):
        vals, scales = carry
        out = matmul_w4a4(vals, scales, wp, ws)
        q = sym_quant_int4(out)
        return (q.values, q.scales)
    return jax.lax.fori_loop(0, ITER, body, (xq_vals, xq_scales))
r = w44_run(xq.values, xq.scales); jax.block_until_ready(r)
t0=time.perf_counter()
for _ in range(5): r = w44_run(xq.values, xq.scales)
jax.block_until_ready(r)
dt = (time.perf_counter()-t0)/5/ITER
print(f"w4a4(loop+quant): {dt*1e6:.1f} us/op -> {K*N//2/dt/1e9:.0f} GB/s weight-stream", flush=True)
