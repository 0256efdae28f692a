import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from qspec_tpu.ops.linear_kernels import matmul_w4a16, matmul_w4a16_ref, matmul_w4a4, matmul_w4a4_ref
from qspec_tpu.ops.packing import quantize_weight_int4
from qspec_tpu.ops.quant import sym_quant_int4

rng = np.random.default_rng(0)
K, N, M = 4096, 4096, 16
wf = rng.standard_normal((K, N), dtype=np.float32) * 0.02
wp_np, ws_np = quantize_weight_int4(wf)
wp, ws = jnp.asarray(wp_np), jnp.asarray(ws_np)
x = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32), jnp.bfloat16)

t0=time.time()
out = matmul_w4a16(x, wp, ws); out.block_until_ready()
print("w4a16 compile+run ok", time.time()-t0, "s")
ref = matmul_w4a16_ref(x, wp, ws)
err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
rel = err / max(1e-6, np.abs(np.asarray(ref, np.float32)).max())
print("w4a16 maxerr:", err, "rel:", rel)

xq = sym_quant_int4(x)
t0=time.time()
out4 = matmul_w4a4(xq.values, xq.scales, wp, ws); out4.block_until_ready()
print("w4a4 compile+run ok", time.time()-t0, "s")
ref4 = matmul_w4a4_ref(xq.values, xq.scales, wp, ws)
err4 = np.abs(np.asarray(out4, np.float32) - np.asarray(ref4, np.float32)).max()
print("w4a4 maxerr:", err4)

def bench(f, *args, iters=50):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters

t16 = bench(matmul_w4a16, x, wp, ws)
t44 = bench(matmul_w4a4, xq.values, xq.scales, wp, ws)
wbytes = K*N//2
print(f"w4a16: {t16*1e6:.0f} us -> {wbytes/t16/1e9:.0f} GB/s weight-stream")
print(f"w4a4 : {t44*1e6:.0f} us -> {wbytes/t44/1e9:.0f} GB/s weight-stream")

# compare against plain bf16 matmul (2x bytes)
wb = jnp.asarray(wf, jnp.bfloat16)
mm = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
tb = bench(mm, x, wb)
print(f"bf16 : {tb*1e6:.0f} us -> {K*N*2/tb/1e9:.0f} GB/s weight-stream")
