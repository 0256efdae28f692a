import time, numpy as np, jax, jax.numpy as jnp, functools, itertools
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
import qspec_tpu.ops.linear_kernels as lk
from qspec_tpu.ops.packing import quantize_weight_int4

H, I = 2048, 8192
rng = np.random.default_rng(0)
M = 16
shapes = [(H, 3072), (H, H), (H, 2*I), (I, H)]
ws = []
for k, n in shapes:
    w = rng.standard_normal((k, n), dtype=np.float32) * 0.02
    a, s = quantize_weight_int4(w)
    ws.append((jnp.asarray(a), jnp.asarray(s)))
x0 = jnp.asarray(rng.standard_normal((M, H), dtype=np.float32), jnp.bfloat16)
wgb = 16*sum(k*n for k,n in shapes)/2/1e9

def make_stack(choose):
    lk._choose_blocks_orig = getattr(lk, "_choose_blocks_orig", lk._choose_blocks)
    lk._choose_blocks = choose
    @functools.partial(jax.jit, static_argnums=())
    def stack(x):
        def body(i, x):
            a = lk.matmul_w4a16.__wrapped__(x, ws[0][0], ws[0][1])
            x1 = lk.matmul_w4a16.__wrapped__(a[:, :H], ws[1][0], ws[1][1])
            g = lk.matmul_w4a16.__wrapped__(x1, ws[2][0], ws[2][1])
            return lk.matmul_w4a16.__wrapped__(g[:, :I], ws[3][0], ws[3][1])
        return jax.lax.fori_loop(0, 16, body, x)
    return stack

results = []
for bkh, bn in itertools.product([512, 1024, 2048, 4096], [256, 512, 1024, 2048]):
    def choose(m, k_half, n, xb, _bkh=bkh, _bn=bn):
        bn_ = min(n, _bn)
        bk_ = min(k_half, _bkh)
        while k_half % bk_: bk_ //= 2
        while n % bn_: bn_ //= 2
        return bk_, bn_
    try:
        f = make_stack(choose)
        r = f(x0); jax.block_until_ready(r)
        t0=time.perf_counter(); N=10
        for _ in range(N): r = f(x0)
        jax.block_until_ready(r)
        dt=(time.perf_counter()-t0)/N
        print(f"bkh={bkh} bn={bn}: {dt*1e3:.2f} ms ({wgb/dt:.0f} GB/s)", flush=True)
        results.append((dt, bkh, bn))
    except Exception as e:
        print(f"bkh={bkh} bn={bn}: FAIL {str(e)[:80]}", flush=True)
print("best:", sorted(results)[0] if results else None, flush=True)
