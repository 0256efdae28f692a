"""exp26: per-shape w4a16/w4a4 rates at M=16, and bn-tile sweeps.

Chain loses ~60us/layer vs the best single shape. Find which projections
are slow and whether deeper grids (smaller bn) fix them.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
import qspec_tpu.ops.linear_kernels as lk
from qspec_tpu.ops.quant import sym_quant_int4

H, I, QKV = 4096, 14336, 6144
shapes = {"qkv": (H, QKV), "o": (H, H), "gate_up": (H, 2 * I), "down": (I, H)}
key = jax.random.PRNGKey(0)
M = 16

# weights per shape
W = {}
for name, (k, n) in shapes.items():
    key, k1, k2 = jax.random.split(key, 3)
    W[name] = (jax.random.randint(k1, (k // 8, n), -2**31, 2**31 - 1, jnp.int32),
               jax.random.uniform(k2, (n,), jnp.float32, 0.001, 0.01))


def time_shape(name, fn_builder):
    k, n = shapes[name]
    gb = k * n / 2 / 1e9
    x = jax.random.normal(jax.random.PRNGKey(7), (M, k), jnp.bfloat16)

    def loop(nit):
        @jax.jit
        def run(x, w, s):
            def body(i, x):
                o = fn_builder(x, w, s)
                # feed back: keep shape [M, k] with dependency on o
                return (x + o[:1, :1].astype(jnp.bfloat16) * 1e-30).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, nit, body, x)
        return lambda x: run(x, W[name][0], W[name][1])

    t = timed_chain(loop, x, N=800, reps=5)
    print(f"{name:8s}: {t*1e3:.3f} ms -> {gb/t:.0f} GB/s(int4)", flush=True)
    return t


print("== current matmul_w4a16 per shape ==", flush=True)
tot = 0.0
for name in shapes:
    tot += time_shape(name, lambda x, w, s: lk.matmul_w4a16(x, w, s))
print(f"sum of shapes: {tot*1e3:.3f} ms/layer", flush=True)

print("== current matmul_w4a4 per shape (incl act quant) ==", flush=True)
tot = 0.0


def a4(x, w, s):
    q = sym_quant_int4(x)
    return lk.matmul_w4a4(q.values, q.scales, w, s)


for name in shapes:
    tot += time_shape(name, a4)
print(f"sum of shapes: {tot*1e3:.3f} ms/layer", flush=True)


# -- bn sweep on small-N shapes via a parameterized copy of the kernel -----
def matmul_w4a16_bn(x, w_packed, w_scales, bn):
    m, k = x.shape
    k_words, n = w_packed.shape
    k_half = 4 * k_words
    m_pad = lk.round_up(max(m, 16), 16)
    x = lk.pad_dim(x.astype(jnp.bfloat16), 0, m_pad)
    bm = min(m_pad, 128)
    grid = (m_pad // bm, lk.cdiv(n, bn))
    out = pl.pallas_call(
        lk._w4a16_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k_half), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k_half), lambda i, j: (i, 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_half // 4, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=k_half * n + m_pad * k * 2 + m_pad * n * 2,
            transcendentals=0,
        ),
    )(x, x, w_packed, w_scales.reshape(1, -1))
    return out[:m]


for name in ("qkv", "o", "down", "gate_up"):
    k, n = shapes[name]
    for bn in (256, 512, 1024, 2048):
        if n % bn:
            continue
        if (4 * (k // 8)) // 4 * bn * 4 > 9 * 1024 * 1024:  # w tile bytes cap
            continue
        print(f"-- {name} bn={bn}", flush=True)
        time_shape(name, functools.partial(
            lambda x, w, s, bn: matmul_w4a16_bn(x, w, s, bn), bn=bn))
