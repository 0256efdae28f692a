"""exp31: prototype stacked-weight w4a16 kernel with scalar-prefetch layer
index — does a dynamic leading index keep the unrolled-speed DMA stream?"""
import functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain
from qspec_tpu.ops.packing import MASK32
from qspec_tpu.ops._kernel_utils import cdiv, round_up, pad_dim

L, M, K, N = 8, 8, 4096, 28672
key = jax.random.PRNGKey(0)
w_stack = jax.random.randint(key, (L, K // 8, N), -2**31, 2**31 - 1, jnp.int32)
s_stack = jax.random.uniform(key, (L, 1, N), jnp.float32, 0.001, 0.01)
x0 = jax.random.normal(jax.random.PRNGKey(2), (M, K), jnp.bfloat16)
gb = L * (K // 8) * N * 4 / 1e9


def _swar_planes(w32):
    lo = pltpu.bitcast(w32 & MASK32, jnp.int8)
    hi = pltpu.bitcast(jnp.right_shift(w32, 4) & MASK32, jnp.int8)
    return lo, hi


def _kernel(li_ref, x_lo_ref, x_hi_ref, w_ref, s_ref, out_ref):
    lo_u, hi_u = _swar_planes(w_ref[0])
    acc = jnp.dot(x_lo_ref[:], lo_u.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi_ref[:], hi_u.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    rowsum = jnp.sum(x_lo_ref[:].astype(jnp.float32), axis=1, keepdims=True) + \
        jnp.sum(x_hi_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    out_ref[:] = ((acc - 8.0 * rowsum)
                  * s_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


@jax.jit
def matmul_w4a16_stacked(li, x, w_stack, s_stack):
    m, k = x.shape
    _, k_words, n = w_stack.shape
    k_half = 4 * k_words
    m_pad = round_up(max(m, 16), 16)
    x = pad_dim(x.astype(jnp.bfloat16), 0, m_pad)
    bm = min(m_pad, 128)
    bn = 2048
    while bn > 128 and n // bn < 8:
        bn //= 2
    while n % bn:
        bn //= 2
    grid = (m_pad // bm, cdiv(n, bn))
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k_half), lambda i, j, li: (i, 0)),
                pl.BlockSpec((bm, k_half), lambda i, j, li: (i, 1)),
                pl.BlockSpec((1, k_words, bn), lambda i, j, li: (li[0], 0, j)),
                pl.BlockSpec((1, 1, bn), lambda i, j, li: (li[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, li: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=k_half * n + m_pad * k * 2 + m_pad * n * 2,
            transcendentals=0,
        ),
    )(jnp.atleast_1d(li).astype(jnp.int32), x, x, w_stack, s_stack)
    return out[:m]


# correctness vs existing kernel
from qspec_tpu.ops.linear_kernels import matmul_w4a16
ref = matmul_w4a16(x0, w_stack[3], s_stack[3, 0])
got = matmul_w4a16_stacked(jnp.int32(3), x0, w_stack, s_stack)
err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
print("max abs err vs 2-D kernel:", jax.device_get(err), flush=True)


def poison(x, o):
    return (x + o[:1, :1].astype(jnp.bfloat16) * 1e-30).astype(jnp.bfloat16)


def mk_stacked(n):
    @jax.jit
    def run(x, w_stack, s_stack):
        def body(i, x):
            def lbody(li, x):
                o = matmul_w4a16_stacked(li, x, w_stack, s_stack)
                return poison(x, o)
            return jax.lax.fori_loop(0, L, lbody, x)
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, w_stack, s_stack)


t = timed_chain(mk_stacked, x0, N=16)
print(f"stacked-prefetch-index: {t*1e3:.3f} ms per 8 matmuls ({gb/t:.0f} GB/s)", flush=True)
