"""Round-2 exp25: where does the w4a16 trunk GEMM time go at M=16 (8B shapes)?

Variants:
  - current matmul_w4a16 chain (4 projections of a Llama-3-8B layer)
  - current matmul_w4a4 chain (int8 MXU pipe incl. per-step activation quant)
  - magic-OR dequant variant: nibbles -> bf16 via bit ops (no int8->bf16
    convert): bf16 pattern 0x4300|u == 128 + u, fold (128+8)*rowsum out.
  - stream-floor kernel (just reads the packed weights, trivial reduce)
  - plain XLA bf16 dot (2x weight bytes, zero unpack) for reference
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
from qspec_tpu.ops.linear_kernels import matmul_w4a16, matmul_w4a4, _choose_bn
from qspec_tpu.ops._kernel_utils import cdiv, round_up, pad_dim
from qspec_tpu.ops.quant import sym_quant_int4

H, I, QKV = 4096, 14336, 6144
shapes = [(H, QKV), (H, H), (H, 2 * I), (I, H)]
layer_gb = sum(k * n for k, n in shapes) / 2 / 1e9  # int4 bytes
key = jax.random.PRNGKey(0)
ws = []
for k, n in shapes:
    key, k1, k2 = jax.random.split(key, 3)
    wp = jax.random.randint(k1, (k // 8, n), -2**31, 2**31 - 1, jnp.int32)
    sc = jax.random.uniform(k2, (n,), jnp.float32, 0.001, 0.01)
    ws.append((wp, sc))
ws = tuple(ws)
M = 16
x0 = jax.random.normal(jax.random.PRNGKey(9), (M, H), jnp.bfloat16)
print(f"layer int4 GB: {layer_gb:.4f}", flush=True)


def report(tag, t):
    print(f"{tag}: {t*1e3:.3f} ms -> {layer_gb/t:.0f} GB/s(int4-bytes)", flush=True)


# -- current w4a16 chain ----------------------------------------------------
def w4a16_loop(n):
    @jax.jit
    def run(x, ws):
        def body(i, x):
            a = matmul_w4a16(x, ws[0][0], ws[0][1])
            x1 = matmul_w4a16(a[:, :H], ws[1][0], ws[1][1])
            g = matmul_w4a16(x1, ws[2][0], ws[2][1])
            return matmul_w4a16(g[:, :I], ws[3][0], ws[3][1])
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, ws)


# -- current w4a4 chain -----------------------------------------------------
def w4a4_loop(n):
    @jax.jit
    def run(x, ws):
        def body(i, x):
            q = sym_quant_int4(x)
            a = matmul_w4a4(q.values, q.scales, ws[0][0], ws[0][1])
            q = sym_quant_int4(a[:, :H])
            x1 = matmul_w4a4(q.values, q.scales, ws[1][0], ws[1][1])
            q = sym_quant_int4(x1)
            g = matmul_w4a4(q.values, q.scales, ws[2][0], ws[2][1])
            q = sym_quant_int4(g[:, :I])
            return matmul_w4a4(q.values, q.scales, ws[3][0], ws[3][1])
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, ws)


# -- magic-OR bf16 dequant kernel ------------------------------------------
MAGIC = 0x43004300
NIBW = 0x000F000F


def _magic_kernel(x0_ref, x1_ref, x2_ref, x3_ref, w_ref, s_ref, out_ref):
    w = w_ref[:]
    acc = jnp.dot(x0_ref[:], pltpu.bitcast((w & NIBW) | MAGIC, jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x1_ref[:],
                   pltpu.bitcast((jax.lax.shift_right_logical(w, 4) & NIBW) | MAGIC,
                                 jnp.bfloat16), preferred_element_type=jnp.float32)
    acc += jnp.dot(x2_ref[:],
                   pltpu.bitcast((jax.lax.shift_right_logical(w, 8) & NIBW) | MAGIC,
                                 jnp.bfloat16), preferred_element_type=jnp.float32)
    acc += jnp.dot(x3_ref[:],
                   pltpu.bitcast((jax.lax.shift_right_logical(w, 12) & NIBW) | MAGIC,
                                 jnp.bfloat16), preferred_element_type=jnp.float32)
    rowsum = (jnp.sum(x0_ref[:].astype(jnp.float32), 1, keepdims=True)
              + jnp.sum(x1_ref[:].astype(jnp.float32), 1, keepdims=True)
              + jnp.sum(x2_ref[:].astype(jnp.float32), 1, keepdims=True)
              + jnp.sum(x3_ref[:].astype(jnp.float32), 1, keepdims=True))
    out_ref[:] = ((acc - 136.0 * rowsum)
                  * s_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def matmul_magic(x, w_packed, w_scales):
    m, k = x.shape
    k_words, n = w_packed.shape
    kq = k // 4
    m_pad = round_up(max(m, 16), 16)
    x = pad_dim(x.astype(jnp.bfloat16), 0, m_pad)
    bm = min(m_pad, 128)
    while m_pad % bm:
        bm //= 2
    bn = _choose_bn(bm, k // 2, n, 2)
    grid = (m_pad // bm, cdiv(n, bn))
    out = pl.pallas_call(
        _magic_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, kq), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, kq), lambda i, j: (i, 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, kq), lambda i, j: (i, 2), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, kq), lambda i, j: (i, 3), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_words, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=k // 2 * n + m_pad * k * 2 + m_pad * n * 2,
            transcendentals=0,
        ),
    )(x, x, x, x, w_packed, w_scales.reshape(1, -1))
    return out[:m]


def magic_loop(n):
    @jax.jit
    def run(x, ws):
        def body(i, x):
            a = matmul_magic(x, ws[0][0], ws[0][1])
            x1 = matmul_magic(a[:, :H], ws[1][0], ws[1][1])
            g = matmul_magic(x1, ws[2][0], ws[2][1])
            return matmul_magic(g[:, :I], ws[3][0], ws[3][1])
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, ws)


# -- stream floor: read all 4 weight buffers, trivial reduce ---------------
def _stream_kernel(w_ref, out_ref):
    out_ref[:] = jnp.sum(w_ref[:], axis=0, keepdims=True)


def stream_one(w_packed):
    k_words, n = w_packed.shape
    bn = min(n, 2048)
    while (k_words * bn * 4) > 8 * 1024 * 1024:
        bn //= 2
    return pl.pallas_call(
        _stream_kernel,
        grid=(cdiv(n, bn),),
        in_specs=[pl.BlockSpec((k_words, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
    )(w_packed)


def stream_loop(n):
    @jax.jit
    def run(x, ws):
        def body(i, x):
            acc = x
            for wp, _ in ws:
                acc = acc + jnp.sum(stream_one(wp).astype(jnp.float32)) * 1e-30
            return acc
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, ws)


print("timing w4a16 (current)...", flush=True)
report("w4a16 cur  4-proj", timed_chain(w4a16_loop, x0, N=16))
print("timing w4a4 (current)...", flush=True)
report("w4a4 cur   4-proj", timed_chain(w4a4_loop, x0, N=16))
print("timing magic...", flush=True)
report("w4a16 magic4-proj", timed_chain(magic_loop, x0, N=16))
print("timing stream floor...", flush=True)
report("stream floor     ", timed_chain(stream_loop, jnp.float32(0.0), N=16))

# -- bf16 XLA dot on the big shape -----------------------------------------
wbf = jax.random.normal(jax.random.PRNGKey(1), (H, 2 * I), jnp.bfloat16) * 0.02
xb = jax.random.normal(jax.random.PRNGKey(2), (M, H), jnp.bfloat16)


def mm_loop(n):
    @jax.jit
    def run(x, w):
        def body(i, x):
            o = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return o[:, :H].astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)
    return lambda x: run(x, wbf)


tb = timed_chain(mm_loop, xb, N=16)
print(f"bf16 XLA dot {H}x{2*I} M=16: {tb*1e3:.3f} ms -> "
      f"{H*2*I*2/1e9/tb:.0f} GB/s(bf16-bytes), {H*2*I/1e12/tb:.2f} Tweights/s",
      flush=True)

# -- M sweep on current w4a16, down-proj shape ------------------------------
for m_test in (16, 32, 64, 128):
    xm = jax.random.normal(jax.random.PRNGKey(3), (m_test, H), jnp.bfloat16)

    def m_loop(n, xm=xm):
        @jax.jit
        def run(x, w, s):
            def body(i, x):
                o = matmul_w4a16(x, w, s)
                return o[:, :H].astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, n, body, x)
        return lambda x: run(x, ws[2][0], ws[2][1])

    tm = timed_chain(m_loop, xm, N=16)
    print(f"w4a16 cur {H}x{2*I} M={m_test}: {tm*1e3:.3f} ms -> "
          f"{H*2*I/2/1e9/tm:.0f} GB/s(int4-bytes)", flush=True)
