"""Prefill component timing done RIGHT: chained in-jit iterations with
differential-N (tpu_timing.timed_chain), which cancels the ~30 ms tunnel
RTT that inflated exp48's per-op numbers ~x2-6.

Times the 4 packed-GEMM shapes at M=16384 (bigm XLA dequant-once vs
m-inner pallas vs the 128-row-tile pallas vs a pure bf16 dot ceiling) and
the prefill attention kernel per layer."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_timing import timed_chain
from qspec_tpu.config import ModelConfig
from qspec_tpu.ops import linear_kernels as lk
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.attention import paged_attention
from qspec_tpu.ops.packing import quantize_weight_int4

B, Q, S = 16, 1024, 128
M = B * Q
cfg = ModelConfig.llama3_8b(quant="w4")
H, I = cfg.hidden_size, cfg.intermediate_size
L = cfg.num_layers
rng = np.random.default_rng(1)


def pallas_fixed(x, wp, ws, *, bm, m_inner):
    from qspec_tpu.ops.linear_kernels import (_choose_bn, _w4_pallas,
                                              _w4a16_kernel, cdiv, pad_dim,
                                              round_up)
    m, k = x.shape
    k_words, n = wp.shape
    k_half = 4 * k_words
    m_pad = round_up(m, bm)
    x = pad_dim(x.astype(jnp.bfloat16), 0, m_pad)
    bn = _choose_bn(bm, k_half, n, 2)
    grid = (m_pad // bm, cdiv(n, bn))
    return _w4_pallas(_w4a16_kernel, (x, x), wp, ws, None, grid, bm, bn,
                      k_half, m_pad, n, jnp.bfloat16, m_inner=m_inner)[:m]


shapes = [("qkv", H, 6144), ("o", H, H), ("gate_up", H, 2 * I),
          ("down", I, H)]
totals = {}
for name, k, n in shapes:
    w = (rng.standard_normal((k, n)) * 0.02).astype(np.float32)
    qw, qs = quantize_weight_int4(w)
    qw, qs = jnp.asarray(qw), jnp.asarray(qs)
    wb = jnp.asarray(w, jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((M, k)).astype(np.float32),
                     jnp.bfloat16)

    def chain(f, k=k, n=n):
        def make(nit):
            @jax.jit
            def run(x):
                def body(i, xc):
                    out = f(xc)
                    if n >= k:
                        d = out[:, :k]
                    else:
                        d = jnp.pad(out, ((0, 0), (0, k - n)))
                    return xc + d.astype(xc.dtype) * jnp.bfloat16(1e-30)
                return jax.lax.fori_loop(0, nit, body, x)
            return run
        return make

    runs = {
        "bigm": lambda xc: lk.matmul_w4a16(xc, qw, qs),
        "pallas128": functools.partial(pallas_fixed, wp=qw, ws=qs, bm=128,
                                       m_inner=False),
        "minner256": functools.partial(pallas_fixed, wp=qw, ws=qs, bm=256,
                                       m_inner=True),
        "bf16dot": lambda xc: jnp.dot(xc, wb),
    }
    for tag, f in runs.items():
        t = timed_chain(chain(f), x0, N=8, reps=3)
        totals[tag] = totals.get(tag, 0.0) + t
        fl = 2 * M * k * n
        print(f"{name:8s} [{M}x{k}x{n}] {tag:10s} {t*1e3:7.2f} ms  "
              f"{fl/1e12/t:5.0f} Tflop/s", flush=True)

print(flush=True)
for tag, t in totals.items():
    print(f"GEMM stack x{L} {tag:10s} {t*L:6.3f} s", flush=True)

# attention prefill per layer
nps = (Q + S - 1) // S + 1
P = B * nps + 1
cache = kvc.allocate(kvc.KVCacheConfig(L, cfg.num_kv_heads, cfg.head_dim,
                                       P, S))
tables = jnp.asarray((1 + np.arange(B * nps).reshape(B, nps)).astype(np.int32))
pos = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None], (B, Q))
ctx = jnp.full((B,), Q, jnp.int32)
q0 = jnp.asarray(rng.standard_normal((B, Q, cfg.num_heads, cfg.head_dim))
                 .astype(np.float32), jnp.bfloat16)
scale = cfg.head_dim ** -0.5


def attn_make(nit):
    @jax.jit
    def run(q):
        def body(i, qc):
            o = paged_attention(qc, cache, 0, tables, ctx, scale,
                                q_positions=pos)
            return qc + o.astype(qc.dtype) * jnp.bfloat16(1e-30)
        return jax.lax.fori_loop(0, nit, body, q)
    return run


t_at = timed_chain(attn_make, q0, N=8, reps=3)
print(f"\nattention prefill [B16 Q1024] per layer {t_at*1e3:7.2f} ms; "
      f"x{L} = {t_at*L:.3f} s", flush=True)
