"""Where do the 2.5 s of 8B prefill ([16, 1024] rectangle) go?

Times (a) the full prefill-shaped model_forward, (b) each packed-GEMM
shape at M=16384 through the NEW big-M dequant-once path vs the Pallas
128-row-tile path, (c) the lm_head, and derives the attention+everything
residual. Scalar-sync discipline from exp47."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig
from qspec_tpu.models.llama import AttentionBatch, init_params_device, model_forward
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops import linear_kernels as lk

B, Q, S = 16, 1024, 128
M = B * Q
cfg = ModelConfig.llama3_8b(quant="w4")
t0 = time.time()
params = init_params_device(cfg, seed=0)
jax.block_until_ready(params)
print(f"params {time.time()-t0:.0f}s", flush=True)


def _sync(x):
    a = jax.tree.leaves(x)[0]
    jax.device_get(a[(0,) * a.ndim])


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.1f} ms", flush=True)
    return dt


# --- (a) full prefill rectangle --------------------------------------------
nps = (Q + S - 1) // S + 1
P = B * nps + 1
cache = kvc.allocate(kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads,
                                       cfg.head_dim, P, S))
tables = jnp.asarray((1 + np.arange(B * nps).reshape(B, nps)).astype(np.int32))
toks = jnp.asarray(np.random.default_rng(0).integers(1, 30000, size=(B, Q)),
                   jnp.int32)
batch = AttentionBatch(
    positions=jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None], (B, Q)),
    slot_mapping=(tables[:, :nps - 1].repeat(S, axis=1)[:, :Q] * S
                  + jnp.arange(Q, dtype=jnp.int32)[None] % S),
    block_tables=tables,
    ctx_lens=jnp.full((B,), Q, jnp.int32))


from qspec_tpu.engine.model_runner import prefill_step

prefill = jax.jit(functools.partial(prefill_step, cfg=cfg, scheme="w4a16"))
t_full = timeit("full prefill_step [16,1024]", prefill,
                params, cache, toks, batch.positions, tables,
                jnp.full((B,), Q, jnp.int32), iters=3)

# --- (b) GEMM shapes --------------------------------------------------------
rng = np.random.default_rng(1)
H, I = cfg.hidden_size, cfg.intermediate_size
shapes = [("qkv", H, 6144), ("o", H, H), ("gate_up", H, 2 * I),
          ("down", I, H)]


def pallas_path(x, wp, ws):
    # the pre-bigm behavior: force 128-row M tiles through the kernel
    from qspec_tpu.ops.linear_kernels import (_choose_bn, _w4_pallas,
                                              _w4a16_kernel, cdiv, pad_dim,
                                              round_up)
    m, k = x.shape
    k_words, n = wp.shape
    k_half = 4 * k_words
    m_pad, bm = round_up(m, 128), 128
    x = pad_dim(x.astype(jnp.bfloat16), 0, m_pad)
    bn = _choose_bn(bm, k_half, n, 2)
    grid = (m_pad // bm, cdiv(n, bn))
    return _w4_pallas(_w4a16_kernel, (x, x), wp, ws, None, grid, bm, bn,
                      k_half, m_pad, n, jnp.bfloat16)[:m]


def m_inner_path(x, wp, ws, *, bm):
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
                      k_half, m_pad, n, jnp.bfloat16, m_inner=True)[:m]


totals = {}
for name, k, n in shapes:
    w = (rng.standard_normal((k, n)) * 0.02).astype(np.float32)
    from qspec_tpu.ops.packing import quantize_weight_int4
    qw, qs = quantize_weight_int4(w)
    qw, qs = jnp.asarray(qw), jnp.asarray(qs)
    wb = jnp.asarray(w, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((M, k)).astype(np.float32),
                    jnp.bfloat16)
    runs = {
        "bigm": jax.jit(lambda x, qw, qs: lk.matmul_w4a16(x, qw, qs)),
        "pallas128": jax.jit(pallas_path),
        "minner128": jax.jit(functools.partial(m_inner_path, bm=128)),
        "minner256": jax.jit(functools.partial(m_inner_path, bm=256)),
        "minner512": jax.jit(functools.partial(m_inner_path, bm=512)),
    }
    for tag, f in runs.items():
        t = timeit(f"gemm {name} [{M}x{k}x{n}] {tag}", f, x, qw, qs)
        totals[tag] = totals.get(tag, 0.0) + t
    tb = timeit(f"gemm {name} [{M}x{k}x{n}] pure-bf16-dot",
                jax.jit(lambda x, wb: jnp.dot(x, wb)), x, wb)
    totals["bf16"] = totals.get("bf16", 0.0) + tb

L = cfg.num_layers
print(flush=True)
for tag, t in totals.items():
    print(f"GEMM stack x{L} {tag:12s} {t*L:.2f} s", flush=True)
print(f"full prefill {t_full:.2f} s -> non-GEMM residual "
      f"{t_full - totals['bigm']*L:.2f} s", flush=True)

fl = 2 * M * sum(k * n for _, k, n in shapes) * L
for tag, t in totals.items():
    print(f"{tag:12s} eff {fl/1e12/(t*L):.0f} Tflop/s", flush=True)
