"""Pallas flash paged-attention kernel (decode / verify / chunked prefill).

TPU-native replacement for the reference's paged-attention CUDA kernels
(csrc/attention/paged_attention_v{1,2}.cu) and the FlashAttention decode path
(vllm/attention/backends/flash_attn.py). One kernel covers all query widths:
Q=1 decode, Q=k+1 speculative verify (the MQA scorer,
vllm/spec_decode/mqa_scorer.py:10), and prompt chunks.

Structure: grid (batch, kv_chunk) with the kv chunk innermost. Pages live in
HBM (page-major layout [P, S, Hkv, D], see kv_cache.py); the kernel DMAs
each chunk's pages — ONE contiguous ~32 KB DMA per page covering every kv
head — into VMEM scratch guided by the scalar-prefetched block table, then
performs a batched-over-heads online-softmax (flash) update into f32
accumulators that persist across the chunk dimension. Chunks past a
sequence's context length are skipped via predication.

Query layout: [B, Hkv, G, D] with G = group * Q rows (grouped-query heads x
query positions, Q minor); the two contractions per chunk are batched over
the Hkv dimension on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qspec_tpu.ops._kernel_utils import interpret_mode, round_up

NEG_INF = -1e30


def _paged_attn_kernel(
    # scalar prefetch
    block_tables_ref,   # [B * max_pages] int32
    ctx_lens_ref,       # [B] int32
    q_start_ref,        # [B] int32: absolute position of each row's query 0
    layer_ref,          # [1] int32: layer index into the stacked cache
    # inputs
    q_ref,              # [1, Hkv, G, D] VMEM
    k_pages_ref,        # [L, P, S, Hkv, D] HBM
    v_pages_ref,
    # outputs
    out_ref,            # [1, Hkv, G, D] VMEM
    # scratch
    k_buf, v_buf,       # [PPC, S, Hkv, D] VMEM
    m_i, l_i,           # [Hkv, G, 128] f32
    acc,                # [Hkv, G, D] f32
    sems,               # DMA semaphores [2, PPC]
    *,
    num_q: int,
    pages_per_chunk: int,
    page_size: int,
    max_pages: int,
    scale: float,
):
    b = pl.program_id(0)
    g = pl.program_id(1)
    chunk = pl.program_id(2)
    ctx_len = ctx_lens_ref[b]
    chunk_kv = pages_per_chunk * page_size
    chunk_start = chunk * chunk_kv

    Hkv, G, D = acc.shape  # G = this query block's rows

    @pl.when(chunk == 0)
    def _():
        m_i[:] = jnp.full_like(m_i, NEG_INF)
        l_i[:] = jnp.zeros_like(l_i)
        acc[:] = jnp.zeros_like(acc)

    is_live = chunk_start < ctx_len

    @pl.when(is_live)
    def _():
        # one DMA per page: [S, Hkv, D] contiguous
        layer = layer_ref[0]

        def dma(i, sem_row, dst, src):
            page_id = block_tables_ref[b * max_pages + chunk * pages_per_chunk + i]
            return pltpu.make_async_copy(src.at[layer, page_id], dst.at[i],
                                         sems.at[sem_row, i])

        for i in range(pages_per_chunk):
            dma(i, 0, k_buf, k_pages_ref).start()
            dma(i, 1, v_buf, v_pages_ref).start()
        for i in range(pages_per_chunk):
            dma(i, 0, k_buf, k_pages_ref).wait()
            dma(i, 1, v_buf, v_pages_ref).wait()

        # [PPC, S, H, D] -> [H, C, D] per-head views via transpose
        k = k_buf[:].reshape(chunk_kv, Hkv, D).swapaxes(0, 1)
        v = v_buf[:].reshape(chunk_kv, Hkv, D).swapaxes(0, 1)

        q = q_ref[0].astype(jnp.float32) * scale          # [Hkv, G, D]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))),                 # contract D, batch Hkv
            preferred_element_type=jnp.float32)            # [Hkv, G, C]

        kv_pos = chunk_start + jax.lax.broadcasted_iota(jnp.int32, (Hkv, G, chunk_kv), 2)
        row = g * G + jax.lax.broadcasted_iota(jnp.int32, (Hkv, G, chunk_kv), 1)
        q_pos = q_start_ref[b] + row % num_q
        s = jnp.where(kv_pos <= q_pos, s, NEG_INF)

        m_prev = m_i[:, :, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)

        l_new = alpha * l_i[:, :, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc[:] = acc[:] * alpha + jax.lax.dot_general(
            p, v.astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),                 # contract C, batch Hkv
            preferred_element_type=jnp.float32)
        m_i[:] = jnp.broadcast_to(m_new, m_i.shape)
        l_i[:] = jnp.broadcast_to(l_new, l_i.shape)

    @pl.when(chunk == pl.num_programs(2) - 1)
    def _():
        denom = l_i[:, :, :1]
        denom = jnp.where(denom > 0, denom, 1.0)
        out_ref[0] = (acc[:] / denom).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "pages_per_chunk"))
def paged_attention_pallas(q: jnp.ndarray, k_pages: jnp.ndarray, v_pages: jnp.ndarray,
                           block_tables: jnp.ndarray, ctx_lens: jnp.ndarray,
                           scale: float, pages_per_chunk: int = 8,
                           q_positions: jnp.ndarray = None,
                           layer: jnp.ndarray = None) -> jnp.ndarray:
    """q: [B, Q, Hq, D]; k/v_pages: [L, P, S, Hkv, D] (whole stacked cache —
    the kernel indexes the scalar-prefetched layer, so the cache never flows
    through scan xs/ys); block_tables: [B, PPS].

    q_positions [B, Q] must be consecutive per row; only column 0 is used.
    """
    B, Q, Hq, D = q.shape
    L, P, S, Hkv, D2 = k_pages.shape
    if layer is None:
        layer = jnp.zeros((), jnp.int32)
    assert D == D2
    group = Hq // Hkv
    G = group * Q
    G_blk = 256 if G > 256 else round_up(max(G, 8), 8)
    G_pad = round_up(max(G, 8), G_blk)
    if q_positions is None:
        q_start = ctx_lens.astype(jnp.int32) - Q
    else:
        q_start = q_positions[:, 0].astype(jnp.int32)

    # [B, Q, Hq, D] -> [B, Hkv, group * Q, D] (Q minor within each group row)
    qr = q.reshape(B, Q, Hkv, group, D).transpose(0, 2, 3, 1, 4).reshape(B, Hkv, G, D)
    if G_pad != G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, G_pad - G), (0, 0)))

    max_pages = block_tables.shape[1]
    pages_pad = round_up(max_pages, pages_per_chunk)
    if pages_pad != max_pages:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pages_pad - max_pages)))
    num_chunks = pages_pad // pages_per_chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, G_pad // G_blk, num_chunks),
        in_specs=[
            pl.BlockSpec((1, Hkv, G_blk, D), lambda b, g, c, *_: (b, 0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, Hkv, G_blk, D), lambda b, g, c, *_: (b, 0, g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((pages_per_chunk, S, Hkv, D), k_pages.dtype),
            pltpu.VMEM((pages_per_chunk, S, Hkv, D), v_pages.dtype),
            pltpu.VMEM((Hkv, G_blk, 128), jnp.float32),
            pltpu.VMEM((Hkv, G_blk, 128), jnp.float32),
            pltpu.VMEM((Hkv, G_blk, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2, pages_per_chunk)),
        ],
    )

    kernel = functools.partial(
        _paged_attn_kernel,
        num_q=Q,
        pages_per_chunk=pages_per_chunk,
        page_size=S,
        max_pages=pages_pad,
        scale=scale,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G_pad, D), q.dtype),
        interpret=interpret_mode(),
    )(block_tables.reshape(-1), ctx_lens.astype(jnp.int32), q_start,
      jnp.reshape(layer, (1,)).astype(jnp.int32), qr, k_pages, v_pages)

    out = out[:, :, :G].reshape(B, Hkv, group, Q, D).transpose(0, 3, 1, 2, 4)
    return out.reshape(B, Q, Hq, D)
