"""Pallas flash paged-attention kernel (decode / verify / chunked prefill).

TPU-native replacement for the reference's paged-attention CUDA kernels
(csrc/attention/paged_attention_v{1,2}.cu) and the FlashAttention decode path
(vllm/attention/backends/flash_attn.py). One kernel covers all query widths:
Q=1 decode, Q=k+1 speculative verify (the MQA scorer,
vllm/spec_decode/mqa_scorer.py:10), and prompt chunks.

Structure: grid (batch, q_block); the kv-page loop lives INSIDE the kernel
with a two-deep double-buffered DMA pipeline — page c+1 streams from HBM
while page c is being scored. (A grid-dim chunk axis with
issue->wait->compute per program serialized every DMA behind its compute.)
Pages live in HBM K/V-interleaved and head-major ([P, 2, Hkv, S, D], see
kv_cache.py); ONE contiguous DMA per page covers K and V for every kv head
and lands as a [2, Hkv, S, D] buffer whose leading-index slices are exactly
the shapes both flash contractions need — NO in-VMEM relayout. (The older
token-major page layout needed a [C, Hkv, D] -> [Hkv, C, D] transpose per
chunk that capped the kernel at ~190 GB/s; Mosaic batches matmuls only over
dim 0 of both operands. A leading-dim destination slice is also the only DMA
form Mosaic executes — dst.at[slot, :, i] compiled but killed the chip.)
One page per chunk makes big pages (64-128 tokens) the fast configuration:
fewer, larger DMAs. The loop trip count is the sequence's live page count,
so padded tail pages are never read.

int8 KV (kv_cache_dtype=int8, reference csrc/cache_kernels.cu fp8-KV path /
QServe KV8): pages are streamed as int8 (half the bytes) plus a small
per-(k/v, head, token) scale page. The scales fold into SCORE space, not
into an elementwise dequant of the [Hkv, S, D] buffers: K's scale multiplies
the QK^T scores ([Hkv, G, C] — C*G ops instead of C*D), and V's scale
multiplies the probabilities before the PV contraction. Only the raw
int8->bf16 convert touches the full page.

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
    layer_ref,          # [2] int32: (layer index into the stacked cache,
                        #  sliding window — NO_WINDOW sentinel disables it;
                        #  traced so gemma2's per-layer alternation works
                        #  inside the layer scan)
    # inputs
    q_ref,              # [1, Hkv, G, D] VMEM
    kv_pages_ref,       # [L, P, 2, Hkv, S, D] HBM
    # outputs / scratch (kv_scales_ref inserted before out_ref when int8)
    *refs,
    num_q: int,
    page_size: int,
    max_pages: int,
    scale: float,
    quant: bool,
    softcap: float,
    alibi: bool,
    tree,
):
    refs = list(refs)
    kv_scales_ref = refs.pop(0) if quant else None
    # [Hkv, G_blk] f32 per-ROW ALiBi slope (the slope of the query head
    # owning that grouped-query row); precomputed in the wrapper
    slopes_ref = refs.pop(0) if alibi else None
    # [G_blk, T_pad] f32 per-ROW tree-ancestor bits (Medusa tree verify;
    # see ops/attention.tree_slot_mask) — prefix rows carry all-zeros
    anc_ref = refs.pop(0) if tree is not None else None
    if quant:
        out_ref, kv_buf, sc_buf, acc, sems, sc_sems = refs
    else:
        out_ref, kv_buf, acc, sems = refs
    b = pl.program_id(0)
    g = pl.program_id(1)
    ctx_len = ctx_lens_ref[b]
    chunk_kv = page_size
    num_chunks = jnp.maximum(1, pl.cdiv(ctx_len, chunk_kv))
    window = layer_ref[1]
    # sliding window: pages strictly before the earliest in-window position
    # of the row's first query are never read (decode touches only
    # ~window/page_size pages however long the context); with the
    # NO_WINDOW sentinel the clip lands on 0
    first_chunk = jnp.clip((q_start_ref[b] - window + 1) // chunk_kv,
                           0, num_chunks - 1)

    Hkv, G, D = acc.shape  # G = this query block's rows
    layer = layer_ref[0]

    def dma(slot, chunk):
        page_id = block_tables_ref[b * max_pages + chunk]
        return pltpu.make_async_copy(kv_pages_ref.at[layer, page_id],
                                     kv_buf.at[slot], sems.at[slot])

    def dma_scales(slot, chunk):
        page_id = block_tables_ref[b * max_pages + chunk]
        return pltpu.make_async_copy(kv_scales_ref.at[layer, page_id],
                                     sc_buf.at[slot], sc_sems.at[slot])

    def issue(slot, chunk):
        dma(slot, chunk).start()
        if quant:
            dma_scales(slot, chunk).start()

    def wait(slot, chunk):
        dma(slot, chunk).wait()
        if quant:
            dma_scales(slot, chunk).wait()

    issue(jax.lax.rem(first_chunk, 2), first_chunk)

    # bf16 q with the softmax scale folded in: the MXU contracts bf16 natively
    # (an f32 q forced multi-pass f32 matmuls AND an f32 relayout of k/v that
    # throttled the whole kernel to ~190 GB/s).
    q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)  # [Hkv, G, D]
    row = g * G + jax.lax.broadcasted_iota(jnp.int32, (Hkv, G, chunk_kv), 1)
    q_pos = q_start_ref[b] + row % num_q
    if tree is not None:
        # Medusa tree verify (slot-space mask, ops/attention.tree_slot_mask):
        # rows past `prefix` are tree nodes at slots root+1+node; they see
        # the committed context (<= root) plus their ancestor bits below
        t_prefix, t_T = tree
        root_slot = q_start_ref[b] + t_prefix - 1
        node_row = row % num_q - t_prefix
        is_tree_row = node_row >= 0
        q_eff = jnp.where(is_tree_row, root_slot, q_pos)
    else:
        q_eff = q_pos

    def body(c, carry):
        m_prev, l_prev = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            issue(1 - slot, c + 1)

        wait(slot, c)

        # [Hkv, S, D]: interleaved head-major pages arrive in exactly the
        # shape needed; leading-index slices are free.
        k = kv_buf[slot, 0]
        v = kv_buf[slot, 1]
        if k.dtype != jnp.bfloat16:
            # int8: integer-valued bf16, per-token scales fold in below;
            # fp8_e5m2: this astype IS the (scale-free) dequant;
            # fp8_e4m3: cast + the same scale fold as int8
            k = k.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)

        s = jax.lax.dot_general(
            q, k,
            (((2,), (2,)), ((0,), (0,))),                 # contract D, batch Hkv
            preferred_element_type=jnp.float32)            # [Hkv, G, C]
        if quant:
            # per-(head, token) K scale folds into score space
            s = s * sc_buf[slot, 0][:, None, :]

        kv_pos = c * chunk_kv + jax.lax.broadcasted_iota(
            jnp.int32, (Hkv, G, chunk_kv), 2)

        if alibi:
            # ALiBi positional bias: slope * (kv_pos - q_pos) added to the
            # scores pre-softmax (reference bloom.py:49 _get_alibi_slopes;
            # flash_attn.py:603-619 bias build). delta <= 0 causally;
            # out-of-range positions are NEG_INF-masked below anyway.
            s = s + (slopes_ref[...][:, :, None]
                     * (kv_pos - q_pos).astype(jnp.float32))

        if softcap is not None:
            # gemma2 attention-logit softcapping: cap * tanh(s / cap)
            # (reference gemma2.py attn_logit_softcapping)
            s = jnp.tanh(s * (1.0 / softcap)) * softcap
        live = (kv_pos <= q_eff) & (kv_pos > q_eff - window)
        if tree is not None:
            anc = anc_ref[...]                          # [G_blk, T_pad]
            tl = jnp.zeros(live.shape, bool)
            for t in range(t_T):                        # static, T <= ~16
                tl |= ((kv_pos == root_slot + 1 + t)
                       & (anc[:, t] > 0.5)[None, :, None])
            live |= tl & is_tree_row
        s = jnp.where(live, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)

        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        if quant:
            # V's per-token scale multiplies the probabilities (C*G ops)
            # instead of dequantizing the [Hkv, S, D] buffer (C*D ops)
            pv = (p * sc_buf[slot, 1][:, None, :]).astype(jnp.bfloat16)
        else:
            pv = p.astype(jnp.bfloat16)
        acc[:] = acc[:] * alpha + jax.lax.dot_general(
            pv, v,
            (((2,), (1,)), ((0,), (0,))),                 # contract C, batch Hkv
            preferred_element_type=jnp.float32)
        return m_new, l_new

    acc[:] = jnp.zeros_like(acc)
    m0 = jnp.full((Hkv, G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hkv, G, 1), jnp.float32)
    _, l_fin = jax.lax.fori_loop(first_chunk, num_chunks, body, (m0, l0))

    denom = jnp.where(l_fin > 0, l_fin, 1.0)
    out_ref[0] = (acc[:] / denom).astype(out_ref.dtype)


NO_WINDOW = 1 << 30   # sliding-window sentinel (far past any position)


@functools.partial(jax.jit,
                   static_argnames=("scale", "pages_per_chunk", "softcap",
                                    "tree"))
def paged_attention_pallas(q: jnp.ndarray, kv_pages: jnp.ndarray,
                           block_tables: jnp.ndarray, ctx_lens: jnp.ndarray,
                           scale: float, pages_per_chunk: int = 1,
                           q_positions: jnp.ndarray = None,
                           layer: jnp.ndarray = None,
                           kv_scales: jnp.ndarray = None,
                           window=None, softcap: float = None,
                           alibi: jnp.ndarray = None,
                           tree=None) -> jnp.ndarray:
    """q: [B, Q, Hq, D]; kv_pages: [L, P, 2, Hkv, S, D] (whole stacked cache —
    the kernel indexes the scalar-prefetched layer, so the cache never flows
    through scan xs/ys); block_tables: [B, PPS]; kv_scales
    [L, P, 2, Hkv, S] when the cache is int8.

    q_positions [B, Q] must be consecutive per row; only column 0 is used.
    ``window`` may be a Python int, None, or a TRACED scalar (gemma2's
    per-layer sliding/global alternation rides the layer scan);
    ``softcap`` is the gemma2 attention-logit tanh cap (static).
    """
    B, Q, Hq, D = q.shape
    L, P, _, Hkv, S, D2 = kv_pages.shape
    if layer is None:
        layer = jnp.zeros((), jnp.int32)
    assert D == D2
    quant = kv_scales is not None
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
    win = jnp.asarray(NO_WINDOW if window is None else window, jnp.int32)

    in_specs = [
        pl.BlockSpec((1, Hkv, G_blk, D), lambda b, g, *_: (b, 0, g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    scratch = [pltpu.VMEM((2, 2, Hkv, S, D), kv_pages.dtype)]
    inputs = [block_tables.reshape(-1), ctx_lens.astype(jnp.int32), q_start,
              jnp.stack([jnp.reshape(layer, ()).astype(jnp.int32), win]),
              qr, kv_pages]
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        scratch.append(pltpu.VMEM((2, 2, Hkv, S), jnp.float32))
        inputs.append(kv_scales)
    if alibi is not None:
        # per-ROW slope (the query head owning grouped-query row r is
        # hkv*group + r // Q); padded rows clamp to the last group
        gi = jnp.minimum(jnp.arange(G_pad, dtype=jnp.int32) // Q, group - 1)
        slope_rows = jnp.asarray(alibi, jnp.float32).reshape(Hkv, group)[:, gi]
        in_specs.append(pl.BlockSpec((Hkv, G_blk), lambda b, g, *_: (0, g),
                                     memory_space=pltpu.VMEM))
        inputs.append(slope_rows)
    tree_static = None
    if tree is not None:
        # Medusa tree verify: per-ROW ancestor bits for the tree queries
        # (rows whose q index >= prefix); prefix and padded rows carry
        # zeros. Static part = (prefix, T); the [G_pad, T_pad] bit plane
        # rides VMEM like the alibi slopes.
        t_prefix, ancestors = tree
        anc_np = jnp.asarray(ancestors, jnp.float32)          # [T, T]
        T_tree = anc_np.shape[0]
        tree_static = (t_prefix, T_tree)
        import numpy as _np
        qi = _np.arange(G_pad, dtype=_np.int32) % Q           # q index per row
        node = qi - t_prefix
        T_pad = max(128, round_up(T_tree, 128))
        rows_anc = _np.zeros((G_pad, T_pad), _np.float32)
        valid = (node >= 0) & (node < T_tree) & (qi < Q)
        anc_host = _np.asarray(ancestors, _np.float32)
        rows_anc[valid, :T_tree] = anc_host[node[valid]]
        in_specs.append(pl.BlockSpec((G_blk, T_pad), lambda b, g, *_: (g, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(rows_anc))
    scratch.append(pltpu.VMEM((Hkv, G_blk, D), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, G_pad // G_blk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, G_blk, D), lambda b, g, *_: (b, 0, g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    kernel = functools.partial(
        _paged_attn_kernel,
        num_q=Q,
        page_size=S,
        max_pages=max_pages,
        scale=scale,
        quant=quant,
        softcap=softcap,
        alibi=alibi is not None,
        tree=tree_static,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G_pad, D), q.dtype),
        interpret=interpret_mode(),
    )(*inputs)

    out = out[:, :, :G].reshape(B, Hkv, group, Q, D).transpose(0, 3, 1, 2, 4)
    return out.reshape(B, Q, Hq, D)
