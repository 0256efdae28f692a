"""Attention over the paged KV cache.

TPU-native replacement for the reference's attention subsystem
(vllm/attention/backends/flash_attn.py, csrc/attention/paged_attention_v*.cu,
and the MQA scorer concept in vllm/spec_decode/mqa_scorer.py:10). One
*chunked* formulation serves all three phases with static shapes:

* decode:  Q = 1 new token per sequence
* verify:  Q = k + 1 speculative positions per sequence (the MQA-style
           scorer — all positions scored in one pass over the cache)
* prefill: Q = chunk of the prompt (chunked prefill)

``paged_attention`` is the semantic reference (gather pages -> dense masked
attention); `paged_attention_kernel` is the Pallas flash-style kernel used on
TPU (see attention_pallas.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qspec_tpu.ops.kv_cache import PagedKVCache, gather_layer

NEG_INF = -1e30


def alibi_slopes(n_heads: int):
    """Per-head ALiBi slopes (the closed form the reference replicates in
    every ALiBi family: vllm/model_executor/models/bloom.py:49
    _get_alibi_slopes; "Train Short, Test Long", Press et al. 2022).

    For n a power of two: slopes are the geometric sequence starting at
    2^(-8/n) with that same ratio. Otherwise the power-of-two sequence below
    n is interleaved with the start of the 2*floor-sequence's odd elements.
    Returns a float32 numpy array [n_heads].
    """
    import math

    import numpy as np

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        out = pow2_slopes(n_heads)
    else:
        base = 2 ** math.floor(math.log2(n_heads))
        out = pow2_slopes(base)
        out += pow2_slopes(2 * base)[0::2][: n_heads - base]
    return np.asarray(out, np.float32)


def tree_slot_mask(prefix: int, num_q: int, q_start, ancestors,
                   C: int):
    """[B, num_q, C] live mask for a tree-verify rectangle, in SLOT space.

    Queries 0..prefix-1 are normal consecutive positions (the KV-rewrite
    prefix ending at the root); queries prefix..num_q-1 are tree nodes
    stored at slots root+1+node. A tree query attends every committed slot
    (<= root) plus its tree ANCESTORS only — the Medusa tree-structured
    causal mask (reference medusa tree attention; vllm scores candidate
    continuations per head rather than a single chain).

    q_start [B]: slot of query row 0 (= root_slot - prefix + 1).
    ancestors: static [T, T] bool, ancestors[i][j] = node j is
    ancestor-of-or-equal-to node i.
    """
    T = num_q - prefix
    anc = jnp.asarray(ancestors, bool)                        # [T, T]
    kv = jnp.arange(C)[None, None, :]                         # [1, 1, C]
    rows = jnp.arange(num_q)[None, :, None]                   # [1, Q, 1]
    root = (q_start + prefix - 1)[:, None, None]              # [B, 1, 1]
    q_slot = jnp.where(rows < prefix,
                       q_start[:, None, None] + rows,
                       root)                                   # causal bound
    causal = kv <= q_slot
    node = jnp.clip(rows - prefix, 0, max(T - 1, 0))
    kv_node = kv - root - 1                                    # [B, 1, C]
    in_tree = (kv_node >= 0) & (kv_node < T)
    anc_bit = anc[node[0, :, 0]][None]                         # [1, Q, T]
    tree_live = jnp.zeros(causal.shape, bool)
    for t in range(T):
        tree_live |= (kv_node == t) & anc_bit[:, :, t:t + 1]
    tree_live &= (rows >= prefix) & in_tree
    return causal | tree_live


def paged_attention_ref(q: jnp.ndarray, cache: PagedKVCache, layer: int,
                        block_tables: jnp.ndarray, ctx_lens: jnp.ndarray,
                        scale: float, q_positions: jnp.ndarray = None,
                        window=None, softcap: float = None,
                        alibi: jnp.ndarray = None,
                        tree=None) -> jnp.ndarray:
    """q: [B, Q, Hq, D]; ctx_lens[b] counts tokens *including* the new ones.

    ``q_positions`` [B, Q] gives each query's absolute position; query i
    attends to kv positions <= its own. When omitted, queries are assumed to
    be the *last* Q positions (decode/verify windows) — end-padded prefill
    MUST pass explicit positions or padding queries corrupt the mask.
    ``window`` limits attention to the last `window` positions (Mistral
    sliding window, reference quarot_llama.py:125-136); it may be a traced
    scalar (gemma2 per-layer alternation). ``softcap``: gemma2
    attention-logit tanh cap. ``alibi``: [Hq] per-head ALiBi slopes —
    adds slope * (kv_pos - q_pos) to the scores pre-softmax (BLOOM / MPT /
    JAIS / Baichuan-13B / Falcon-alibi; reference
    vllm/attention/backends/flash_attn.py:603-619 alibi bias build).
    """
    B, Q, Hq, D = q.shape
    if q_positions is None:
        q_positions = (ctx_lens[:, None] - Q) + jnp.arange(Q)[None, :]
    k, v = gather_layer(cache, layer, block_tables)  # [B, Hkv, C, D]
    Hkv = k.shape[1]
    group = Hq // Hkv

    qf = q.astype(jnp.float32) * scale
    qf = qf.reshape(B, Q, Hkv, group, D)
    scores = jnp.einsum("bqhgd,bhcd->bhgqc", qf, k.astype(jnp.float32))
    if softcap is not None:
        scores = jnp.tanh(scores / softcap) * softcap

    C = k.shape[2]
    kv_pos = jnp.arange(C)[None, :]                       # [1, C]
    if alibi is not None:
        # delta <= 0 in the causal region; masked positions are overwritten
        # with NEG_INF below regardless
        delta = (kv_pos[None].astype(jnp.float32)
                 - q_positions[:, :, None].astype(jnp.float32))  # [B, Q, C]
        sl = jnp.asarray(alibi, jnp.float32).reshape(Hkv, group)
        scores = scores + (sl[None, :, :, None, None]
                           * delta[:, None, None, :, :])
    if tree is not None:
        # Medusa tree verify: mask in SLOT space (row 0 is a prefix row
        # whose slot equals its position); window/alibi are rejected
        # upstream in tree mode
        prefix, ancestors = tree
        mask = tree_slot_mask(prefix, Q, q_positions[:, 0], ancestors, C)
    else:
        mask = kv_pos[None] <= q_positions[:, :, None]        # [B, Q, C]
        if window is not None:
            mask = mask & (kv_pos[None] > q_positions[:, :, None] - window)
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqc,bhcd->bqhgd", probs, v.astype(jnp.float32))
    return out.reshape(B, Q, Hq, D).astype(q.dtype)


def prefill_attention_ref(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: float, valid_len: jnp.ndarray | None = None,
                          window: int = None) -> jnp.ndarray:
    """Dense causal self-attention for one padded sequence.

    q: [T, Hq, D], k/v: [T, Hkv, D]. valid_len masks padding tokens.
    """
    T, Hq, D = q.shape
    Hkv = k.shape[1]
    group = Hq // Hkv
    qf = (q.astype(jnp.float32) * scale).reshape(T, Hkv, group, D)
    scores = jnp.einsum("qhgd,chd->hgqc", qf, k.astype(jnp.float32))
    causal = jnp.arange(T)[None, :] <= jnp.arange(T)[:, None]
    if window is not None:
        causal = causal & (jnp.arange(T)[None, :]
                           > jnp.arange(T)[:, None] - window)
    if valid_len is not None:
        causal = causal & (jnp.arange(T)[None, :] < valid_len)
    scores = jnp.where(causal[None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgqc,chd->qhgd", probs, v.astype(jnp.float32))
    return out.reshape(T, Hq, D).astype(q.dtype)


def paged_attention(q: jnp.ndarray, cache: PagedKVCache, layer: int,
                    block_tables: jnp.ndarray, ctx_lens: jnp.ndarray,
                    scale: float, q_positions: jnp.ndarray = None,
                    window=None, softcap: float = None,
                    alibi: jnp.ndarray = None, tree=None) -> jnp.ndarray:
    """Dispatch to the Pallas kernel on TPU, reference path elsewhere."""
    from qspec_tpu.ops._kernel_utils import backend_is_tpu
    head_dim = q.shape[-1]
    cache_dim = cache.kv_pages.shape[-1]
    if cache_dim != head_dim:
        # small head dims (64/80/96: GPT-2/GPT-J/Phi/StableLM) are stored
        # 128-lane padded (ModelConfig.cache_head_dim): the Pallas kernel
        # DMAs page slices out of HBM and Mosaic requires lane-tile-aligned
        # slices, so the CACHE carries the padding, q pads here, and the
        # output slices back. Zero lanes are inert in QK dots and V sums.
        # The reference's CUDA kernel instead dispatches per head size
        # (csrc/attention/attention_kernels.cuh).
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, cache_dim - head_dim)))
    if backend_is_tpu() and cache_dim % 128 == 0:
        from qspec_tpu.ops.attention_pallas import paged_attention_pallas
        out = paged_attention_pallas(q, cache.kv_pages,
                                     block_tables, ctx_lens, scale,
                                     q_positions=q_positions,
                                     layer=jnp.asarray(layer, jnp.int32),
                                     kv_scales=cache.kv_scales,
                                     window=window, softcap=softcap,
                                     alibi=alibi, tree=tree)
    else:
        out = paged_attention_ref(q, cache, layer, block_tables, ctx_lens,
                                  scale, q_positions=q_positions,
                                  window=window, softcap=softcap,
                                  alibi=alibi, tree=tree)
    return out[..., :head_dim] if cache_dim != head_dim else out
