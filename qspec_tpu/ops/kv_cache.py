"""Paged KV cache in TPU HBM.

TPU-native replacement for the reference's CacheEngine + reshape_and_cache
CUDA op (vllm/worker/cache_engine.py:15; csrc/cache_kernels.cu). The cache is
one jnp array per layer pair stacked into a single pytree:

    k_pages, v_pages : [num_layers, num_pages, num_kv_heads, page_size, head_dim]

Layout rationale (page-major, HEAD-major inside the page): one page still
holds every kv head's entries contiguously, so a paged-attention kernel
moves a page with ONE ~32 KB DMA — and because heads are the outer axis of
the page, the streamed pages land in VMEM already shaped [Hkv, S, D]. The
kernel's two contractions batch over Hkv on dim 0 of BOTH operands, which
Mosaic requires; with the older token-major page ([S, Hkv, D]) every chunk
needed an in-VMEM [C, Hkv, D] -> [Hkv, C, D] relayout that throttled decode
attention to ~190 GB/s. head_dim rides the 128-lane axis. Page 0 is
reserved as the null/padding page so block tables can be padded with 0.

Writes are functional: `update_layer` scatters the new tokens' K/V into
their slots and returns the new arrays (donated under jit, so in-place).

Optional int8 KV quantization (per entry-row scale) mirrors the reference's
kv_cache_dtype=int8 option and QServe's KV4/8.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class KVCacheConfig(NamedTuple):
    num_layers: int
    num_kv_heads: int
    head_dim: int
    num_pages: int
    page_size: int = 16
    dtype: str = "bfloat16"  # "bfloat16" | "int8"


class PagedKVCache(NamedTuple):
    """Pytree holding the paged cache (+ scales when int8)."""

    k_pages: jnp.ndarray  # [L, P, Hkv, page, D]
    v_pages: jnp.ndarray
    k_scales: Optional[jnp.ndarray] = None  # [L, P, Hkv, page, 1] f32 (int8 mode)
    v_scales: Optional[jnp.ndarray] = None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[1]

    @property
    def num_kv_heads(self) -> int:
        return self.k_pages.shape[2]


def allocate(cfg: KVCacheConfig) -> PagedKVCache:
    shape = (cfg.num_layers, cfg.num_pages, cfg.num_kv_heads, cfg.page_size,
             cfg.head_dim)
    if cfg.dtype == "int8":
        return PagedKVCache(
            k_pages=jnp.zeros(shape, jnp.int8),
            v_pages=jnp.zeros(shape, jnp.int8),
            k_scales=jnp.zeros(shape[:-1] + (1,), jnp.float32),
            v_scales=jnp.zeros(shape[:-1] + (1,), jnp.float32),
        )
    return PagedKVCache(jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16))


def kv_cache_bytes(cfg: KVCacheConfig) -> int:
    per = 1 if cfg.dtype == "int8" else 2
    base = 2 * cfg.num_layers * cfg.num_pages * cfg.page_size * cfg.num_kv_heads * cfg.head_dim * per
    if cfg.dtype == "int8":
        base += 2 * cfg.num_layers * cfg.num_pages * cfg.page_size * cfg.num_kv_heads * 4
    return base


def update_layer(cache: PagedKVCache, layer, k_new: jnp.ndarray, v_new: jnp.ndarray,
                 slot_mapping: jnp.ndarray) -> PagedKVCache:
    """Scatter new tokens into one layer's pages.

    k_new/v_new: [T, Hkv, D]; slot_mapping: [T] int32 flat slot =
    page_id * page_size + offset. Padding tokens must map to slot 0 (the
    reserved null page). With the head-major page layout one token's write
    is Hkv rows of [D] (row h lands at page*Hkv*S + h*S + offset).

    ``layer`` may be a traced scalar: the scatter addresses the cache as one
    flat [L*P*Hkv*S, D] array with a layer offset, so the whole cache can be
    a scan *carry* (aliased in place) instead of scan xs/ys — the xs/ys form
    made XLA double-buffer the entire cache every layer (~GBs copied per
    decode step).
    """
    L, P, H, S, D = cache.k_pages.shape
    k_flat = cache.k_pages.reshape(L * P * H * S, D)
    v_flat = cache.v_pages.reshape(L * P * H * S, D)
    page = slot_mapping // S
    off = slot_mapping % S
    # [T, H] row index per (token, head)
    rows = (layer * (P * H * S) + page[:, None] * (H * S)
            + jnp.arange(H, dtype=slot_mapping.dtype)[None, :] * S + off[:, None])
    rows = rows.reshape(-1)  # padding tokens (slot 0) land inside the null page

    if cache.k_scales is not None:
        k_abs = jnp.max(jnp.abs(k_new.astype(jnp.float32)), axis=-1, keepdims=True)
        v_abs = jnp.max(jnp.abs(v_new.astype(jnp.float32)), axis=-1, keepdims=True)
        k_s = jnp.maximum(k_abs, 1e-8) / 127.0
        v_s = jnp.maximum(v_abs, 1e-8) / 127.0
        k_q = jnp.clip(jnp.round(k_new.astype(jnp.float32) / k_s), -128, 127).astype(jnp.int8)
        v_q = jnp.clip(jnp.round(v_new.astype(jnp.float32) / v_s), -128, 127).astype(jnp.int8)
        k_flat = k_flat.at[rows].set(k_q.reshape(-1, D), mode="drop")
        v_flat = v_flat.at[rows].set(v_q.reshape(-1, D), mode="drop")
        ks_flat = cache.k_scales.reshape(L * P * H * S, 1)
        vs_flat = cache.v_scales.reshape(L * P * H * S, 1)
        ks_flat = ks_flat.at[rows].set(k_s.reshape(-1, 1), mode="drop")
        vs_flat = vs_flat.at[rows].set(v_s.reshape(-1, 1), mode="drop")
        return cache._replace(
            k_pages=k_flat.reshape(L, P, H, S, D),
            v_pages=v_flat.reshape(L, P, H, S, D),
            k_scales=ks_flat.reshape(L, P, H, S, 1),
            v_scales=vs_flat.reshape(L, P, H, S, 1),
        )

    dtype = cache.k_pages.dtype
    k_flat = k_flat.at[rows].set(k_new.astype(dtype).reshape(-1, D), mode="drop")
    v_flat = v_flat.at[rows].set(v_new.astype(dtype).reshape(-1, D), mode="drop")
    return cache._replace(
        k_pages=k_flat.reshape(L, P, H, S, D),
        v_pages=v_flat.reshape(L, P, H, S, D),
    )


def gather_layer(cache: PagedKVCache, layer: int, block_tables: jnp.ndarray):
    """Dense view of one layer's KV for a batch (reference-path attention).

    block_tables: [B, pages_per_seq] int32. Returns (k, v) as
    [B, Hkv, pages_per_seq * page_size, D] bf16 (dequantized if int8).
    """
    k = cache.k_pages[layer][block_tables]  # [B, P, H, S, D] (layer may be traced)
    v = cache.v_pages[layer][block_tables]
    B, P, H, S, D = k.shape
    k = k.transpose(0, 2, 1, 3, 4).reshape(B, H, P * S, D)
    v = v.transpose(0, 2, 1, 3, 4).reshape(B, H, P * S, D)
    if cache.k_scales is not None:
        ks = cache.k_scales[layer][block_tables].transpose(0, 2, 1, 3, 4).reshape(B, H, P * S, 1)
        vs = cache.v_scales[layer][block_tables].transpose(0, 2, 1, 3, 4).reshape(B, H, P * S, 1)
        k = (k.astype(jnp.float32) * ks).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * vs).astype(jnp.bfloat16)
    return k, v
