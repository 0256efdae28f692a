"""Paged KV cache in TPU HBM.

TPU-native replacement for the reference's CacheEngine + reshape_and_cache
CUDA op (vllm/worker/cache_engine.py:15; csrc/cache_kernels.cu). The cache is
one jnp array per layer pair stacked into a single pytree:

    k_pages, v_pages : [num_layers, num_kv_heads, num_pages, page_size, head_dim]

Layout rationale: head_dim rides the 128-lane axis; (page_size, head_dim) is
the contiguous unit a paged-attention kernel DMAs per page; kv_head leads so
a grid over heads streams contiguous HBM. Page 0 is reserved as the null/
padding page so block tables can be padded with 0 safely.

Writes are functional: `update` scatters the new tokens' K/V into their slots
and returns the new arrays (donated under jit, so in-place on TPU).

Optional int8 KV quantization (per page-entry scale) mirrors the reference's
kv_cache_dtype=int8 option (vllm/attention — kv quant) and QServe's KV4/8.
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

    k_pages: jnp.ndarray  # [L, Hkv, P, page, D]
    v_pages: jnp.ndarray
    k_scales: Optional[jnp.ndarray] = None  # [L, Hkv, P, page, 1] f32 (int8 mode)
    v_scales: Optional[jnp.ndarray] = None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[2]


def allocate(cfg: KVCacheConfig) -> PagedKVCache:
    shape = (cfg.num_layers, cfg.num_kv_heads, cfg.num_pages, cfg.page_size, cfg.head_dim)
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
    base = 2 * cfg.num_layers * cfg.num_kv_heads * cfg.num_pages * cfg.page_size * cfg.head_dim * per
    if cfg.dtype == "int8":
        base += 2 * cfg.num_layers * cfg.num_kv_heads * cfg.num_pages * cfg.page_size * 4
    return base


def update_layer(cache: PagedKVCache, layer: int, k_new: jnp.ndarray, v_new: jnp.ndarray,
                 slot_mapping: jnp.ndarray) -> PagedKVCache:
    """Scatter new tokens into one layer's pages.

    k_new/v_new: [T, Hkv, D]; slot_mapping: [T] int32 flat slot =
    page_id * page_size + offset. Padding tokens must map to slot 0 (the
    reserved null page).
    """
    L, H, P, S, D = cache.k_pages.shape
    k_flat = cache.k_pages[layer].reshape(H, P * S, D)
    v_flat = cache.v_pages[layer].reshape(H, P * S, D)

    if cache.k_scales is not None:
        k_abs = jnp.max(jnp.abs(k_new.astype(jnp.float32)), axis=-1, keepdims=True)
        v_abs = jnp.max(jnp.abs(v_new.astype(jnp.float32)), axis=-1, keepdims=True)
        k_s = jnp.maximum(k_abs, 1e-8) / 127.0
        v_s = jnp.maximum(v_abs, 1e-8) / 127.0
        k_q = jnp.clip(jnp.round(k_new.astype(jnp.float32) / k_s), -128, 127).astype(jnp.int8)
        v_q = jnp.clip(jnp.round(v_new.astype(jnp.float32) / v_s), -128, 127).astype(jnp.int8)
        k_flat = k_flat.at[:, slot_mapping].set(k_q.transpose(1, 0, 2), mode="drop")
        v_flat = v_flat.at[:, slot_mapping].set(v_q.transpose(1, 0, 2), mode="drop")
        ks_flat = cache.k_scales[layer].reshape(H, P * S, 1)
        vs_flat = cache.v_scales[layer].reshape(H, P * S, 1)
        ks_flat = ks_flat.at[:, slot_mapping].set(k_s.transpose(1, 0, 2), mode="drop")
        vs_flat = vs_flat.at[:, slot_mapping].set(v_s.transpose(1, 0, 2), mode="drop")
        return cache._replace(
            k_pages=cache.k_pages.at[layer].set(k_flat.reshape(H, P, S, D)),
            v_pages=cache.v_pages.at[layer].set(v_flat.reshape(H, P, S, D)),
            k_scales=cache.k_scales.at[layer].set(ks_flat.reshape(H, P, S, 1)),
            v_scales=cache.v_scales.at[layer].set(vs_flat.reshape(H, P, S, 1)),
        )

    dtype = cache.k_pages.dtype
    k_flat = k_flat.at[:, slot_mapping].set(k_new.astype(dtype).transpose(1, 0, 2), mode="drop")
    v_flat = v_flat.at[:, slot_mapping].set(v_new.astype(dtype).transpose(1, 0, 2), mode="drop")
    return cache._replace(
        k_pages=cache.k_pages.at[layer].set(k_flat.reshape(H, P, S, D)),
        v_pages=cache.v_pages.at[layer].set(v_flat.reshape(H, P, S, D)),
    )


def gather_layer(cache: PagedKVCache, layer: int, block_tables: jnp.ndarray):
    """Dense view of one layer's KV for a batch (reference-path attention).

    block_tables: [B, pages_per_seq] int32. Returns (k, v) as
    [B, Hkv, pages_per_seq * page_size, D] bf16 (dequantized if int8).
    """
    k = jnp.take(cache.k_pages[layer], block_tables, axis=1)  # [H, B, P, S, D]
    v = jnp.take(cache.v_pages[layer], block_tables, axis=1)
    H, B, P, S, D = k.shape
    k = k.transpose(1, 0, 2, 3, 4).reshape(B, H, P * S, D)
    v = v.transpose(1, 0, 2, 3, 4).reshape(B, H, P * S, D)
    if cache.k_scales is not None:
        ks = jnp.take(cache.k_scales[layer], block_tables, axis=1)
        vs = jnp.take(cache.v_scales[layer], block_tables, axis=1)
        ks = ks.transpose(1, 0, 2, 3, 4).reshape(B, H, P * S, 1)
        vs = vs.transpose(1, 0, 2, 3, 4).reshape(B, H, P * S, 1)
        k = (k.astype(jnp.float32) * ks).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * vs).astype(jnp.bfloat16)
    return k, v
