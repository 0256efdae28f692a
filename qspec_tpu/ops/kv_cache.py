"""Paged KV cache in TPU HBM.

TPU-native replacement for the reference's CacheEngine + reshape_and_cache
CUDA op (vllm/worker/cache_engine.py:15; csrc/cache_kernels.cu). The cache is
ONE jnp array for all layers:

    kv_pages : [num_layers, num_pages, 2, num_kv_heads, page_size, head_dim]

with K at index 0 and V at index 1 of the third axis.

Layout rationale (page-major, K/V-interleaved, HEAD-major inside the page):
one page holds K and V for every kv head contiguously, so the paged-attention
kernel moves a page's K *and* V with ONE ~512 KB DMA (at 128-token pages) —
halving the DMA count vs separate k/v arrays — and the streamed page lands in
VMEM already shaped [2, Hkv, S, D]: leading-index slices give the [Hkv, S, D]
buffers both flash contractions need with NO in-VMEM relayout. (The kernel's
matmuls batch over Hkv on dim 0 of both operands, which Mosaic requires; a
token-major page needed a transpose per chunk that capped decode attention at
~190 GB/s.) head_dim rides the 128-lane axis. Page 0 is reserved as the
null/padding page so block tables can be padded with 0.

Writes are functional: `update_layer` scatters the new tokens' K/V into
their slots with a single combined scatter and returns the new array
(donated under jit, so in-place).

Optional 8-bit KV quantization mirrors the reference's kv_cache_dtype
options (csrc/cache_kernels.cu int8/fp8 conversion paths; QServe KV8):

- "int8":     per-(k/v, head, token) f32 scale (kv_scales [L, P, 2, Hkv, S]);
              the Pallas kernel streams int8 pages + scales and folds the
              scales into SCORE space (see attention_pallas.py).
- "fp8_e4m3": same per-token scale plumbing, values stored as
              float8_e4m3fn (q = x / (absmax/448)) — fp8's non-uniform grid
              beats int8 near zero at the same byte cost.
- "fp8_e5m2": scale-FREE direct cast (the reference's fp8_e5m2 default,
              kv_cache_dtype="fp8"): half the bytes of bf16, no scale
              arrays, dequant is one astype inside the kernel. e5m2 is
              bf16-truncated so the cast is exact in exponent range.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

KV_DTYPES = ("bfloat16", "int8", "fp8_e4m3", "fp8_e5m2")


def kv_entry_dtype(dtype: str):
    return {"bfloat16": jnp.bfloat16, "int8": jnp.int8,
            "fp8_e4m3": jnp.float8_e4m3fn,
            "fp8_e5m2": jnp.float8_e5m2}[dtype]


def kv_entry_bytes(dtype: str) -> int:
    return 2 if dtype == "bfloat16" else 1


def kv_has_scales(dtype: str) -> bool:
    return dtype in ("int8", "fp8_e4m3")


class KVCacheConfig(NamedTuple):
    num_layers: int
    num_kv_heads: int
    head_dim: int
    num_pages: int
    page_size: int = 16
    dtype: str = "bfloat16"  # one of KV_DTYPES


class PagedKVCache(NamedTuple):
    """Pytree holding the paged cache (+ scales when int8)."""

    kv_pages: jnp.ndarray  # [L, P, 2, Hkv, page, D]; [.., 0, ..]=K, 1=V
    kv_scales: Optional[jnp.ndarray] = None  # [L, P, 2, Hkv, page] f32 (int8)

    @property
    def page_size(self) -> int:
        return self.kv_pages.shape[4]

    @property
    def num_pages(self) -> int:
        return self.kv_pages.shape[1]

    @property
    def num_layers(self) -> int:
        return self.kv_pages.shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.kv_pages.shape[3]


def allocate(cfg: KVCacheConfig) -> PagedKVCache:
    shape = (cfg.num_layers, cfg.num_pages, 2, cfg.num_kv_heads, cfg.page_size,
             cfg.head_dim)
    pages = jnp.zeros(shape, kv_entry_dtype(cfg.dtype))
    if kv_has_scales(cfg.dtype):
        return PagedKVCache(kv_pages=pages,
                            kv_scales=jnp.zeros(shape[:-1], jnp.float32))
    return PagedKVCache(pages)


def kv_cache_bytes(cfg: KVCacheConfig) -> int:
    per = kv_entry_bytes(cfg.dtype)
    base = 2 * cfg.num_layers * cfg.num_pages * cfg.page_size * cfg.num_kv_heads * cfg.head_dim * per
    if kv_has_scales(cfg.dtype):
        base += 2 * cfg.num_layers * cfg.num_pages * cfg.page_size * cfg.num_kv_heads * 4
    return base


def update_layer(cache: PagedKVCache, layer, k_new: jnp.ndarray, v_new: jnp.ndarray,
                 slot_mapping: jnp.ndarray) -> PagedKVCache:
    """Scatter new tokens into one layer's pages.

    k_new/v_new: [T, Hkv, D]; slot_mapping: [T] int32 flat slot =
    page_id * page_size + offset. Padding tokens must map to slot 0 (the
    reserved null page). With the interleaved head-major layout one token's
    write is 2*Hkv rows of [D] (row (kv, h) lands at
    page*2*Hkv*S + kv*Hkv*S + h*S + offset), done as ONE scatter.

    ``layer`` may be a traced scalar: the scatter addresses the cache as one
    flat [L*P*2*Hkv*S, D] array with a layer offset, so the whole cache can
    be a scan *carry* (aliased in place) instead of scan xs/ys — the xs/ys
    form made XLA double-buffer the entire cache every layer (~GBs copied
    per decode step).
    """
    L, P, _, H, S, D = cache.kv_pages.shape
    if k_new.shape[-1] != D:
        # cache lane dim is 128-padded (ModelConfig.cache_head_dim); zero
        # lanes never perturb QK dots or V outputs
        pad = ((0, 0), (0, 0), (0, D - k_new.shape[-1]))
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)
    flat = cache.kv_pages.reshape(L * P * 2 * H * S, D)
    page = slot_mapping // S
    off = slot_mapping % S
    # [T, 2, H] row index per (token, k/v, head)
    kv_idx = jnp.arange(2, dtype=slot_mapping.dtype)[None, :, None]
    h_idx = jnp.arange(H, dtype=slot_mapping.dtype)[None, None, :]
    rows = (layer * (P * 2 * H * S) + page[:, None, None] * (2 * H * S)
            + kv_idx * (H * S) + h_idx * S + off[:, None, None])
    rows = rows.reshape(-1)  # padding tokens (slot 0) land inside the null page
    kv_new = jnp.stack([k_new, v_new], axis=1)  # [T, 2, H, D]

    if cache.kv_scales is not None:
        dtype = cache.kv_pages.dtype
        qmax = 127.0 if dtype == jnp.int8 else 448.0  # e4m3 max normal
        kv_abs = jnp.max(jnp.abs(kv_new.astype(jnp.float32)), axis=-1,
                         keepdims=True)
        s = jnp.maximum(kv_abs, 1e-8) / qmax
        scaled = kv_new.astype(jnp.float32) / s
        if dtype == jnp.int8:
            q = jnp.clip(jnp.round(scaled), -128, 127).astype(jnp.int8)
        else:                       # fp8_e4m3: the cast itself rounds
            q = scaled.astype(dtype)
        flat = flat.at[rows].set(q.reshape(-1, D), mode="drop")
        s_flat = cache.kv_scales.reshape(L * P * 2 * H * S)
        s_flat = s_flat.at[rows].set(s.reshape(-1), mode="drop")
        return PagedKVCache(
            kv_pages=flat.reshape(L, P, 2, H, S, D),
            kv_scales=s_flat.reshape(L, P, 2, H, S),
        )

    dtype = cache.kv_pages.dtype
    flat = flat.at[rows].set(kv_new.astype(dtype).reshape(-1, D), mode="drop")
    return cache._replace(kv_pages=flat.reshape(L, P, 2, H, S, D))


def gather_layer(cache: PagedKVCache, layer: int, block_tables: jnp.ndarray):
    """Dense view of one layer's KV for a batch (reference-path attention).

    block_tables: [B, pages_per_seq] int32. Returns (k, v) as
    [B, Hkv, pages_per_seq * page_size, D] bf16 (dequantized if int8).
    """
    kv = cache.kv_pages[layer][block_tables]  # [B, P, 2, H, S, D]
    B, P, _, H, S, D = kv.shape
    kv = kv.transpose(2, 0, 3, 1, 4, 5).reshape(2, B, H, P * S, D)
    if cache.kv_scales is not None:
        sc = cache.kv_scales[layer][block_tables]
        sc = sc.transpose(2, 0, 3, 1, 4).reshape(2, B, H, P * S, 1)
        kv = (kv.astype(jnp.float32) * sc).astype(jnp.bfloat16)
    elif kv.dtype != jnp.bfloat16:  # fp8_e5m2: scale-free cast
        kv = kv.astype(jnp.bfloat16)
    return kv[0], kv[1]
