"""Rotary position embedding (neox style), XLA-fused.

Replaces the reference's `ops.rotary_embedding` CUDA kernel and the
`ERotaryEmbedding` cos/sin cache (csrc/pos_encoding_kernels.cu;
vllm/model_executor/layers/rotary_embedding.py:77). On TPU the rotation is a
handful of elementwise ops that XLA fuses into the surrounding kernels, so
no Pallas is needed — we just precompute the cos/sin cache once.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _cos_sin_cache(head_dim: int, max_positions: int, base: float,
                   scaling_factor: Optional[float]) -> np.ndarray:
    inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    t = np.arange(max_positions, dtype=np.float64)
    if scaling_factor is not None:
        t = t / scaling_factor
    freqs = np.outer(t, inv_freq)
    return np.stack([np.cos(freqs), np.sin(freqs)], axis=0).astype(np.float32)


def make_rope_cache(head_dim: int, max_positions: int = 8192, base: float = 500000.0,
                    scaling_factor: Optional[float] = None,
                    rope_scaling: Optional[dict] = None) -> jnp.ndarray:
    """[2, max_positions, head_dim//2] float32 (cos, sin).

    Supports llama3-style rope scaling (low/high freq factor), matching the HF
    convention used by the reference's rope variants
    (vllm/model_executor/layers/rotary_embedding.py, Llama3RotaryEmbedding).
    """
    cache = _cos_sin_cache(head_dim, max_positions, base, scaling_factor).copy()
    if rope_scaling and rope_scaling.get("rope_type", rope_scaling.get("type")) == "llama3":
        factor = rope_scaling["factor"]
        low = rope_scaling["low_freq_factor"]
        high = rope_scaling["high_freq_factor"]
        orig_ctx = rope_scaling["original_max_position_embeddings"]
        inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
        wavelen = 2 * np.pi / inv_freq
        new_inv = np.where(wavelen > orig_ctx / low, inv_freq / factor, inv_freq)
        smooth = (orig_ctx / wavelen - low) / (high - low)
        mid = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        is_mid = (wavelen <= orig_ctx / low) & (wavelen >= orig_ctx / high)
        new_inv = np.where(is_mid, mid, new_inv)
        t = np.arange(max_positions, dtype=np.float64)
        freqs = np.outer(t, new_inv)
        cache = np.stack([np.cos(freqs), np.sin(freqs)], axis=0).astype(np.float32)
    elif rope_scaling and rope_scaling.get(
            "rope_type", rope_scaling.get("type")) in ("longrope", "su"):
        # phi-3 longrope (reference Phi3LongRoPEScaledRotaryEmbedding):
        # per-dim inv_freq rescale factors, short for positions inside the
        # original window and long beyond it, with a global sqrt-log
        # attention-scaling multiplier folded into cos/sin
        orig_ctx = rope_scaling.get("original_max_position_embeddings",
                                    max_positions)
        short = np.asarray(rope_scaling["short_factor"], np.float64)
        long = np.asarray(rope_scaling["long_factor"], np.float64)
        inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2,
                                             dtype=np.float64) / head_dim))
        scale = max_positions / orig_ctx
        mscale = (1.0 if scale <= 1.0
                  else np.sqrt(1.0 + np.log(scale) / np.log(orig_ctx)))
        t = np.arange(max_positions, dtype=np.float64)
        freqs_short = np.outer(t, inv_freq / short)
        freqs_long = np.outer(t, inv_freq / long)
        use_long = (t >= orig_ctx)[:, None]
        freqs = np.where(use_long, freqs_long, freqs_short)
        cache = (np.stack([np.cos(freqs), np.sin(freqs)], axis=0)
                 * mscale).astype(np.float32)
    return jnp.asarray(cache)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, positions: jnp.ndarray,
               cache: jnp.ndarray, style: str = "neox"):
    """Rotary rotation. q: [T, Hq, D], k: [T, Hk, D], positions: [T].

    The rotated width is the cache's (2 * cache.shape[-1]); when it is
    smaller than D the remaining dims pass through unrotated (partial
    rotary — StableLM/GPT-NeoX/Phi/GPT-J, reference
    rotary_embedding.py rotary_dim < head_size).

    style: "neox" rotates half-split pairs (x_i, x_{i+rd/2}); "gptj"
    rotates interleaved pairs (x_{2i}, x_{2i+1}) (reference
    RotaryEmbedding is_neox_style=False — GPT-J, Cohere).
    """
    cos = cache[0][positions][:, None, :]  # [T, 1, rd/2]
    sin = cache[1][positions][:, None, :]
    rd = 2 * cache.shape[-1]

    def rot(x):
        xf = x.astype(jnp.float32)
        xr, xp = xf[..., :rd], xf[..., rd:]
        if style == "gptj":
            x1, x2 = xr[..., 0::2], xr[..., 1::2]
            out = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                            axis=-1).reshape(xr.shape)
        else:
            half = rd // 2
            x1, x2 = xr[..., :half], xr[..., half:]
            out = jnp.concatenate([x1 * cos - x2 * sin,
                                   x2 * cos + x1 * sin], axis=-1)
        if rd < x.shape[-1]:
            out = jnp.concatenate([out, xp], axis=-1)
        return out.astype(x.dtype)

    return rot(q), rot(k)


def apply_rope_mrope(q: jnp.ndarray, k: jnp.ndarray,
                     positions3: jnp.ndarray, cache: jnp.ndarray,
                     mrope_section, style: str = "neox"):
    """Multimodal 3D rotary (M-RoPE, Qwen2-VL; reference
    models/qwen2_vl.py:66 uses_mrope + HF apply_multimodal_rotary_pos_emb).

    positions3: [3, T] (temporal, height, width) position ids per token.
    ``mrope_section``: per-channel HALF-dim widths (e.g. (16, 24, 24) for
    head_dim 128) — rotary dims 0..s0-1 rotate by the temporal stream,
    s0..s0+s1-1 by height, the rest by width. Text tokens carry identical
    channels, which makes this EXACTLY standard neox rope at that position.
    """
    cos3 = cache[0][positions3]          # [3, T, D/2]
    sin3 = cache[1][positions3]
    parts_c, parts_s = [], []
    off = 0
    for i, s in enumerate(mrope_section):
        parts_c.append(cos3[i % 3, :, off:off + s])
        parts_s.append(sin3[i % 3, :, off:off + s])
        off += s
    cos = jnp.concatenate(parts_c, axis=-1)[:, None, :]   # [T, 1, D/2]
    sin = jnp.concatenate(parts_s, axis=-1)[:, None, :]
    rd = 2 * cache.shape[-1]

    def rot(x):
        xf = x.astype(jnp.float32)
        xr, xp = xf[..., :rd], xf[..., rd:]
        half = rd // 2
        x1, x2 = xr[..., :half], xr[..., half:]
        out = jnp.concatenate([x1 * cos - x2 * sin,
                               x2 * cos + x1 * sin], axis=-1)
        if rd < x.shape[-1]:
            out = jnp.concatenate([out, xp], axis=-1)
        return out.astype(x.dtype)

    return rot(q), rot(k)
