"""BART-style encoder-decoder family, TPU-first.

Reference surfaces: vllm/model_executor/models/bart.py
(BartForConditionalGeneration) + vllm/worker/enc_dec_model_runner.py
(encoder/decoder attention metadata split).

TPU-native design:

* The encoder runs ONCE per request as a single bidirectional rectangle
  (post-LN transformer, learned positions with BART's +2 offset). Its
  per-decoder-layer cross K/V is projected immediately and scattered
  into a SECOND paged cache over encoder positions — the same page ids
  the block manager already allocated for the sequence (self-KV and
  cross-KV are different tensors, so sharing the page table is free).
  The reference threads separate encoder_seq_lens / cross-block-table
  metadata through every attention call instead.

* Decoding reuses the SAME paged flash-attention kernel for both
  attention flavors: decoder self-attention with decoder-local
  positions, and cross-attention as "attend to everything" by passing
  q_positions = enc_len - 1 with ctx = enc_len (full, non-causal
  coverage) — no second kernel, no new masks.

* Post-LN residuals, biases everywhere, GELU MLPs, tied lm_head +
  final_logits_bias, exactly the HF semantics (golden-tested).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.attention import paged_attention


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["w"]
            + p["b"]).astype(jnp.bfloat16)


def _lin(x, p):
    out = jnp.dot(x.astype(jnp.bfloat16), p["w"],
                  preferred_element_type=jnp.float32)
    return (out + p["b"]).astype(jnp.bfloat16)


def _mha_dense(q, k, v, nh, mask):
    """Dense bidirectional attention for the one-shot encoder.
    q/k/v [B, T, H]; mask [B, T] valid."""
    B, T, H = q.shape
    d = H // nh
    q = q.reshape(B, T, nh, d).astype(jnp.float32) * (d ** -0.5)
    k = k.reshape(B, T, nh, d).astype(jnp.float32)
    v = v.reshape(B, T, nh, d).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v)
    return o.reshape(B, T, H).astype(jnp.bfloat16)


def encoder_forward(params, cfg: ModelConfig, token_ids: jnp.ndarray,
                    valid: jnp.ndarray) -> jnp.ndarray:
    """[B, T] -> [B, T, H] encoder hidden (HF BartEncoder, post-LN)."""
    B, T = token_ids.shape
    x = params["embed"][token_ids.reshape(-1)].reshape(B, T, -1)
    x = x.astype(jnp.bfloat16)
    if cfg.embed_scale is not None:
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    pos = params["enc_pos"][2 + jnp.arange(T)]          # BART +2 offset
    x = x + pos[None].astype(x.dtype)
    x = _ln(x, params["enc_lnorm_emb"])
    nh = cfg.num_heads

    def layer(x, lp):
        h = x
        qkv = _lin(h, lp["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = _lin(_mha_dense(q, k, v, nh, valid), lp["out"])
        x = _ln(x + o, lp["ln1"])
        f = jax.nn.gelu(_lin(x, lp["fc1"]).astype(jnp.float32),
                        approximate=False).astype(jnp.bfloat16)
        x = _ln(x + _lin(f, lp["fc2"]), lp["ln2"])
        return x, None

    x, _ = jax.lax.scan(layer, x, params["enc_layers"])
    return x


def decoder_forward(params, cfg: ModelConfig, token_ids: jnp.ndarray,
                    dec_positions: jnp.ndarray, dec_ctx: jnp.ndarray,
                    cache: kvc.PagedKVCache, cross_pages: jnp.ndarray,
                    block_tables: jnp.ndarray, enc_len: jnp.ndarray,
                    logits_indices: Optional[jnp.ndarray] = None):
    """Decoder over a (possibly multi-token) causal chunk.

    token_ids [B, Q]; dec_positions [B, Q] decoder-LOCAL positions
    (start token = 0); dec_ctx [B] decoder tokens incl. this chunk.
    Returns (logits, cache)."""
    B, Q = token_ids.shape
    nh = cfg.num_heads
    page_size = cache.page_size
    x = params["embed"][token_ids.reshape(-1)].reshape(B, Q, -1)
    x = x.astype(jnp.bfloat16)
    if cfg.embed_scale is not None:
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    x = x + jnp.take(params["dec_pos"], 2 + dec_positions,
                     axis=0).astype(x.dtype)
    x = _ln(x, params["dec_lnorm_emb"])

    valid = dec_positions < dec_ctx[:, None]
    slot = jnp.where(valid,
                     block_tables[
                         jnp.arange(B)[:, None],
                         dec_positions // page_size] * page_size
                     + dec_positions % page_size, 0)
    cross = kvc.PagedKVCache(kv_pages=cross_pages)

    def layer(carry, lp):
        x, cache_pages, li = carry
        cache_l = kvc.PagedKVCache(kv_pages=cache_pages,
                                   kv_scales=cache.kv_scales)
        # self-attention over decoder positions (paged, causal)
        qkv = _lin(x, lp["self_qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = q.shape[-1] // nh
        cache_l = kvc.update_layer(cache_l, li,
                                   k.reshape(B * Q, nh, d),
                                   v.reshape(B * Q, nh, d),
                                   slot.reshape(-1))
        attn = paged_attention(q.reshape(B, Q, nh, d), cache_l, li,
                               block_tables, dec_ctx, d ** -0.5,
                               q_positions=dec_positions)
        x = _ln(x + _lin(attn.reshape(B, Q, nh * d), lp["self_out"]),
                lp["ln1"])
        # cross-attention: full coverage of the encoder positions
        qc = _lin(x, lp["cross_q"]).reshape(B, Q, nh, d)
        cq_pos = jnp.broadcast_to((enc_len - 1)[:, None], (B, Q))
        cattn = paged_attention(qc, cross, li, block_tables, enc_len,
                                d ** -0.5, q_positions=cq_pos)
        x = _ln(x + _lin(cattn.reshape(B, Q, nh * d), lp["cross_out"]),
                lp["ln2"])
        f = jax.nn.gelu(_lin(x, lp["fc1"]).astype(jnp.float32),
                        approximate=False).astype(jnp.bfloat16)
        x = _ln(x + _lin(f, lp["fc2"]), lp["ln3"])
        return (x, cache_l.kv_pages, li + 1), None

    (x, pages, _), _ = jax.lax.scan(
        layer, (x, cache.kv_pages, jnp.asarray(0, jnp.int32)),
        params["dec_layers"])
    if logits_indices is not None:
        x = jnp.take_along_axis(x, logits_indices[:, None, None], axis=1)
    logits = jnp.dot(x.astype(jnp.bfloat16), params["lm_head"],
                     preferred_element_type=jnp.float32)
    logits = logits + params["final_logits_bias"].astype(jnp.float32)
    return logits, cache._replace(kv_pages=pages)


def build_cross_kv(params, cfg: ModelConfig, enc_hidden: jnp.ndarray,
                   cross_pages: jnp.ndarray, block_tables: jnp.ndarray,
                   valid: jnp.ndarray, positions: jnp.ndarray):
    """Project every decoder layer's cross K/V from the encoder output and
    scatter into the cross cache at encoder positions."""
    B, T, H = enc_hidden.shape
    nh = cfg.num_heads
    d = H // nh
    page_size = cross_pages.shape[4]
    slot = jnp.where(valid,
                     block_tables[jnp.arange(B)[:, None],
                                  positions // page_size] * page_size
                     + positions % page_size, 0)

    def layer(carry, lp):
        pages, li = carry
        kv = _lin(enc_hidden, lp["cross_kv"])
        k, v = jnp.split(kv, 2, axis=-1)
        c = kvc.PagedKVCache(kv_pages=pages)
        c = kvc.update_layer(c, li, k.reshape(B * T, nh, d),
                             v.reshape(B * T, nh, d), slot.reshape(-1))
        return (c.kv_pages, li + 1), None

    (pages, _), _ = jax.lax.scan(
        layer, (cross_pages, jnp.asarray(0, jnp.int32)),
        params["dec_layers"])
    return pages


# ---- params -----------------------------------------------------------

def convert_bart(sd: dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """HF BartForConditionalGeneration state dict -> our pytree."""
    def a(name):
        return np.asarray(sd[name], np.float32)

    def find(*names):
        for n in names:
            if n in sd:
                return n
        raise KeyError(names[0])

    root = "model." if "model.shared.weight" in sd else ""

    def lin_t(prefix):
        return {"w": jnp.asarray(a(prefix + ".weight").T, dtype),
                "b": jnp.asarray(a(prefix + ".bias"), jnp.float32)}

    def ln(prefix):
        return {"w": jnp.asarray(a(prefix + ".weight"), jnp.float32),
                "b": jnp.asarray(a(prefix + ".bias"), jnp.float32)}

    def qkv_fused(prefix):
        w = np.concatenate([a(prefix + ".q_proj.weight").T,
                            a(prefix + ".k_proj.weight").T,
                            a(prefix + ".v_proj.weight").T], axis=1)
        b = np.concatenate([a(prefix + ".q_proj.bias"),
                            a(prefix + ".k_proj.bias"),
                            a(prefix + ".v_proj.bias")])
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, jnp.float32)}

    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"{root}encoder.layers.{i}."
        enc_layers.append({
            "qkv": qkv_fused(p + "self_attn"),
            "out": lin_t(p + "self_attn.out_proj"),
            "ln1": ln(p + "self_attn_layer_norm"),
            "fc1": lin_t(p + "fc1"),
            "fc2": lin_t(p + "fc2"),
            "ln2": ln(p + "final_layer_norm"),
        })
    dec_layers = []
    for i in range(cfg.num_layers):
        p = f"{root}decoder.layers.{i}."
        kv_w = np.concatenate([a(p + "encoder_attn.k_proj.weight").T,
                               a(p + "encoder_attn.v_proj.weight").T], axis=1)
        kv_b = np.concatenate([a(p + "encoder_attn.k_proj.bias"),
                               a(p + "encoder_attn.v_proj.bias")])
        dec_layers.append({
            "self_qkv": qkv_fused(p + "self_attn"),
            "self_out": lin_t(p + "self_attn.out_proj"),
            "ln1": ln(p + "self_attn_layer_norm"),
            "cross_q": lin_t(p + "encoder_attn.q_proj"),
            "cross_kv": {"w": jnp.asarray(kv_w, dtype),
                         "b": jnp.asarray(kv_b, jnp.float32)},
            "cross_out": lin_t(p + "encoder_attn.out_proj"),
            "ln2": ln(p + "encoder_attn_layer_norm"),
            "fc1": lin_t(p + "fc1"),
            "fc2": lin_t(p + "fc2"),
            "ln3": ln(p + "final_layer_norm"),
        })
    shared = a(find(root + "shared.weight", "shared.weight"))
    lm_head = sd.get("lm_head.weight", shared)
    flb = sd.get("final_logits_bias",
                 np.zeros((1, shared.shape[0]), np.float32))
    return {
        "embed": jnp.asarray(shared, dtype),
        "lm_head": jnp.asarray(np.asarray(lm_head, np.float32).T, dtype),
        "final_logits_bias": jnp.asarray(np.asarray(flb, np.float32)
                                         .reshape(-1)),
        "enc_pos": jnp.asarray(a(root + "encoder.embed_positions.weight"),
                               dtype),
        "dec_pos": jnp.asarray(a(root + "decoder.embed_positions.weight"),
                               dtype),
        "enc_lnorm_emb": ln(root + "encoder.layernorm_embedding"),
        "dec_lnorm_emb": ln(root + "decoder.layernorm_embedding"),
        "enc_layers": jax.tree.map(lambda *xs: jnp.stack(xs), *enc_layers),
        "dec_layers": jax.tree.map(lambda *xs: jnp.stack(xs), *dec_layers),
    }


# ---- engine step functions -------------------------------------------

import functools  # noqa: E402

from qspec_tpu.ops.sampling import sample_with_logprob  # noqa: E402


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("cache", "cross_pages"))
def prefill_bart_step(params, cache, cross_pages, enc_tokens, enc_valid,
                      enc_positions, dec_tokens, dec_positions, dec_ctx,
                      block_tables, enc_len, *, cfg):
    """Encoder + cross-KV build + decoder replay in ONE executable.

    Fresh sequences replay only [decoder_start] (Qd = 1); sequences
    resumed after recompute-preemption replay their whole decoder stream
    causally in the same rectangle. Returns (logits [B, V] at each row's
    final decoder position, cache, cross_pages)."""
    enc_hidden = encoder_forward(params, cfg, enc_tokens, enc_valid)
    cross_pages = build_cross_kv(params, cfg, enc_hidden, cross_pages,
                                 block_tables, enc_valid, enc_positions)
    Qd = dec_tokens.shape[1]
    last_idx = jnp.clip(dec_ctx - 1 - dec_positions[:, 0], 0, Qd - 1)
    logits, cache = decoder_forward(params, cfg, dec_tokens, dec_positions,
                                    dec_ctx, cache, cross_pages,
                                    block_tables, enc_len,
                                    logits_indices=last_idx)
    return logits[:, 0], cache, cross_pages


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps"),
                   donate_argnames=("cache",))
def multi_decode_bart_step(params, cache, cross_pages, last_tokens, dec_pos,
                           block_tables, enc_len, max_new, st, key, *, cfg,
                           num_steps):
    """num_steps fused decoder steps (the enc-dec analogue of
    multi_decode_step: on-device advancement, budget-masked emission)."""
    def body(carry, step_key):
        cache, tok, pos, budget = carry
        logits, cache = decoder_forward(
            params, cfg, tok[:, None], pos[:, None], pos + 1, cache,
            cross_pages, block_tables, enc_len)
        nxt, lp = sample_with_logprob(logits[:, 0], st, step_key)
        active = budget > 0
        out = jnp.where(active, nxt, -1)
        new_tok = jnp.where(active, nxt, tok)
        return (cache, new_tok, pos + active.astype(jnp.int32),
                budget - active.astype(jnp.int32)), (out, lp)

    keys = jax.random.split(key, num_steps)
    (cache, f_last, f_pos, f_budget), (toks, lps) = jax.lax.scan(
        body, (cache, last_tokens, dec_pos, max_new), keys)
    return toks, lps, (f_last, f_pos, f_budget), cache
