"""Whisper: audio encoder-decoder family, TPU-first.

Reference surface: vllm/model_executor/models/whisper.py (encoder-decoder
serving with audio features).

Composition with the BART machinery (models/bart.py):

* The audio frontend is two 1-D convs (k=3; the second stride-2) as
  unfold+matmul, GELU between, plus the FIXED sinusoidal positions that
  HF ships as weights — producing [T_mel/2, H] encoder states.
* Encoder/decoder blocks are PRE-LN (x + attn(LN(x))) with a final
  LayerNorm — the mirror image of BART's post-LN — and Whisper's
  bias pattern (q/v/out biased, k bias-free).
* Cross K/V lives in a ROW-BANK paged cache: one page of
  ``max_source_positions`` rows per sequence ([L, rows, 2, H, S, D] with
  S = enc capacity), assigned per request like the EAGLE span bank — no
  block-manager lifecycle, because audio length is independent of the
  decoder token count that drives page accounting.
* The decoder stream IS the engine's prompt (Whisper's forced decoder
  ids) + outputs, so normal prefill/sampling semantics apply; only the
  encoder input arrives out-of-band (add_request(mm_audio=mel)).
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
    if "b" in p:
        out = out + p["b"]
    return out.astype(jnp.bfloat16)


def _conv1d(x, w, b, stride=1):
    """x [B, T, Cin]; w [k, Cin, Cout] (k=3, pad 1) -> [B, T//stride, Cout]
    as shifted matmuls (unfold; XLA fuses)."""
    B, T, Cin = x.shape
    k = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    out = 0.0
    for j in range(k):
        out = out + jnp.dot(xp[:, j:j + T], w[j],
                            preferred_element_type=jnp.float32)
    out = out + b
    if stride > 1:
        out = out[:, ::stride]
    return out.astype(jnp.bfloat16)


def whisper_encode(params, cfg: ModelConfig, mel: jnp.ndarray,
                   mel_valid: jnp.ndarray, *,
                   avg_pool: bool = False) -> jnp.ndarray:
    """mel [B, T_mel, num_mel] -> encoder states [B, T_mel//2, H].

    ``avg_pool``: Qwen2-Audio's tower is this exact encoder plus an
    AvgPool1d(2) between the layer stack and the final LayerNorm
    (transformers Qwen2AudioEncoder.forward) — output [B, T_mel//4, H].
    """
    x = jax.nn.gelu(_conv1d(mel, params["conv1_w"], params["conv1_b"])
                    .astype(jnp.float32), approximate=False)
    x = jax.nn.gelu(_conv1d(x.astype(jnp.bfloat16), params["conv2_w"],
                            params["conv2_b"], stride=2)
                    .astype(jnp.float32), approximate=False)
    x = x.astype(jnp.bfloat16)
    T = x.shape[1]
    x = x + params["enc_pos"][:T][None].astype(x.dtype)
    valid = mel_valid[:, ::2][:, :T]
    nh = cfg.num_heads

    def layer(x, lp):
        h = _ln(x, lp["ln1"])
        qkv = _lin(h, lp["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        from qspec_tpu.models.bart import _mha_dense
        o = _lin(_mha_dense(q * 1.0, k, v, nh, valid), lp["out"])
        x = x + o
        h = _ln(x, lp["ln2"])
        f = jax.nn.gelu(_lin(h, lp["fc1"]).astype(jnp.float32),
                        approximate=False).astype(jnp.bfloat16)
        x = x + _lin(f, lp["fc2"])
        return x, None

    x, _ = jax.lax.scan(layer, x, params["enc_layers"])
    if avg_pool:
        T2 = (x.shape[1] // 2) * 2   # AvgPool1d(2): trailing odd frame drops
        x = x[:, :T2].reshape(x.shape[0], T2 // 2, 2, x.shape[-1]) \
            .astype(jnp.float32).mean(axis=2).astype(x.dtype)
    return _ln(x, params["enc_final_ln"])


def whisper_decoder(params, cfg: ModelConfig, token_ids: jnp.ndarray,
                    dec_positions: jnp.ndarray, dec_ctx: jnp.ndarray,
                    cache: kvc.PagedKVCache, cross: kvc.PagedKVCache,
                    block_tables: jnp.ndarray, cross_tables: jnp.ndarray,
                    enc_len: jnp.ndarray,
                    logits_indices: Optional[jnp.ndarray] = None):
    """PRE-LN decoder over a causal chunk; self-KV paged by the normal
    block tables (the decoder stream IS the engine's token stream),
    cross-KV read from the row-bank cache via cross_tables [B, 1]."""
    B, Q = token_ids.shape
    nh = cfg.num_heads
    page_size = cache.page_size
    x = params["embed"][token_ids.reshape(-1)].reshape(B, Q, -1)
    x = x.astype(jnp.bfloat16)
    if cfg.embed_scale is not None:
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    x = x + jnp.take(params["dec_pos"], dec_positions, axis=0) \
        .astype(x.dtype)

    valid = dec_positions < dec_ctx[:, None]
    slot = jnp.where(valid,
                     block_tables[jnp.arange(B)[:, None],
                                  dec_positions // page_size] * page_size
                     + dec_positions % page_size, 0)

    def layer(carry, lp):
        x, cache_pages, li = carry
        cache_l = kvc.PagedKVCache(kv_pages=cache_pages,
                                   kv_scales=cache.kv_scales)
        h = _ln(x, lp["ln1"])
        qkv = _lin(h, lp["self_qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = q.shape[-1] // nh
        cache_l = kvc.update_layer(cache_l, li, k.reshape(B * Q, nh, d),
                                   v.reshape(B * Q, nh, d),
                                   slot.reshape(-1))
        attn = paged_attention(q.reshape(B, Q, nh, d), cache_l, li,
                               block_tables, dec_ctx, d ** -0.5,
                               q_positions=dec_positions)
        x = x + _lin(attn.reshape(B, Q, nh * d), lp["self_out"])
        h = _ln(x, lp["ln2"])
        qc = _lin(h, lp["cross_q"]).reshape(B, Q, nh, d)
        cq_pos = jnp.broadcast_to((enc_len - 1)[:, None], (B, Q))
        cattn = paged_attention(qc, cross, li, cross_tables, enc_len,
                                d ** -0.5, q_positions=cq_pos)
        x = x + _lin(cattn.reshape(B, Q, nh * d), lp["cross_out"])
        h = _ln(x, lp["ln3"])
        f = jax.nn.gelu(_lin(h, lp["fc1"]).astype(jnp.float32),
                        approximate=False).astype(jnp.bfloat16)
        x = x + _lin(f, lp["fc2"])
        return (x, cache_l.kv_pages, li + 1), None

    (x, pages, _), _ = jax.lax.scan(
        layer, (x, cache.kv_pages, jnp.asarray(0, jnp.int32)),
        params["dec_layers"])
    x = _ln(x, params["dec_final_ln"])
    if logits_indices is not None:
        x = jnp.take_along_axis(x, logits_indices[:, None, None], axis=1)
    logits = jnp.dot(x.astype(jnp.bfloat16), params["lm_head"],
                     preferred_element_type=jnp.float32)
    return logits, cache._replace(kv_pages=pages)


def build_cross_bank(params, cfg: ModelConfig, enc_hidden: jnp.ndarray,
                     cross_pages: jnp.ndarray, rows: jnp.ndarray,
                     valid: jnp.ndarray):
    """Project per-decoder-layer cross K/V and write each batch lane's
    rows into its bank row. cross_pages [L, ROWS, 2, H, S, D]."""
    B, T, H = enc_hidden.shape
    nh = cfg.num_heads
    d = H // nh
    S = cross_pages.shape[4]
    pos = jnp.arange(T)[None].repeat(B, 0)
    slot = jnp.where(valid[:, :T], rows[:, None] * S + pos, 0)

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


def enc_out_len(t_mel: int) -> int:
    return (t_mel - 1) // 2 + 1


def convert_whisper(sd: dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """HF WhisperForConditionalGeneration state dict -> our pytree."""
    def a(name):
        return np.asarray(sd[name], np.float32)

    root = "model." if "model.encoder.conv1.weight" in sd else ""

    def lin_t(prefix, bias=True):
        p = {"w": jnp.asarray(a(prefix + ".weight").T, dtype)}
        if bias and prefix + ".bias" in sd:
            p["b"] = jnp.asarray(a(prefix + ".bias"), jnp.float32)
        return p

    def ln(prefix):
        return {"w": jnp.asarray(a(prefix + ".weight"), jnp.float32),
                "b": jnp.asarray(a(prefix + ".bias"), jnp.float32)}

    def qkv_fused(prefix):
        # whisper: q/v/out biased, k bias-free
        w = np.concatenate([a(prefix + ".q_proj.weight").T,
                            a(prefix + ".k_proj.weight").T,
                            a(prefix + ".v_proj.weight").T], axis=1)
        b = np.concatenate([a(prefix + ".q_proj.bias"),
                            np.zeros(a(prefix + ".k_proj.weight").shape[0],
                                     np.float32),
                            a(prefix + ".v_proj.bias")])
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, jnp.float32)}

    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"{root}encoder.layers.{i}."
        enc_layers.append({
            "ln1": ln(p + "self_attn_layer_norm"),
            "qkv": qkv_fused(p + "self_attn"),
            "out": lin_t(p + "self_attn.out_proj"),
            "ln2": ln(p + "final_layer_norm"),
            "fc1": lin_t(p + "fc1"),
            "fc2": lin_t(p + "fc2"),
        })
    dec_layers = []
    for i in range(cfg.num_layers):
        p = f"{root}decoder.layers.{i}."
        kv_w = np.concatenate([a(p + "encoder_attn.k_proj.weight").T,
                               a(p + "encoder_attn.v_proj.weight").T],
                              axis=1)
        kv_b = np.concatenate([np.zeros(
            a(p + "encoder_attn.k_proj.weight").shape[0], np.float32),
            a(p + "encoder_attn.v_proj.bias")])
        dec_layers.append({
            "ln1": ln(p + "self_attn_layer_norm"),
            "self_qkv": qkv_fused(p + "self_attn"),
            "self_out": lin_t(p + "self_attn.out_proj"),
            "ln2": ln(p + "encoder_attn_layer_norm"),
            "cross_q": lin_t(p + "encoder_attn.q_proj"),
            "cross_kv": {"w": jnp.asarray(kv_w, dtype),
                         "b": jnp.asarray(kv_b, jnp.float32)},
            "cross_out": lin_t(p + "encoder_attn.out_proj"),
            "ln3": ln(p + "final_layer_norm"),
            "fc1": lin_t(p + "fc1"),
            "fc2": lin_t(p + "fc2"),
        })
    embed = a(root + "decoder.embed_tokens.weight")
    lm_head = sd.get("proj_out.weight", embed)
    conv1 = a(root + "encoder.conv1.weight")   # [H, mel, 3]
    conv2 = a(root + "encoder.conv2.weight")   # [H, H, 3]
    return {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": jnp.asarray(np.asarray(lm_head, np.float32).T, dtype),
        "conv1_w": jnp.asarray(conv1.transpose(2, 1, 0), dtype),
        "conv1_b": jnp.asarray(a(root + "encoder.conv1.bias"), jnp.float32),
        "conv2_w": jnp.asarray(conv2.transpose(2, 1, 0), dtype),
        "conv2_b": jnp.asarray(a(root + "encoder.conv2.bias"), jnp.float32),
        "enc_pos": jnp.asarray(a(root + "encoder.embed_positions.weight"),
                               dtype),
        "dec_pos": jnp.asarray(a(root + "decoder.embed_positions.weight"),
                               dtype),
        "enc_final_ln": ln(root + "encoder.layer_norm"),
        "dec_final_ln": ln(root + "decoder.layer_norm"),
        "enc_layers": jax.tree.map(lambda *xs: jnp.stack(xs), *enc_layers),
        "dec_layers": jax.tree.map(lambda *xs: jnp.stack(xs), *dec_layers),
    }


def convert_audio_tower(sd: dict, acfg, dtype=jnp.bfloat16) -> dict:
    """Qwen2-Audio ``audio_tower.*`` keys -> the whisper_encode param
    layout (the tower IS the whisper encoder: conv1/conv2 + sinusoid-free
    learned positions + pre-LN blocks + final layer_norm; reference
    vllm/model_executor/models/qwen2_audio.py Qwen2AudioEncoder)."""
    root = "audio_tower." if "audio_tower.conv1.weight" in sd \
        else "model.audio_tower."

    def a(name):
        return np.asarray(sd[name], np.float32)

    def lin_t(prefix, bias=True):
        p = {"w": jnp.asarray(a(prefix + ".weight").T, dtype)}
        if bias and prefix + ".bias" in sd:
            p["b"] = jnp.asarray(a(prefix + ".bias"), jnp.float32)
        return p

    def ln(prefix):
        return {"w": jnp.asarray(a(prefix + ".weight"), jnp.float32),
                "b": jnp.asarray(a(prefix + ".bias"), jnp.float32)}

    def qkv_fused(prefix):
        w = np.concatenate([a(prefix + ".q_proj.weight").T,
                            a(prefix + ".k_proj.weight").T,
                            a(prefix + ".v_proj.weight").T], axis=1)
        b = np.concatenate([a(prefix + ".q_proj.bias"),
                            np.zeros(a(prefix + ".k_proj.weight").shape[0],
                                     np.float32),
                            a(prefix + ".v_proj.bias")])
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, jnp.float32)}

    layers = []
    for i in range(acfg.num_layers):
        p = f"{root}layers.{i}."
        layers.append({
            "ln1": ln(p + "self_attn_layer_norm"),
            "qkv": qkv_fused(p + "self_attn"),
            "out": lin_t(p + "self_attn.out_proj"),
            "ln2": ln(p + "final_layer_norm"),
            "fc1": lin_t(p + "fc1"),
            "fc2": lin_t(p + "fc2"),
        })
    conv1 = a(root + "conv1.weight")
    conv2 = a(root + "conv2.weight")
    return {
        "conv1_w": jnp.asarray(conv1.transpose(2, 1, 0), dtype),
        "conv1_b": jnp.asarray(a(root + "conv1.bias"), jnp.float32),
        "conv2_w": jnp.asarray(conv2.transpose(2, 1, 0), dtype),
        "conv2_b": jnp.asarray(a(root + "conv2.bias"), jnp.float32),
        "enc_pos": jnp.asarray(a(root + "embed_positions.weight"), dtype),
        "enc_final_ln": ln(root + "layer_norm"),
        "enc_layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }


# ---- engine step functions -------------------------------------------

import functools  # noqa: E402

from qspec_tpu.ops.sampling import sample_with_logprob  # noqa: E402


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("cache", "cross_pages"))
def prefill_whisper_step(params, cache, cross_pages, mel, mel_valid,
                         cross_rows, dec_tokens, dec_positions, dec_ctx,
                         block_tables, cross_tables, enc_len, *, cfg):
    """Audio encode + cross-bank build + decoder prompt replay in ONE
    executable. Returns (logits [B, V] at each row's final decoder
    position, cache, cross_pages)."""
    enc_hidden = whisper_encode(params, cfg, mel, mel_valid)
    T_enc = enc_hidden.shape[1]
    evalid = jnp.arange(T_enc)[None] < enc_len[:, None]
    cross_pages = build_cross_bank(params, cfg, enc_hidden, cross_pages,
                                   cross_rows, evalid)
    Qd = dec_tokens.shape[1]
    last_idx = jnp.clip(dec_ctx - 1 - dec_positions[:, 0], 0, Qd - 1)
    logits, cache = whisper_decoder(
        params, cfg, dec_tokens, dec_positions, dec_ctx, cache,
        kvc.PagedKVCache(kv_pages=cross_pages), block_tables,
        cross_tables, enc_len, logits_indices=last_idx)
    return logits[:, 0], cache, cross_pages


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps"),
                   donate_argnames=("cache",))
def multi_decode_whisper_step(params, cache, cross_pages, last_tokens,
                              dec_pos, block_tables, cross_tables, enc_len,
                              max_new, st, key, *, cfg, num_steps):
    """num_steps fused decoder steps over the row-bank cross cache."""
    cross = kvc.PagedKVCache(kv_pages=cross_pages)

    def body(carry, step_key):
        cache, tok, pos, budget = carry
        logits, cache = whisper_decoder(
            params, cfg, tok[:, None], pos[:, None], pos + 1, cache,
            cross, block_tables, cross_tables, enc_len)
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
