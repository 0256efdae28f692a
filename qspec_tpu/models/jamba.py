"""Jamba: hybrid attention + Mamba + MoE family, TPU-first.

Reference surfaces: vllm/model_executor/models/jamba.py (hybrid layer
stack over the csrc/mamba kernels + fused MoE) and its
mamba_cache.py side-channel state manager.

TPU-native composition of pieces this framework already has:

* Attention layers (every ``jamba_attn_period``-th layer at
  ``jamba_attn_offset``) are rope-FREE GQA over the normal paged KV —
  their planes of the shared cache tensor hold token pages.
* Mamba layers run models/mamba.mamba_mixer (associative-scan prefill,
  Jamba's learned dt/B/C RMSNorms) with their recurrent state packed
  into THEIR OWN plane of the same cache tensor at the sequence's first
  page (state-in-page) — one tensor serves both layer kinds, and the
  whole block-table/preemption/swap machinery applies unchanged. The
  reference needs a dedicated MambaCacheManager alongside the KV cache.
* Every layer ends in either a dense MLP or a Mixtral-style sparse MoE
  (softmax-then-topk, no renorm) per ``jamba_expert_period``/``offset``.

Layers are heterogeneous, so params["layers"] is a python LIST of
per-layer dicts and the forward is an unrolled loop (traced once per
shape; fine at Jamba's 32 layers). bf16 serving.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig
from qspec_tpu.models.mamba import (mamba_mixer, read_state,
                                    state_floats, write_state)
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.attention import paged_attention


def is_attn_layer(cfg: ModelConfig, li: int) -> bool:
    return li % cfg.jamba_attn_period == cfg.jamba_attn_offset


def is_moe_layer(cfg: ModelConfig, li: int) -> bool:
    return (cfg.num_experts > 0
            and li % cfg.jamba_expert_period == cfg.jamba_expert_offset)


def _rms(x, gamma, eps):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (n * gamma.astype(jnp.float32)).astype(jnp.bfloat16)


def _mlp(h, lp):
    gu = jnp.dot(h, lp["gate_up"], preferred_element_type=jnp.float32)
    g, u = jnp.split(gu, 2, axis=-1)
    act = jax.nn.silu(g) * u
    return jnp.dot(act.astype(jnp.bfloat16), lp["down"],
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _moe(h, lp, top_k: int):
    """Softmax-then-topk MoE, no renormalization (HF JambaSparseMoeBlock).
    h [T, H]; experts stacked [E, ...]."""
    T = h.shape[0]
    logits = jnp.dot(h, lp["router"],
                     preferred_element_type=jnp.float32)     # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    E = lp["experts_gate_up"].shape[0]
    topv, topi = jax.lax.top_k(probs, top_k)
    out = jnp.zeros((T, lp["experts_down"].shape[-1]), jnp.float32)
    for e in range(E):
        w = jnp.sum(jnp.where(topi == e, topv, 0.0), axis=-1)  # [T]
        gu = jnp.dot(h, lp["experts_gate_up"][e],
                     preferred_element_type=jnp.float32)
        g, u = jnp.split(gu, 2, axis=-1)
        y = jnp.dot((jax.nn.silu(g) * u).astype(jnp.bfloat16),
                    lp["experts_down"][e],
                    preferred_element_type=jnp.float32)
        out = out + w[:, None] * y
    return out.astype(jnp.bfloat16)


def jamba_forward(params, cfg: ModelConfig, token_ids: jnp.ndarray,
                  cache: kvc.PagedKVCache, batch,
                  logits_indices: Optional[jnp.ndarray] = None,
                  return_hidden: bool = False):
    """token_ids [B, Q] -> (logits, cache). ``batch`` is the standard
    AttentionBatch; mamba layers take their state page from
    block_tables[:, 0]."""
    B, Q = token_ids.shape
    H = cfg.hidden_size
    nh, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    x = params["embed"][token_ids.reshape(-1)].astype(jnp.bfloat16)
    x = x.reshape(B, Q, H)
    valid = batch.positions < batch.ctx_lens[:, None]
    last_idx = jnp.clip(batch.ctx_lens - 1 - batch.positions[:, 0], 0, Q - 1)
    page_ids = batch.block_tables[:, 0]
    pages = cache.kv_pages

    for li, lp in enumerate(params["layers"]):
        h = _rms(x, lp["input_norm"], eps)
        if is_attn_layer(cfg, li):
            hf = h.reshape(B * Q, H)
            qkv = jnp.dot(hf, lp["qkv"],
                          preferred_element_type=jnp.float32) \
                .astype(jnp.bfloat16)
            q, k, v = jnp.split(qkv, [nh * d, nh * d + hkv * d], axis=-1)
            cache_l = kvc.PagedKVCache(kv_pages=pages,
                                       kv_scales=cache.kv_scales)
            cache_l = kvc.update_layer(
                cache_l, li, k.reshape(B * Q, hkv, d),
                v.reshape(B * Q, hkv, d), batch.slot_mapping.reshape(-1))
            pages = cache_l.kv_pages
            attn = paged_attention(q.reshape(B, Q, nh, d), cache_l, li,
                                   batch.block_tables, batch.ctx_lens,
                                   d ** -0.5, q_positions=batch.positions)
            o = jnp.dot(attn.reshape(B * Q, nh * d).astype(jnp.bfloat16),
                        lp["o"], preferred_element_type=jnp.float32)
            x = x + o.reshape(B, Q, H).astype(x.dtype)
        else:
            conv, ssm = read_state(pages, li, page_ids, cfg)
            y, conv, ssm = mamba_mixer(lp, cfg, h, conv, ssm, valid,
                                       last_idx)
            pages = write_state(pages, li, page_ids, conv, ssm, cfg)
            x = x + y.astype(x.dtype)
        h2 = _rms(x, lp["pre_ff_norm"], eps).reshape(B * Q, H)
        if "router" in lp:
            ff = _moe(h2, lp, cfg.num_experts_per_tok)
        else:
            ff = _mlp(h2, lp)
        x = x + ff.reshape(B, Q, H).astype(x.dtype)

    x = _rms(x, params["final_norm"], eps)
    if return_hidden:
        hidden = x
    if logits_indices is not None:
        x = jnp.take_along_axis(x, logits_indices[:, None, None], axis=1)
    logits = jnp.dot(x.astype(jnp.bfloat16), params["lm_head"],
                     preferred_element_type=jnp.float32)
    out_cache = cache._replace(kv_pages=pages)
    if return_hidden:
        return logits, hidden, out_cache
    return logits, out_cache


def convert_jamba(sd: dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """HF JambaForCausalLM state dict -> our pytree (layers = LIST)."""
    def a(name):
        return np.asarray(sd[name], np.float32)

    def t(name):
        return jnp.asarray(a(name).T, dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        lp = {"input_norm": jnp.asarray(a(p + "input_layernorm.weight"),
                                        dtype),
              "pre_ff_norm": jnp.asarray(a(p + "pre_ff_layernorm.weight"),
                                         dtype)}
        if is_attn_layer(cfg, i):
            lp["qkv"] = jnp.asarray(np.concatenate(
                [a(p + f"self_attn.{n}_proj.weight").T
                 for n in ("q", "k", "v")], axis=1), dtype)
            lp["o"] = t(p + "self_attn.o_proj.weight")
        else:
            m = p + "mamba."
            lp.update({
                "in_proj": t(m + "in_proj.weight"),
                "conv_w": jnp.asarray(a(m + "conv1d.weight")[:, 0].T, dtype),
                "x_proj": t(m + "x_proj.weight"),
                "dt_w": t(m + "dt_proj.weight"),
                "dt_b": jnp.asarray(a(m + "dt_proj.bias"), jnp.float32),
                "A_log": jnp.asarray(a(m + "A_log"), jnp.float32),
                "D": jnp.asarray(a(m + "D"), jnp.float32),
                "out_proj": t(m + "out_proj.weight"),
                "dt_norm": jnp.asarray(a(m + "dt_layernorm.weight"),
                                       jnp.float32),
                "b_norm": jnp.asarray(a(m + "b_layernorm.weight"),
                                      jnp.float32),
                "c_norm": jnp.asarray(a(m + "c_layernorm.weight"),
                                      jnp.float32),
            })
            if m + "conv1d.bias" in sd:
                lp["conv_b"] = jnp.asarray(a(m + "conv1d.bias"), jnp.float32)
        f = p + "feed_forward."
        if f + "router.weight" in sd:
            E = cfg.num_experts
            lp["router"] = t(f + "router.weight")
            lp["experts_gate_up"] = jnp.stack(
                [jnp.asarray(np.concatenate(
                    [a(f + f"experts.{e}.gate_proj.weight").T,
                     a(f + f"experts.{e}.up_proj.weight").T], axis=1), dtype)
                 for e in range(E)])
            lp["experts_down"] = jnp.stack(
                [t(f + f"experts.{e}.down_proj.weight") for e in range(E)])
        else:
            lp["gate_up"] = jnp.asarray(np.concatenate(
                [a(f + "gate_proj.weight").T,
                 a(f + "up_proj.weight").T], axis=1), dtype)
            lp["down"] = t(f + "down_proj.weight")
        layers.append(lp)
    embed = a("model.embed_tokens.weight")
    return {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": jnp.asarray(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            dtype),
        "final_norm": jnp.asarray(a("model.final_layernorm.weight"), dtype),
        "layers": layers,
    }


def check_state_fits(cfg: ModelConfig, page_size: int) -> None:
    """The shared cache page must hold a mamba layer's state."""
    page_floats = 2 * cfg.cache_kv_heads * page_size * cfg.cache_head_dim
    need = state_floats(cfg)
    if page_floats < need:
        min_ps = -(-need // (2 * cfg.cache_kv_heads * cfg.cache_head_dim))
        raise ValueError(
            f"jamba state-in-page needs page_size >= {min_ps} "
            f"(state {need} floats vs page {page_floats}); raise "
            "CacheConfig.page_size")
