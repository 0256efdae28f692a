"""Float state-dict converters for non-llama-keyed model families.

The llama-keyed families (llama/qwen/mistral/gemma/phi3/granite/...) load
through model_loader.loader.load_hf_float; the families here use different
checkpoint layouts — GPT-2's Conv1D orientation, OPT's decoder.* prefix,
Falcon's fused query_key_value, Baichuan's W_pack, InternLM2's interleaved
wqkv — and are translated into the SAME param tree the engine serves
(models/llama.py model_forward with the norm_type / mlp_gated /
position_embedding / parallel_block graph knobs from ModelConfig).

Reference model files: vllm/model_executor/models/{opt,gpt2,starcoder2,
falcon,baichuan,internlm2}.py — each reference file is a full torch module;
here a family is a config translation (models/registry.py) plus this
state-dict mapping, because the TPU graph is a single parameterized
function rather than a module tree.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig


def _t(sd, name):
    return np.asarray(sd[name], np.float32).T


def _arr(sd, name):
    return np.asarray(sd[name], np.float32)


def _stack(layers):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def _finish(params, cfg: ModelConfig, dtype):
    from qspec_tpu.ops.rotary import make_rope_cache
    params["rope_cache"] = make_rope_cache(
        cfg.rotary_dim or cfg.head_dim,
        cfg.max_position_embeddings, cfg.rope_theta,
        rope_scaling=cfg.rope_scaling)
    return params


def convert_opt(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """OPT (reference vllm/model_executor/models/opt.py): decoder.* prefix,
    learned positions with the +2 offset table, pre-LayerNorm, ReLU fc MLP,
    biases everywhere, tied lm_head."""
    pre = "model.decoder."
    if pre + "project_in.weight" in sd:
        raise ValueError("OPT word_embed_proj_dim != hidden_size (350m "
                         "layout) is not supported")
    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}layers.{i}."
        qkv_w = np.concatenate([_t(sd, p + f"self_attn.{n}_proj.weight")
                                for n in ("q", "k", "v")], axis=1)
        qkv_b = np.concatenate([_arr(sd, p + f"self_attn.{n}_proj.bias")
                                for n in ("q", "k", "v")])
        layers.append({
            "qkv": {"w": jnp.asarray(qkv_w, dtype),
                    "b": jnp.asarray(qkv_b, dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "self_attn.out_proj.weight"), dtype),
                  "b": jnp.asarray(_arr(sd, p + "self_attn.out_proj.bias"), dtype)},
            "gate_up": {"w": jnp.asarray(_t(sd, p + "fc1.weight"), dtype),
                        "b": jnp.asarray(_arr(sd, p + "fc1.bias"), dtype)},
            "down": {"w": jnp.asarray(_t(sd, p + "fc2.weight"), dtype),
                     "b": jnp.asarray(_arr(sd, p + "fc2.bias"), dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "self_attn_layer_norm.weight"), dtype),
            "input_norm_b": jnp.asarray(
                _arr(sd, p + "self_attn_layer_norm.bias"), dtype),
            "post_norm": jnp.asarray(
                _arr(sd, p + "final_layer_norm.weight"), dtype),
            "post_norm_b": jnp.asarray(
                _arr(sd, p + "final_layer_norm.bias"), dtype),
        })
    embed = _arr(sd, pre + "embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "pos_embed": jnp.asarray(_arr(sd, pre + "embed_positions.weight"),
                                 dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, pre + "final_layer_norm.weight"),
                                  dtype),
        "final_norm_b": jnp.asarray(_arr(sd, pre + "final_layer_norm.bias"),
                                    dtype),
    }
    return _finish(params, cfg, dtype)


def convert_gpt2(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """GPT-2 (reference models/gpt2.py): transformer.* prefix, Conv1D
    weights already [in, out] (no transpose), fused c_attn = [q|k|v],
    learned wpe positions, gelu_new fc MLP, tied head."""
    pre = "transformer."

    def conv(name):  # Conv1D: stored [in, out]
        return np.asarray(sd[name], np.float32)

    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}h.{i}."
        layers.append({
            "qkv": {"w": jnp.asarray(conv(p + "attn.c_attn.weight"), dtype),
                    "b": jnp.asarray(_arr(sd, p + "attn.c_attn.bias"), dtype)},
            "o": {"w": jnp.asarray(conv(p + "attn.c_proj.weight"), dtype),
                  "b": jnp.asarray(_arr(sd, p + "attn.c_proj.bias"), dtype)},
            "gate_up": {"w": jnp.asarray(conv(p + "mlp.c_fc.weight"), dtype),
                        "b": jnp.asarray(_arr(sd, p + "mlp.c_fc.bias"), dtype)},
            "down": {"w": jnp.asarray(conv(p + "mlp.c_proj.weight"), dtype),
                     "b": jnp.asarray(_arr(sd, p + "mlp.c_proj.bias"), dtype)},
            "input_norm": jnp.asarray(_arr(sd, p + "ln_1.weight"), dtype),
            "input_norm_b": jnp.asarray(_arr(sd, p + "ln_1.bias"), dtype),
            "post_norm": jnp.asarray(_arr(sd, p + "ln_2.weight"), dtype),
            "post_norm_b": jnp.asarray(_arr(sd, p + "ln_2.bias"), dtype),
        })
    embed = _arr(sd, pre + "wte.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "pos_embed": jnp.asarray(_arr(sd, pre + "wpe.weight"), dtype),
        "lm_head": pack_lm_head(embed.T, cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, pre + "ln_f.weight"), dtype),
        "final_norm_b": jnp.asarray(_arr(sd, pre + "ln_f.bias"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_gpt_bigcode(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """GPT-BigCode / StarCoder-1 (reference models/gpt_bigcode.py): GPT-2
    layout but nn.Linear weights ([out, in] -> transpose) and MULTI-QUERY
    attention — c_attn emits [q (all heads) | k, v (one head)], which is
    exactly our GQA layout at num_kv_heads=1."""
    pre = "transformer."
    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}h.{i}."
        layers.append({
            "qkv": {"w": jnp.asarray(_t(sd, p + "attn.c_attn.weight"), dtype),
                    "b": jnp.asarray(_arr(sd, p + "attn.c_attn.bias"), dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "attn.c_proj.weight"), dtype),
                  "b": jnp.asarray(_arr(sd, p + "attn.c_proj.bias"), dtype)},
            "gate_up": {"w": jnp.asarray(_t(sd, p + "mlp.c_fc.weight"), dtype),
                        "b": jnp.asarray(_arr(sd, p + "mlp.c_fc.bias"), dtype)},
            "down": {"w": jnp.asarray(_t(sd, p + "mlp.c_proj.weight"), dtype),
                     "b": jnp.asarray(_arr(sd, p + "mlp.c_proj.bias"), dtype)},
            "input_norm": jnp.asarray(_arr(sd, p + "ln_1.weight"), dtype),
            "input_norm_b": jnp.asarray(_arr(sd, p + "ln_1.bias"), dtype),
            "post_norm": jnp.asarray(_arr(sd, p + "ln_2.weight"), dtype),
            "post_norm_b": jnp.asarray(_arr(sd, p + "ln_2.bias"), dtype),
        })
    embed = _arr(sd, pre + "wte.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "pos_embed": jnp.asarray(_arr(sd, pre + "wpe.weight"), dtype),
        "lm_head": pack_lm_head(embed.T, cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, pre + "ln_f.weight"), dtype),
        "final_norm_b": jnp.asarray(_arr(sd, pre + "ln_f.bias"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_starcoder2(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Starcoder2 (reference models/starcoder2.py): llama-style keys with
    biases, LayerNorm, non-gated c_fc/c_proj gelu MLP, rope, GQA."""
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        qkv_w = np.concatenate([_t(sd, p + f"self_attn.{n}_proj.weight")
                                for n in ("q", "k", "v")], axis=1)
        qkv_b = np.concatenate([_arr(sd, p + f"self_attn.{n}_proj.bias")
                                for n in ("q", "k", "v")])
        layers.append({
            "qkv": {"w": jnp.asarray(qkv_w, dtype),
                    "b": jnp.asarray(qkv_b, dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "self_attn.o_proj.weight"), dtype),
                  "b": jnp.asarray(_arr(sd, p + "self_attn.o_proj.bias"), dtype)},
            "gate_up": {"w": jnp.asarray(_t(sd, p + "mlp.c_fc.weight"), dtype),
                        "b": jnp.asarray(_arr(sd, p + "mlp.c_fc.bias"), dtype)},
            "down": {"w": jnp.asarray(_t(sd, p + "mlp.c_proj.weight"), dtype),
                     "b": jnp.asarray(_arr(sd, p + "mlp.c_proj.bias"), dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "input_layernorm.weight"), dtype),
            "input_norm_b": jnp.asarray(
                _arr(sd, p + "input_layernorm.bias"), dtype),
            "post_norm": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.weight"), dtype),
            "post_norm_b": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.bias"), dtype),
        })
    embed = _arr(sd, "model.embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, "model.norm.weight"), dtype),
        "final_norm_b": jnp.asarray(_arr(sd, "model.norm.bias"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_falcon(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Falcon (reference models/falcon.py): parallel attention+MLP blocks
    with ONE input LayerNorm, fused query_key_value, gelu MLP, rope.

    Fused-QKV layouts: multi_query (7B) stores [q_heads..., k, v] — already
    our q|k|v order; new_decoder_architecture (40B/180B) interleaves per kv
    group ([g, q_per_group + 2, dh]) and is de-interleaved here."""
    pre = "transformer."
    nh, nkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}h.{i}."
        w = _t(sd, p + "self_attention.query_key_value.weight")  # [H, out]
        qkv_b = (sd.get(p + "self_attention.query_key_value.bias")
                 if cfg.linear_bias else None)
        if qkv_b is not None:
            qkv_b = np.asarray(qkv_b, np.float32)
        if nkv not in (1, nh):
            # new-decoder GQA interleave: [nkv, q_per_group + 2, dh]
            grouped = w.reshape(w.shape[0], nkv, nh // nkv + 2, dh)
            q = grouped[:, :, :-2].reshape(w.shape[0], nh * dh)
            k = grouped[:, :, -2].reshape(w.shape[0], nkv * dh)
            v = grouped[:, :, -1].reshape(w.shape[0], nkv * dh)
            w = np.concatenate([q, k, v], axis=1)
        elif nkv == nh:
            # falcon-rw MHA lineage: PER-HEAD [nh, 3, dh] interleave, same
            # as BLOOM (reference falcon.py FalconAttention._split_heads
            # non-multi_query/non-new-arch branch)
            grouped = w.reshape(w.shape[0], nh, 3, dh)
            w = np.concatenate(
                [grouped[:, :, j].reshape(w.shape[0], nh * dh)
                 for j in range(3)], axis=1)
            if qkv_b is not None:
                qkv_b = np.concatenate(
                    [qkv_b.reshape(nh, 3, dh)[:, j].reshape(-1)
                     for j in range(3)])
        ln_w = sd.get(p + "input_layernorm.weight",
                      sd.get(p + "ln_attn.weight"))
        ln_b = sd.get(p + "input_layernorm.bias", sd.get(p + "ln_attn.bias"))
        layer = {
            "qkv": {"w": jnp.asarray(w, dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "self_attention.dense.weight"),
                                   dtype)},
            "gate_up": {"w": jnp.asarray(_t(sd, p + "mlp.dense_h_to_4h.weight"),
                                         dtype)},
            "down": {"w": jnp.asarray(_t(sd, p + "mlp.dense_4h_to_h.weight"),
                                      dtype)},
            "input_norm": jnp.asarray(np.asarray(ln_w, np.float32), dtype),
            "input_norm_b": jnp.asarray(np.asarray(ln_b, np.float32), dtype),
        }
        if cfg.linear_bias:
            # falcon-rw lineage (bias=True): biases on every projection;
            # the fused qkv bias was de-interleaved alongside its weight
            layer["qkv"]["b"] = jnp.asarray(qkv_b, dtype)
            layer["o"]["b"] = jnp.asarray(
                _arr(sd, p + "self_attention.dense.bias"), dtype)
            layer["gate_up"]["b"] = jnp.asarray(
                _arr(sd, p + "mlp.dense_h_to_4h.bias"), dtype)
            layer["down"]["b"] = jnp.asarray(
                _arr(sd, p + "mlp.dense_4h_to_h.bias"), dtype)
        if not cfg.parallel_block:
            # sequential pre-LN blocks (falcon-rw): a separate MLP norm
            layer["post_norm"] = jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.weight"), dtype)
            layer["post_norm_b"] = jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.bias"), dtype)
        layers.append(layer)
    embed = _arr(sd, pre + "word_embeddings.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, pre + "ln_f.weight"), dtype),
        "final_norm_b": jnp.asarray(_arr(sd, pre + "ln_f.bias"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_bloom(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """BLOOM (reference models/bloom.py): transformer.* prefix, ALiBi (no
    position table), an embedding LayerNorm, HEAD-INTERLEAVED fused
    query_key_value ([nh, 3, dh] rows — de-interleaved to q|k|v here, the
    same reshuffle the reference does in BloomAttention weight loading),
    tanh-gelu MLP with biases, tied lm_head."""
    pre = "transformer."
    nh, dh = cfg.num_heads, cfg.head_dim
    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}h.{i}."
        w = _t(sd, p + "self_attention.query_key_value.weight")  # [H, 3H]
        b = _arr(sd, p + "self_attention.query_key_value.bias")  # [3H]
        grouped = w.reshape(w.shape[0], nh, 3, dh)
        w = np.concatenate([grouped[:, :, j].reshape(w.shape[0], nh * dh)
                            for j in range(3)], axis=1)
        b = np.concatenate([b.reshape(nh, 3, dh)[:, j].reshape(-1)
                            for j in range(3)])
        layers.append({
            "qkv": {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "self_attention.dense.weight"),
                                   dtype),
                  "b": jnp.asarray(_arr(sd, p + "self_attention.dense.bias"),
                                   dtype)},
            "gate_up": {
                "w": jnp.asarray(_t(sd, p + "mlp.dense_h_to_4h.weight"),
                                 dtype),
                "b": jnp.asarray(_arr(sd, p + "mlp.dense_h_to_4h.bias"),
                                 dtype)},
            "down": {
                "w": jnp.asarray(_t(sd, p + "mlp.dense_4h_to_h.weight"),
                                 dtype),
                "b": jnp.asarray(_arr(sd, p + "mlp.dense_4h_to_h.bias"),
                                 dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "input_layernorm.weight"), dtype),
            "input_norm_b": jnp.asarray(
                _arr(sd, p + "input_layernorm.bias"), dtype),
            "post_norm": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.weight"), dtype),
            "post_norm_b": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.bias"), dtype),
        })
    embed = _arr(sd, pre + "word_embeddings.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "embed_norm": jnp.asarray(
            _arr(sd, pre + "word_embeddings_layernorm.weight"), dtype),
        "embed_norm_b": jnp.asarray(
            _arr(sd, pre + "word_embeddings_layernorm.bias"), dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, pre + "ln_f.weight"), dtype),
        "final_norm_b": jnp.asarray(_arr(sd, pre + "ln_f.bias"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_mpt(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """MPT (reference models/mpt.py): transformer.blocks.* naming, fused
    Wqkv already in q|k|v order, bias-free LayerNorms when no_bias, gelu
    up/down MLP, tied embeddings (no separate lm_head weight)."""
    pre = "transformer."
    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}blocks.{i}."

        def maybe_b(d, name):
            if cfg.linear_bias and name + ".bias" in sd:
                d["b"] = jnp.asarray(_arr(sd, name + ".bias"), dtype)
            return d

        layer = {
            "qkv": maybe_b({"w": jnp.asarray(_t(sd, p + "attn.Wqkv.weight"),
                                             dtype)}, p + "attn.Wqkv"),
            "o": maybe_b({"w": jnp.asarray(_t(sd, p + "attn.out_proj.weight"),
                                           dtype)}, p + "attn.out_proj"),
            "gate_up": maybe_b(
                {"w": jnp.asarray(_t(sd, p + "ffn.up_proj.weight"), dtype)},
                p + "ffn.up_proj"),
            "down": maybe_b(
                {"w": jnp.asarray(_t(sd, p + "ffn.down_proj.weight"), dtype)},
                p + "ffn.down_proj"),
            "input_norm": jnp.asarray(_arr(sd, p + "norm_1.weight"), dtype),
            "post_norm": jnp.asarray(_arr(sd, p + "norm_2.weight"), dtype),
        }
        if p + "norm_1.bias" in sd:
            layer["input_norm_b"] = jnp.asarray(_arr(sd, p + "norm_1.bias"),
                                                dtype)
            layer["post_norm_b"] = jnp.asarray(_arr(sd, p + "norm_2.bias"),
                                               dtype)
        layers.append(layer)
    embed = _arr(sd, pre + "wte.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(embed.T, cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, pre + "norm_f.weight"), dtype),
    }
    if pre + "norm_f.bias" in sd:
        params["final_norm_b"] = jnp.asarray(_arr(sd, pre + "norm_f.bias"),
                                             dtype)
    return _finish(params, cfg, dtype)


def convert_jais(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """JAIS (reference models/jais.py): GPT-2 Conv1D layout ([in, out], no
    transpose), fused c_attn = [q|k|v], SWIGLU MLP as c_fc (gate) + c_fc2
    (up) -> gate_up concat, ALiBi (no wpe), tied head. The muP scales ride
    cfg (embed_scale / logits_scaling / query_pre_attn_scalar)."""
    pre = "transformer."

    def conv(name):  # Conv1D: stored [in, out]
        return np.asarray(sd[name], np.float32)

    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}h.{i}."
        gate_up = np.concatenate([conv(p + "mlp.c_fc.weight"),
                                  conv(p + "mlp.c_fc2.weight")], axis=1)
        gate_up_b = np.concatenate([_arr(sd, p + "mlp.c_fc.bias"),
                                    _arr(sd, p + "mlp.c_fc2.bias")])
        layers.append({
            "qkv": {"w": jnp.asarray(conv(p + "attn.c_attn.weight"), dtype),
                    "b": jnp.asarray(_arr(sd, p + "attn.c_attn.bias"), dtype)},
            "o": {"w": jnp.asarray(conv(p + "attn.c_proj.weight"), dtype),
                  "b": jnp.asarray(_arr(sd, p + "attn.c_proj.bias"), dtype)},
            "gate_up": {"w": jnp.asarray(gate_up, dtype),
                        "b": jnp.asarray(gate_up_b, dtype)},
            "down": {"w": jnp.asarray(conv(p + "mlp.c_proj.weight"), dtype),
                     "b": jnp.asarray(_arr(sd, p + "mlp.c_proj.bias"), dtype)},
            "input_norm": jnp.asarray(_arr(sd, p + "ln_1.weight"), dtype),
            "input_norm_b": jnp.asarray(_arr(sd, p + "ln_1.bias"), dtype),
            "post_norm": jnp.asarray(_arr(sd, p + "ln_2.weight"), dtype),
            "post_norm_b": jnp.asarray(_arr(sd, p + "ln_2.bias"), dtype),
        })
    embed = _arr(sd, pre + "wte.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(embed.T, cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, pre + "ln_f.weight"), dtype),
        "final_norm_b": jnp.asarray(_arr(sd, pre + "ln_f.bias"), dtype),
    }
    return _finish(params, cfg, dtype)


def baichuan_to_llama_keys(sd: Dict, cfg: ModelConfig) -> Dict:
    """Baichuan-7B (reference models/baichuan.py): the llama graph with a
    fused W_pack qkv ([3H, H] rows q|k|v). Returns a llama-keyed state dict
    so BOTH the bf16 loader and the QuaRot rotate+quantize pipeline serve
    it (13B/ALiBi is rejected at config translation)."""
    remapped = {}
    H = cfg.hidden_size
    for k, v in sd.items():
        if k.endswith("self_attn.W_pack.weight"):
            base = k[:-len("W_pack.weight")]
            w = np.asarray(v, np.float32)
            remapped[base + "q_proj.weight"] = w[:H]
            remapped[base + "k_proj.weight"] = w[H:2 * H]
            remapped[base + "v_proj.weight"] = w[2 * H:]
        else:
            remapped[k] = v
    return remapped


def internlm2_to_llama_keys(sd: Dict, cfg: ModelConfig) -> Dict:
    """InternLM2 (reference models/internlm2.py): tok_embeddings/output
    naming, attention.wqkv packed per kv-group as [g, q_per_group + 2, dh]
    (de-interleaved to q|k|v here), feed_forward.w1/w3/w2 gated MLP."""
    nh, nkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    remapped = {
        "model.embed_tokens.weight": sd["model.tok_embeddings.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["output.weight"],
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        w = np.asarray(sd[p + "attention.wqkv.weight"], np.float32)  # [out, H]
        grouped = w.reshape(nkv, nh // nkv + 2, dh, -1)
        remapped[p + "self_attn.q_proj.weight"] = \
            grouped[:, :-2].reshape(nh * dh, -1)
        remapped[p + "self_attn.k_proj.weight"] = \
            grouped[:, -2].reshape(nkv * dh, -1)
        remapped[p + "self_attn.v_proj.weight"] = \
            grouped[:, -1].reshape(nkv * dh, -1)
        remapped[p + "self_attn.o_proj.weight"] = sd[p + "attention.wo.weight"]
        remapped[p + "mlp.gate_proj.weight"] = sd[p + "feed_forward.w1.weight"]
        remapped[p + "mlp.up_proj.weight"] = sd[p + "feed_forward.w3.weight"]
        remapped[p + "mlp.down_proj.weight"] = sd[p + "feed_forward.w2.weight"]
        remapped[p + "input_layernorm.weight"] = sd[p + "attention_norm.weight"]
        remapped[p + "post_attention_layernorm.weight"] = \
            sd[p + "ffn_norm.weight"]
    return remapped


def qwen1_to_llama_keys(sd: Dict, cfg: ModelConfig) -> Dict:
    """Qwen(1) (reference models/qwen.py): transformer.h.* naming, fused
    c_attn = [q|k|v] with bias, RMSNorm ln_1/ln_2, swiglu with gate = w2
    and up = w1 (reference stacked_params_mapping :976)."""
    H = cfg.hidden_size
    remapped = {
        "model.embed_tokens.weight": sd["transformer.wte.weight"],
        "model.norm.weight": sd["transformer.ln_f.weight"],
        "lm_head.weight": sd.get("lm_head.weight",
                                 sd["transformer.wte.weight"]),
    }
    for i in range(cfg.num_layers):
        p, o = f"transformer.h.{i}.", f"model.layers.{i}."
        w = np.asarray(sd[p + "attn.c_attn.weight"], np.float32)  # [3H, H]
        b = np.asarray(sd[p + "attn.c_attn.bias"], np.float32)
        remapped[o + "self_attn.q_proj.weight"] = w[:H]
        remapped[o + "self_attn.k_proj.weight"] = w[H:2 * H]
        remapped[o + "self_attn.v_proj.weight"] = w[2 * H:]
        remapped[o + "self_attn.q_proj.bias"] = b[:H]
        remapped[o + "self_attn.k_proj.bias"] = b[H:2 * H]
        remapped[o + "self_attn.v_proj.bias"] = b[2 * H:]
        remapped[o + "self_attn.o_proj.weight"] = sd[p + "attn.c_proj.weight"]
        remapped[o + "mlp.gate_proj.weight"] = sd[p + "mlp.w2.weight"]
        remapped[o + "mlp.up_proj.weight"] = sd[p + "mlp.w1.weight"]
        remapped[o + "mlp.down_proj.weight"] = sd[p + "mlp.c_proj.weight"]
        remapped[o + "input_layernorm.weight"] = sd[p + "ln_1.weight"]
        remapped[o + "post_attention_layernorm.weight"] = sd[p + "ln_2.weight"]
    return remapped


def exaone_to_llama_keys(sd: Dict, cfg: ModelConfig) -> Dict:
    """EXAONE (reference models/exaone.py): llama graph under
    transformer.h.{i}.{ln_1, attn.attention.*, ln_2, mlp.c_fc_0/c_fc_1/
    c_proj} naming; gate = c_fc_0, up = c_fc_1 (:516-517)."""
    remapped = {
        "model.embed_tokens.weight": sd["transformer.wte.weight"],
        "model.norm.weight": sd["transformer.ln_f.weight"],
        "lm_head.weight": sd.get("lm_head.weight",
                                 sd["transformer.wte.weight"]),
    }
    for i in range(cfg.num_layers):
        p, o = f"transformer.h.{i}.", f"model.layers.{i}."
        a = p + "attn.attention."
        remapped[o + "self_attn.q_proj.weight"] = sd[a + "q_proj.weight"]
        remapped[o + "self_attn.k_proj.weight"] = sd[a + "k_proj.weight"]
        remapped[o + "self_attn.v_proj.weight"] = sd[a + "v_proj.weight"]
        remapped[o + "self_attn.o_proj.weight"] = sd[a + "out_proj.weight"]
        remapped[o + "mlp.gate_proj.weight"] = sd[p + "mlp.c_fc_0.weight"]
        remapped[o + "mlp.up_proj.weight"] = sd[p + "mlp.c_fc_1.weight"]
        remapped[o + "mlp.down_proj.weight"] = sd[p + "mlp.c_proj.weight"]
        remapped[o + "input_layernorm.weight"] = sd[p + "ln_1.weight"]
        remapped[o + "post_attention_layernorm.weight"] = sd[p + "ln_2.weight"]
    return remapped


def telechat2_to_llama_keys(sd: Dict, cfg: ModelConfig) -> Dict:
    """TeleChat2 (reference models/telechat2.py): llama graph with a
    separate query projection, key_value fused PER HEAD as [h, 2, dh]
    (de-interleaved here, :60-76), biased o/down, bias-free qkv/gate_up."""
    nh, dh = cfg.num_heads, cfg.head_dim
    remapped = {
        "model.embed_tokens.weight": sd["transformer.word_embeddings.weight"],
        "model.norm.weight": sd["transformer.ln_f.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for i in range(cfg.num_layers):
        p, o = f"transformer.h.{i}.", f"model.layers.{i}."
        kv = np.asarray(sd[p + "self_attention.key_value.weight"],
                        np.float32).reshape(nh, 2, dh, -1)
        remapped[o + "self_attn.q_proj.weight"] = \
            sd[p + "self_attention.query.weight"]
        remapped[o + "self_attn.k_proj.weight"] = kv[:, 0].reshape(nh * dh, -1)
        remapped[o + "self_attn.v_proj.weight"] = kv[:, 1].reshape(nh * dh, -1)
        remapped[o + "self_attn.o_proj.weight"] = \
            sd[p + "self_attention.dense.weight"]
        remapped[o + "self_attn.o_proj.bias"] = \
            sd[p + "self_attention.dense.bias"]
        remapped[o + "mlp.gate_proj.weight"] = sd[p + "mlp.gate_proj.weight"]
        remapped[o + "mlp.up_proj.weight"] = sd[p + "mlp.up_proj.weight"]
        remapped[o + "mlp.down_proj.weight"] = sd[p + "mlp.down_proj.weight"]
        remapped[o + "mlp.down_proj.bias"] = sd[p + "mlp.down_proj.bias"]
        remapped[o + "input_layernorm.weight"] = sd[p + "input_layernorm.weight"]
        remapped[o + "post_attention_layernorm.weight"] = \
            sd[p + "post_attention_layernorm.weight"]
    return remapped


def convert_chatglm(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """ChatGLM2/3 / GLM-4-chat (reference models/chatglm.py): transformer.
    encoder.* naming, straight-fused query_key_value [q|k|v] with qkv-only
    bias (MQA groups), RMSNorm, fused swiglu dense_h_to_4h = [gate|up],
    rotary over head_dim/2 interleaved pairs, untied output_layer."""
    pre = "transformer.encoder.layers."
    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}{i}."
        layer = {
            "qkv": {"w": jnp.asarray(
                _t(sd, p + "self_attention.query_key_value.weight"), dtype)},
            "o": {"w": jnp.asarray(
                _t(sd, p + "self_attention.dense.weight"), dtype)},
            "gate_up": {"w": jnp.asarray(
                _t(sd, p + "mlp.dense_h_to_4h.weight"), dtype)},
            "down": {"w": jnp.asarray(
                _t(sd, p + "mlp.dense_4h_to_h.weight"), dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "input_layernorm.weight"), dtype),
            "post_norm": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.weight"), dtype),
        }
        if cfg.qkv_bias:
            layer["qkv"]["b"] = jnp.asarray(
                _arr(sd, p + "self_attention.query_key_value.bias"), dtype)
        layers.append(layer)
    embed = _arr(sd, "transformer.embedding.word_embeddings.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("transformer.output_layer.weight", embed),
                       np.float32).T, cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(
            _arr(sd, "transformer.encoder.final_layernorm.weight"), dtype),
    }
    return _finish(params, cfg, dtype)


LLAMA_KEY_REMAPS = {
    "baichuan": baichuan_to_llama_keys,
    "internlm2": internlm2_to_llama_keys,
    "qwen": qwen1_to_llama_keys,
    "exaone": exaone_to_llama_keys,
    "telechat2": telechat2_to_llama_keys,
}


def convert_baichuan(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    from qspec_tpu.model_loader.loader import load_hf_float
    params, _ = load_hf_float(baichuan_to_llama_keys(sd, cfg), cfg,
                              dtype=dtype)
    return params


def convert_qwen1(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    from qspec_tpu.model_loader.loader import load_hf_float
    params, _ = load_hf_float(qwen1_to_llama_keys(sd, cfg), cfg, dtype=dtype)
    return params


def convert_exaone(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    from qspec_tpu.model_loader.loader import load_hf_float
    params, _ = load_hf_float(exaone_to_llama_keys(sd, cfg), cfg, dtype=dtype)
    return params


def convert_telechat2(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    from qspec_tpu.model_loader.loader import load_hf_float
    params, _ = load_hf_float(telechat2_to_llama_keys(sd, cfg), cfg,
                              dtype=dtype)
    return params


def convert_internlm2(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    from qspec_tpu.model_loader.loader import load_hf_float
    params, _ = load_hf_float(internlm2_to_llama_keys(sd, cfg), cfg,
                              dtype=dtype)
    return params


def convert_deepseek(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """DeepSeek-MoE V1 (reference models/deepseek.py): llama attention keys;
    the first first_k_dense layers keep a dense llama MLP (stacked into
    params["layers_dense"]); MoE layers carry mlp.gate (router),
    mlp.experts.{e}.* and the UNGATED mlp.shared_experts.*."""
    dense_layers, moe_layers = [], []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layer = {
            "qkv": {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + f"self_attn.{n}_proj.weight")
                 for n in ("q", "k", "v")], axis=1), dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "self_attn.o_proj.weight"),
                                   dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "input_layernorm.weight"), dtype),
            "post_norm": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.weight"), dtype),
        }
        if i < cfg.first_k_dense:
            layer["gate_up"] = {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + "mlp.gate_proj.weight"),
                 _t(sd, p + "mlp.up_proj.weight")], axis=1), dtype)}
            layer["down"] = {"w": jnp.asarray(
                _t(sd, p + "mlp.down_proj.weight"), dtype)}
            dense_layers.append(layer)
            continue
        layer["router"] = jnp.asarray(_t(sd, p + "mlp.gate.weight"), dtype)
        gu = [np.concatenate([_t(sd, f"{p}mlp.experts.{e}.gate_proj.weight"),
                              _t(sd, f"{p}mlp.experts.{e}.up_proj.weight")],
                             axis=1) for e in range(cfg.num_experts)]
        dn = [_t(sd, f"{p}mlp.experts.{e}.down_proj.weight")
              for e in range(cfg.num_experts)]
        layer["experts_gate_up"] = {"w": jnp.asarray(np.stack(gu), dtype)}
        layer["experts_down"] = {"w": jnp.asarray(np.stack(dn), dtype)}
        if cfg.shared_expert_intermediate_size:
            layer["shared_gate_up"] = {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + "mlp.shared_experts.gate_proj.weight"),
                 _t(sd, p + "mlp.shared_experts.up_proj.weight")],
                axis=1), dtype)}
            layer["shared_down"] = {"w": jnp.asarray(
                _t(sd, p + "mlp.shared_experts.down_proj.weight"), dtype)}
        moe_layers.append(layer)
    embed = _arr(sd, "model.embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(moe_layers),
        "final_norm": jnp.asarray(_arr(sd, "model.norm.weight"), dtype),
    }
    if dense_layers:
        params["layers_dense"] = _stack(dense_layers)
    return _finish(params, cfg, dtype)


def convert_deepseek_v2(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """DeepSeek-V2 (reference models/deepseek_v2.py): MLA attention keys
    (q_proj or q_a/q_b low-rank split, kv_a_proj_with_mqa + kv_a_layernorm
    + kv_b_proj) and the V1-style MoE with routed_scaling_factor. kv_b is
    stored [kv_lora_rank, nh, dn+dv] for the weight-absorbed decode path
    (models/llama._mla_attention)."""
    nh = cfg.num_heads
    dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
    dense_layers, moe_layers = [], []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}.self_attn."
        layer = {
            "mla_kv_a": {"w": jnp.asarray(
                _t(sd, p + "kv_a_proj_with_mqa.weight"), dtype)},
            "mla_kv_norm": jnp.asarray(
                _arr(sd, p + "kv_a_layernorm.weight"), dtype),
            "mla_kv_b": jnp.asarray(
                _t(sd, p + "kv_b_proj.weight")
                .reshape(cfg.kv_lora_rank, nh, dn + dv), dtype),
            "o": {"w": jnp.asarray(_t(sd, p + "o_proj.weight"), dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, f"model.layers.{i}.input_layernorm.weight"), dtype),
            "post_norm": jnp.asarray(
                _arr(sd, f"model.layers.{i}.post_attention_layernorm.weight"),
                dtype),
        }
        if cfg.q_lora_rank:
            layer["mla_q_a"] = {"w": jnp.asarray(
                _t(sd, p + "q_a_proj.weight"), dtype)}
            layer["mla_q_norm"] = jnp.asarray(
                _arr(sd, p + "q_a_layernorm.weight"), dtype)
            layer["mla_q_b"] = {"w": jnp.asarray(
                _t(sd, p + "q_b_proj.weight"), dtype)}
        else:
            layer["mla_q"] = {"w": jnp.asarray(
                _t(sd, p + "q_proj.weight"), dtype)}
        mp = f"model.layers.{i}.mlp."
        if cfg.num_experts == 0 or i < cfg.first_k_dense:
            layer["gate_up"] = {"w": jnp.asarray(np.concatenate(
                [_t(sd, mp + "gate_proj.weight"),
                 _t(sd, mp + "up_proj.weight")], axis=1), dtype)}
            layer["down"] = {"w": jnp.asarray(
                _t(sd, mp + "down_proj.weight"), dtype)}
            dense_layers.append(layer)
            continue
        layer["router"] = jnp.asarray(_t(sd, mp + "gate.weight"), dtype)
        if mp + "gate.e_score_correction_bias" in sd:
            # DeepSeek-V3 noaux_tc selection bias (reference
            # DeepseekV3TopkRouter.e_score_correction_bias)
            layer["router_bias"] = jnp.asarray(
                _arr(sd, mp + "gate.e_score_correction_bias"), jnp.float32)
        elif cfg.moe_routing == "noaux_tc":
            layer["router_bias"] = jnp.zeros((cfg.num_experts,), jnp.float32)
        gu = [np.concatenate([_t(sd, f"{mp}experts.{e}.gate_proj.weight"),
                              _t(sd, f"{mp}experts.{e}.up_proj.weight")],
                             axis=1) for e in range(cfg.num_experts)]
        dn_w = [_t(sd, f"{mp}experts.{e}.down_proj.weight")
                for e in range(cfg.num_experts)]
        layer["experts_gate_up"] = {"w": jnp.asarray(np.stack(gu), dtype)}
        layer["experts_down"] = {"w": jnp.asarray(np.stack(dn_w), dtype)}
        if cfg.shared_expert_intermediate_size:
            layer["shared_gate_up"] = {"w": jnp.asarray(np.concatenate(
                [_t(sd, mp + "shared_experts.gate_proj.weight"),
                 _t(sd, mp + "shared_experts.up_proj.weight")],
                axis=1), dtype)}
            layer["shared_down"] = {"w": jnp.asarray(
                _t(sd, mp + "shared_experts.down_proj.weight"), dtype)}
        moe_layers.append(layer)
    embed = _arr(sd, "model.embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(moe_layers if moe_layers else dense_layers),
        "final_norm": jnp.asarray(_arr(sd, "model.norm.weight"), dtype),
    }
    if moe_layers and dense_layers:
        params["layers_dense"] = _stack(dense_layers)
    return _finish(params, cfg, dtype)


def convert_stablelm(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """StableLM (reference models/stablelm.py): llama-keyed checkpoint with
    LayerNorm(+bias) norms, gated silu MLP, optional qkv bias, partial
    rotary (handled by cfg.rotary_dim)."""
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        qkv = {"w": jnp.asarray(np.concatenate(
            [_t(sd, p + f"self_attn.{n}_proj.weight")
             for n in ("q", "k", "v")], axis=1), dtype)}
        if p + "self_attn.q_proj.bias" in sd:
            qkv["b"] = jnp.asarray(np.concatenate(
                [_arr(sd, p + f"self_attn.{n}_proj.bias")
                 for n in ("q", "k", "v")]), dtype)
        layers.append({
            "qkv": qkv,
            "o": {"w": jnp.asarray(_t(sd, p + "self_attn.o_proj.weight"),
                                   dtype)},
            "gate_up": {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + "mlp.gate_proj.weight"),
                 _t(sd, p + "mlp.up_proj.weight")], axis=1), dtype)},
            "down": {"w": jnp.asarray(_t(sd, p + "mlp.down_proj.weight"),
                                      dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "input_layernorm.weight"), dtype),
            "input_norm_b": jnp.asarray(
                _arr(sd, p + "input_layernorm.bias"), dtype),
            "post_norm": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.weight"), dtype),
            "post_norm_b": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.bias"), dtype),
        })
    embed = _arr(sd, "model.embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, "model.norm.weight"), dtype),
        "final_norm_b": jnp.asarray(_arr(sd, "model.norm.bias"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_gpt_neox(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """GPT-NeoX/Pythia (reference models/gpt_neox.py): gpt_neox.* prefix,
    fused query_key_value interleaved PER HEAD ([nh, 3, dh] rows —
    de-interleaved to q|k|v here), parallel residual with two norms,
    non-gated gelu MLP, untied embed_out head."""
    pre = "gpt_neox."
    nh, dh = cfg.num_heads, cfg.head_dim
    H = cfg.hidden_size
    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}layers.{i}."
        w = _t(sd, p + "attention.query_key_value.weight")  # [H, 3H]
        w = w.reshape(H, nh, 3, dh)
        qkv_w = np.concatenate([w[:, :, j].reshape(H, nh * dh)
                                for j in range(3)], axis=1)
        b = _arr(sd, p + "attention.query_key_value.bias").reshape(nh, 3, dh)
        qkv_b = np.concatenate([b[:, j].reshape(nh * dh) for j in range(3)])
        layers.append({
            "qkv": {"w": jnp.asarray(qkv_w, dtype),
                    "b": jnp.asarray(qkv_b, dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "attention.dense.weight"),
                                   dtype),
                  "b": jnp.asarray(_arr(sd, p + "attention.dense.bias"),
                                   dtype)},
            "gate_up": {"w": jnp.asarray(
                _t(sd, p + "mlp.dense_h_to_4h.weight"), dtype),
                "b": jnp.asarray(_arr(sd, p + "mlp.dense_h_to_4h.bias"),
                                 dtype)},
            "down": {"w": jnp.asarray(
                _t(sd, p + "mlp.dense_4h_to_h.weight"), dtype),
                "b": jnp.asarray(_arr(sd, p + "mlp.dense_4h_to_h.bias"),
                                 dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "input_layernorm.weight"), dtype),
            "input_norm_b": jnp.asarray(
                _arr(sd, p + "input_layernorm.bias"), dtype),
            "post_norm": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.weight"), dtype),
            "post_norm_b": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.bias"), dtype),
        })
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(_arr(sd, pre + "embed_in.weight"), dtype),
        "lm_head": pack_lm_head(_t(sd, "embed_out.weight"), cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(
            _arr(sd, pre + "final_layer_norm.weight"), dtype),
        "final_norm_b": jnp.asarray(
            _arr(sd, pre + "final_layer_norm.bias"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_phi(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Phi-1/1.5/2 (reference models/phi.py): llama-style keys with biases,
    self_attn.dense output proj, fc1/fc2 MLP, ONE input LayerNorm per block
    (parallel), final_layernorm, lm_head with bias."""
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layers.append({
            "qkv": {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + f"self_attn.{n}_proj.weight")
                 for n in ("q", "k", "v")], axis=1), dtype),
                "b": jnp.asarray(np.concatenate(
                    [_arr(sd, p + f"self_attn.{n}_proj.bias")
                     for n in ("q", "k", "v")]), dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "self_attn.dense.weight"),
                                   dtype),
                  "b": jnp.asarray(_arr(sd, p + "self_attn.dense.bias"),
                                   dtype)},
            "gate_up": {"w": jnp.asarray(_t(sd, p + "mlp.fc1.weight"), dtype),
                        "b": jnp.asarray(_arr(sd, p + "mlp.fc1.bias"),
                                         dtype)},
            "down": {"w": jnp.asarray(_t(sd, p + "mlp.fc2.weight"), dtype),
                     "b": jnp.asarray(_arr(sd, p + "mlp.fc2.bias"), dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "input_layernorm.weight"), dtype),
            "input_norm_b": jnp.asarray(
                _arr(sd, p + "input_layernorm.bias"), dtype),
        })
    embed = _arr(sd, "model.embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(_t(sd, "lm_head.weight"), cfg, dtype),
        "lm_head_b": jnp.asarray(_arr(sd, "lm_head.bias"), dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(
            _arr(sd, "model.final_layernorm.weight"), dtype),
        "final_norm_b": jnp.asarray(
            _arr(sd, "model.final_layernorm.bias"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_gptj(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """GPT-J (reference models/gpt_j.py): transformer.h.* prefix, separate
    unbiased q/k/v/out projections, fc_in/fc_out MLP with biases, shared
    ln_1 parallel block, lm_head with bias."""
    pre = "transformer."
    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}h.{i}."
        layers.append({
            "qkv": {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + f"attn.{n}_proj.weight")
                 for n in ("q", "k", "v")], axis=1), dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "attn.out_proj.weight"),
                                   dtype)},
            "gate_up": {"w": jnp.asarray(_t(sd, p + "mlp.fc_in.weight"),
                                         dtype),
                        "b": jnp.asarray(_arr(sd, p + "mlp.fc_in.bias"),
                                         dtype)},
            "down": {"w": jnp.asarray(_t(sd, p + "mlp.fc_out.weight"),
                                      dtype),
                     "b": jnp.asarray(_arr(sd, p + "mlp.fc_out.bias"),
                                      dtype)},
            "input_norm": jnp.asarray(_arr(sd, p + "ln_1.weight"), dtype),
            "input_norm_b": jnp.asarray(_arr(sd, p + "ln_1.bias"), dtype),
        })
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(_arr(sd, pre + "wte.weight"), dtype),
        "lm_head": pack_lm_head(_t(sd, "lm_head.weight"), cfg, dtype),
        "lm_head_b": jnp.asarray(_arr(sd, "lm_head.bias"), dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, pre + "ln_f.weight"), dtype),
        "final_norm_b": jnp.asarray(_arr(sd, pre + "ln_f.bias"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_cohere(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Cohere/CommandR (reference models/commandr.py): llama-keyed weights,
    ONE bias-free LayerNorm per block (parallel attn+MLP), bias-free final
    norm, ALWAYS-tied embeddings (logit_scale rides cfg.logits_scaling)."""
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        qkv = {"w": jnp.asarray(np.concatenate(
            [_t(sd, p + f"self_attn.{n}_proj.weight")
             for n in ("q", "k", "v")], axis=1), dtype)}
        if p + "self_attn.q_proj.bias" in sd:
            qkv["b"] = jnp.asarray(np.concatenate(
                [_arr(sd, p + f"self_attn.{n}_proj.bias")
                 for n in ("q", "k", "v")]), dtype)
        layers.append({
            "qkv": qkv,
            "o": {"w": jnp.asarray(_t(sd, p + "self_attn.o_proj.weight"),
                                   dtype)},
            "gate_up": {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + "mlp.gate_proj.weight"),
                 _t(sd, p + "mlp.up_proj.weight")], axis=1), dtype)},
            "down": {"w": jnp.asarray(_t(sd, p + "mlp.down_proj.weight"),
                                      dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "input_layernorm.weight"), dtype),
        })
    embed = _arr(sd, "model.embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(embed.T, cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, "model.norm.weight"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_olmo(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """OLMo (reference models/olmo.py): llama-keyed weights with
    NON-PARAMETRIC LayerNorms — the checkpoint carries no norm tensors, so
    gamma=1 (and no beta) is stored to keep the graph uniform."""
    ones = jnp.ones((cfg.hidden_size,), dtype)
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layers.append({
            "qkv": {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + f"self_attn.{n}_proj.weight")
                 for n in ("q", "k", "v")], axis=1), dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "self_attn.o_proj.weight"),
                                   dtype)},
            "gate_up": {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + "mlp.gate_proj.weight"),
                 _t(sd, p + "mlp.up_proj.weight")], axis=1), dtype)},
            "down": {"w": jnp.asarray(_t(sd, p + "mlp.down_proj.weight"),
                                      dtype)},
            "input_norm": ones,
            "post_norm": ones,
        })
    embed = _arr(sd, "model.embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(layers),
        "final_norm": ones,
    }
    return _finish(params, cfg, dtype)


def convert_nemotron(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Nemotron (reference models/nemotron.py): llama-keyed checkpoint with
    LayerNorm1P norms (x * (1 + w) + b — the +1 folds into the stored
    gamma), NON-gated squared-ReLU MLP, partial rotary."""
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layers.append({
            "qkv": {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + f"self_attn.{n}_proj.weight")
                 for n in ("q", "k", "v")], axis=1), dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "self_attn.o_proj.weight"),
                                   dtype)},
            "gate_up": {"w": jnp.asarray(_t(sd, p + "mlp.up_proj.weight"),
                                         dtype)},
            "down": {"w": jnp.asarray(_t(sd, p + "mlp.down_proj.weight"),
                                      dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "input_layernorm.weight") + 1.0, dtype),
            "input_norm_b": jnp.asarray(
                _arr(sd, p + "input_layernorm.bias"), dtype),
            "post_norm": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.weight") + 1.0,
                dtype),
            "post_norm_b": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.bias"), dtype),
        })
    embed = _arr(sd, "model.embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, "model.norm.weight") + 1.0,
                                  dtype),
        "final_norm_b": jnp.asarray(_arr(sd, "model.norm.bias"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_olmo2(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """OLMo2 (reference models/olmo2.py): llama projections with the
    norm-AFTER-block layout (no input norms; post_attention /
    post_feedforward RMSNorms on the block outputs) and FULL-width q/k
    RMSNorms before rope."""
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layers.append({
            "qkv": {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + f"self_attn.{n}_proj.weight")
                 for n in ("q", "k", "v")], axis=1), dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "self_attn.o_proj.weight"),
                                   dtype)},
            "q_norm": jnp.asarray(_arr(sd, p + "self_attn.q_norm.weight"),
                                  jnp.float32),
            "k_norm": jnp.asarray(_arr(sd, p + "self_attn.k_norm.weight"),
                                  jnp.float32),
            "gate_up": {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + "mlp.gate_proj.weight"),
                 _t(sd, p + "mlp.up_proj.weight")], axis=1), dtype)},
            "down": {"w": jnp.asarray(_t(sd, p + "mlp.down_proj.weight"),
                                      dtype)},
            "post_attn_norm": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.weight"), dtype),
            "post_ffw_norm": jnp.asarray(
                _arr(sd, p + "post_feedforward_layernorm.weight"), dtype),
        })
    embed = _arr(sd, "model.embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, "model.norm.weight"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_granitemoe(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """GraniteMoe (reference models/granitemoe.py): granite's scalar
    multipliers + a fused-expert MoE. input_linear [E, 2I, H] packs
    [gate|up] per expert; its topk-then-softmax gating equals mixtral's
    softmax-then-topk-renormalize, so the layers ride our mixtral MoE
    block unchanged."""
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        m = p + "block_sparse_moe."
        inp = _arr(sd, m + "input_linear.weight")    # [E, 2I, H]
        outp = _arr(sd, m + "output_linear.weight")  # [E, H, I]
        I = inp.shape[1] // 2
        gu = np.concatenate([inp[:, :I].transpose(0, 2, 1),
                             inp[:, I:].transpose(0, 2, 1)],
                            axis=2)                  # [E, H, 2I]
        layers.append({
            "qkv": {"w": jnp.asarray(np.concatenate(
                [_t(sd, p + f"self_attn.{n}_proj.weight")
                 for n in ("q", "k", "v")], axis=1), dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "self_attn.o_proj.weight"),
                                   dtype)},
            "router": jnp.asarray(_t(sd, m + "router.layer.weight"), dtype),
            "experts_gate_up": {"w": jnp.asarray(gu, dtype)},
            "experts_down": {"w": jnp.asarray(outp.transpose(0, 2, 1),
                                              dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "input_layernorm.weight"), dtype),
            "post_norm": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.weight"), dtype),
        })
    embed = _arr(sd, "model.embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, "model.norm.weight"), dtype),
    }
    return _finish(params, cfg, dtype)


def convert_dbrx(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """DBRX (reference models/dbrx.py): fused Wqkv + clip_qkv, bias-free
    LayerNorms, fused expert slabs w1/v1 ([E*ffn, H], applied transposed)
    and w2 ([E*ffn, H], applied direct). p=1 expert-weight normalization
    equals mixtral's softmax-over-topk routing, so the layers ride our
    mixtral MoE block."""
    E = cfg.num_experts
    I = cfg.expert_intermediate_size
    layers = []
    for i in range(cfg.num_layers):
        p = f"transformer.blocks.{i}."
        a = p + "norm_attn_norm."
        f = p + "ffn."
        w1 = _arr(sd, f + "experts.mlp.w1").reshape(E, I, -1)
        v1 = _arr(sd, f + "experts.mlp.v1").reshape(E, I, -1)
        w2 = _arr(sd, f + "experts.mlp.w2").reshape(E, I, -1)
        gu = np.concatenate([w1.transpose(0, 2, 1),
                             v1.transpose(0, 2, 1)], axis=2)  # [E, H, 2I]
        layers.append({
            "qkv": {"w": jnp.asarray(_t(sd, a + "attn.Wqkv.weight"), dtype)},
            "o": {"w": jnp.asarray(_t(sd, a + "attn.out_proj.weight"),
                                   dtype)},
            "router": jnp.asarray(_t(sd, f + "router.layer.weight"), dtype),
            "experts_gate_up": {"w": jnp.asarray(gu, dtype)},
            "experts_down": {"w": jnp.asarray(w2, dtype)},
            "input_norm": jnp.asarray(_arr(sd, a + "norm_1.weight"), dtype),
            "post_norm": jnp.asarray(_arr(sd, a + "norm_2.weight"), dtype),
        })
    embed = _arr(sd, "transformer.wte.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, "transformer.norm_f.weight"),
                                  dtype),
    }
    return _finish(params, cfg, dtype)


def convert_persimmon(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Persimmon (reference models/persimmon.py): per-head-INTERLEAVED
    fused query_key_value (+bias) de-interleaved to [q|k|v], per-head
    LayerNorm with bias on q/k, LayerNorm norms, relu^2 fc MLP, partial
    rotary."""
    H = cfg.hidden_size
    nh, hd = cfg.num_heads, cfg.head_dim
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        w = _arr(sd, p + "self_attn.query_key_value.weight")  # [3H, H]
        b = _arr(sd, p + "self_attn.query_key_value.bias")
        w = w.reshape(nh, 3, hd, H)
        b = b.reshape(nh, 3, hd)
        qkv_w = np.concatenate([w[:, j].reshape(nh * hd, H)
                                for j in range(3)], axis=0).T
        qkv_b = np.concatenate([b[:, j].reshape(nh * hd)
                                for j in range(3)])
        layers.append({
            "qkv": {"w": jnp.asarray(qkv_w, dtype),
                    "b": jnp.asarray(qkv_b, dtype)},
            "o": {"w": jnp.asarray(_t(sd, p + "self_attn.dense.weight"),
                                   dtype),
                  "b": jnp.asarray(_arr(sd, p + "self_attn.dense.bias"),
                                   dtype)},
            "q_norm": jnp.asarray(
                _arr(sd, p + "self_attn.q_layernorm.weight"), jnp.float32),
            "q_norm_b": jnp.asarray(
                _arr(sd, p + "self_attn.q_layernorm.bias"), jnp.float32),
            "k_norm": jnp.asarray(
                _arr(sd, p + "self_attn.k_layernorm.weight"), jnp.float32),
            "k_norm_b": jnp.asarray(
                _arr(sd, p + "self_attn.k_layernorm.bias"), jnp.float32),
            "gate_up": {"w": jnp.asarray(
                _t(sd, p + "mlp.dense_h_to_4h.weight"), dtype),
                "b": jnp.asarray(_arr(sd, p + "mlp.dense_h_to_4h.bias"),
                                 dtype)},
            "down": {"w": jnp.asarray(
                _t(sd, p + "mlp.dense_4h_to_h.weight"), dtype),
                "b": jnp.asarray(_arr(sd, p + "mlp.dense_4h_to_h.bias"),
                                 dtype)},
            "input_norm": jnp.asarray(
                _arr(sd, p + "input_layernorm.weight"), dtype),
            "input_norm_b": jnp.asarray(
                _arr(sd, p + "input_layernorm.bias"), dtype),
            "post_norm": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.weight"), dtype),
            "post_norm_b": jnp.asarray(
                _arr(sd, p + "post_attention_layernorm.bias"), dtype),
        })
    embed = _arr(sd, "model.embed_tokens.weight")
    from qspec_tpu.models.llama import pack_lm_head
    params = {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": pack_lm_head(
            np.asarray(sd.get("lm_head.weight", embed), np.float32).T,
            cfg, dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_arr(sd, "model.final_layernorm.weight"),
                                  dtype),
        "final_norm_b": jnp.asarray(_arr(sd, "model.final_layernorm.bias"),
                                    dtype),
    }
    return _finish(params, cfg, dtype)


def convert_fuyu(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Fuyu (reference models/fuyu.py): the persimmon trunk under a
    model.language_model.* prefix plus ``vision_embed_tokens`` — a LINEAR
    patch projector straight into LM hidden space (no vision tower); it
    lands at params["mm_projector"] for the generic patch mapper."""
    lm = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            lm["model." + k[len("model.language_model."):]] = v
        elif k.startswith("language_model.model."):       # classic layout
            lm["model." + k[len("language_model.model."):]] = v
        elif k in ("lm_head.weight", "language_model.lm_head.weight"):
            lm["lm_head.weight"] = v
    params = convert_persimmon(lm, cfg, dtype)
    vw = sd.get("model.vision_embed_tokens.weight",
                sd.get("vision_embed_tokens.weight"))
    if vw is not None:
        params["mm_projector"] = {
            "w": jnp.asarray(np.asarray(vw, np.float32).T, jnp.float32)}
        vb = sd.get("model.vision_embed_tokens.bias",
                    sd.get("vision_embed_tokens.bias"))
        if vb is not None:
            params["mm_projector"]["b"] = jnp.asarray(
                np.asarray(vb, np.float32))
    return params


CONVERTERS = {
    "nemotron": convert_nemotron,
    "fuyu": convert_fuyu,
    "olmo2": convert_olmo2,
    "granitemoe": convert_granitemoe,
    "dbrx": convert_dbrx,
    "persimmon": convert_persimmon,
    "gpt_bigcode": convert_gpt_bigcode,
    "opt": convert_opt,
    "deepseek": convert_deepseek,
    "deepseek_v2": convert_deepseek_v2,
    "deepseek_v3": convert_deepseek_v2,   # V3 = V2 keys + router bias
    "gpt2": convert_gpt2,
    "starcoder2": convert_starcoder2,
    "falcon": convert_falcon,
    "bloom": convert_bloom,
    "mpt": convert_mpt,
    "jais": convert_jais,
    "baichuan": convert_baichuan,
    "internlm2": convert_internlm2,
    "qwen": convert_qwen1,
    "exaone": convert_exaone,
    "telechat2": convert_telechat2,
    "chatglm": convert_chatglm,
    "stablelm": convert_stablelm,
    "gpt_neox": convert_gpt_neox,
    "phi": convert_phi,
    "gptj": convert_gptj,
    "cohere": convert_cohere,
    "olmo": convert_olmo,
}


def load_family_float(sd: Dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Convert a family state dict to (params, serving cfg)."""
    import dataclasses
    cfg = dataclasses.replace(cfg, quant="none", weightless_norm=False)
    fn = CONVERTERS.get(cfg.arch)
    if fn is None:
        raise ValueError(f"no family converter for arch {cfg.arch!r}")
    return fn(sd, cfg, dtype=dtype), cfg
