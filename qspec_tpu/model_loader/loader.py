"""Checkpoint ingestion: HF safetensors (float or QSpec-quantized) -> params.

TPU-native analogue of the reference's model loader + QSpec's hand-rolled
checkpoint path (vllm/model_executor/model_loader/loader.py:149;
vllm/worker/model_runner.py:1096-1190, which builds Quarot models directly
from safetensors with key remapping `o_proj.1.->o_proj.`,
`down_proj.0.->online_hadamard.` and fuses qkv / gate_up).

Three sources:
  * `load_hf_float`   — a standard HF Llama/Qwen2 float checkpoint ->
                        bf16 params (quant="none").
  * `quantize_float`  — same checkpoint -> QuaRot-rotated + int4-quantized
                        params (offline from_float path: fold norm gammas
                        into adjacent projections, apply the random Hadamard
                        basis rotation, per-channel symmetric quant). This is
                        what third-party/QuaRot's rotation + quarot_nn
                        from_float do offline for the reference.
  * `load_qspec`      — a reference-format QSpec safetensors checkpoint
                        (packed uint8 [out, in//2] + weight_scales) ->
                        repacked into our TPU layout.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig
from qspec_tpu.models.llama import make_hadamards, pack_lm_head, pack_proj_weight
from qspec_tpu.ops.hadamard import random_hadamard_matrix
from qspec_tpu.ops.packing import repack_from_reference
from qspec_tpu.ops.rotary import make_rope_cache


def _read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a file or a directory of *.safetensors."""
    try:
        from safetensors.numpy import load_file
    except ImportError:  # torch-only wheels: go through torch
        from safetensors.torch import load_file as _lf

        def load_file(p):
            return {k: v.float().numpy() for k, v in _lf(p).items()}

    tensors = {}
    if os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".safetensors"):
                tensors.update(load_file(os.path.join(path, fn)))
    else:
        tensors.update(load_file(path))
    return tensors


def config_from_hf_dir(path: str) -> ModelConfig:
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    if hf.get("architectures"):
        # architectures strings carry information model_type lacks (e.g.
        # BaiChuan vs Baichuan rope/alibi split) — route through the
        # registry when present
        from qspec_tpu.models.registry import resolve
        return resolve(hf)
    return ModelConfig.from_hf_config(hf)


def _common(cfg: ModelConfig, dtype=jnp.bfloat16):
    out = {"rope_cache": make_rope_cache(cfg.rotary_dim or cfg.head_dim,
                                         cfg.max_position_embeddings,
                                         cfg.rope_theta,
                                         rope_scaling=cfg.rope_scaling)}
    if cfg.rope_local_theta is not None:
        # gemma3: sliding layers rotate with the unscaled local theta
        out["rope_cache_local"] = make_rope_cache(
            cfg.rotary_dim or cfg.head_dim, cfg.max_position_embeddings,
            cfg.rope_local_theta)
    return out


def load_hf_float(path_or_sd, cfg: Optional[ModelConfig] = None,
                  dtype=jnp.bfloat16):
    """Standard float checkpoint (path or state-dict) -> bf16 params
    (quant='none')."""
    if isinstance(path_or_sd, dict):
        sd = path_or_sd
        assert cfg is not None
    else:
        if cfg is None:
            cfg = config_from_hf_dir(path_or_sd)
        sd = _read_safetensors(path_or_sd)
    cfg = ModelConfig(**{**cfg.__dict__, "quant": "none", "weightless_norm": False})
    if cfg.arch == "qwen2vl" and cfg.vision is not None:
        # Qwen2-VL checkpoint: visual.* tower (or model.visual.*) + qwen2
        # LM keys (model.* classic, model.language_model.* >= 4.52).
        # Reference: qwen2_vl.py load_weights + WeightsMapper.
        from qspec_tpu.models.qwen2vl_vit import convert_qwen2vl_tower
        lm_sd, vis_sd = {}, {}
        for k, v in sd.items():
            if k.startswith("visual."):
                vis_sd[k] = v
            elif k.startswith("model.visual."):
                vis_sd["visual." + k[len("model.visual."):]] = v
            elif k.startswith("model.language_model."):
                lm_sd["model." + k[len("model.language_model."):]] = v
            elif k == "lm_head.weight" or k.startswith("model."):
                lm_sd[k] = v
        tower = convert_qwen2vl_tower(vis_sd, cfg.vision, dtype=dtype)
        import dataclasses
        inner = dataclasses.replace(cfg, vision=None)
        params, inner = load_hf_float(lm_sd, inner, dtype=dtype)
        params.update(tower)
        return params, dataclasses.replace(inner, vision=cfg.vision)
    if cfg.arch == "idefics3" and cfg.vision is not None:
        # Idefics3/SmolVLM: model.vision_model.* (siglip layout, rebased
        # onto convert_llava_tower's expected prefix), model.connector
        # single bias-free linear, model.text_model.* llama trunk.
        # Reference: vllm/model_executor/models/idefics3.py load_weights.
        from qspec_tpu.models.vit import convert_llava_tower
        lm_sd, vis_sd = {}, {}
        for k, v in sd.items():
            if k.startswith("model.vision_model."):
                vis_sd["vision_tower.vision_model."
                       + k[len("model.vision_model."):]] = v
            elif k.startswith("model.text_model."):
                lm_sd["model." + k[len("model.text_model."):]] = v
            elif k == "lm_head.weight":
                lm_sd[k] = v
        tower = convert_llava_tower(vis_sd, cfg.vision)
        pw = sd["model.connector.modality_projection.proj.weight"]
        import dataclasses
        inner = dataclasses.replace(cfg, vision=None)
        params, inner = load_hf_float(lm_sd, inner, dtype=dtype)
        params.update(tower)
        params["mm_projector"] = {
            "w": jnp.asarray(np.asarray(pw, np.float32).T)}
        return params, dataclasses.replace(inner, vision=cfg.vision)
    if cfg.arch == "qwen2_audio" and cfg.audio is not None:
        # Qwen2-Audio: audio_tower.* (whisper-encoder layout) + one-linear
        # multi_modal_projector + language_model.* qwen2 trunk. Reference:
        # vllm/model_executor/models/qwen2_audio.py load_weights.
        from qspec_tpu.models.whisper import convert_audio_tower
        lm_sd = {}
        for k, v in sd.items():
            if k.startswith("language_model."):
                lm_sd[k[len("language_model."):]] = v
            elif k.startswith("model.language_model."):
                lm_sd["model." + k[len("model.language_model."):]] = v
            elif k == "lm_head.weight":
                lm_sd[k] = v
        tower = convert_audio_tower(sd, cfg.audio)
        mp = "multi_modal_projector.linear." \
            if "multi_modal_projector.linear.weight" in sd \
            else "model.multi_modal_projector.linear."
        import dataclasses
        inner = dataclasses.replace(cfg, audio=None)
        params, inner = load_hf_float(lm_sd, inner, dtype=dtype)
        params["audio_tower"] = tower
        params["mm_projector"] = {
            "w": jnp.asarray(np.asarray(sd[mp + "weight"], np.float32).T),
            "b": jnp.asarray(np.asarray(sd[mp + "bias"], np.float32))}
        return params, dataclasses.replace(inner, audio=cfg.audio)
    if cfg.arch in ("llava", "llava_next", "paligemma") \
            and cfg.vision is not None:
        # LLaVA/PaliGemma checkpoint: language_model.* prefixed LM keys
        # (classic) or model.language_model.* (transformers >= 4.52) +
        # vision tower + projector (models/vit.convert_llava_tower; the
        # paligemma branch loads post_layernorm + the single-linear
        # projector). Reference: vllm/model_executor/models/llava.py +
        # paligemma.py load_weights.
        from qspec_tpu.models.vit import convert_llava_tower
        lm_sd = {}
        for k, v in sd.items():
            if k.startswith("language_model."):
                lm_sd[k[len("language_model."):]] = v
            elif k.startswith("model.language_model."):
                lm_sd["model." + k[len("model.language_model."):]] = v
            elif k == "lm_head.weight":
                lm_sd[k] = v
        tower = convert_llava_tower(sd, cfg.vision)
        import dataclasses
        inner = dataclasses.replace(cfg, vision=None)  # break the recursion
        params, inner = load_hf_float(lm_sd, inner, dtype=dtype)
        params.update(tower)
        nl = sd.get("image_newline", sd.get("model.image_newline"))
        if nl is not None:
            # llava-next per-row newline embedding (pack_image_features)
            params["image_newline"] = jnp.asarray(np.asarray(nl, np.float32))
        return params, dataclasses.replace(inner, vision=cfg.vision)

    def t(name):
        return np.asarray(sd[name], np.float32).T

    def norm_w(name):
        # gemma RMSNorm is x * (offset + w): store gamma = offset + w so the
        # runtime norm stays standard (reference GemmaRMSNorm)
        w = np.asarray(sd[name], np.float32) + cfg.norm_weight_offset
        return jnp.asarray(w, dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        if p + "self_attn.qkv_proj.weight" in sd:
            # phi-3 ships fused projections (reference phi3.py reuses
            # llama with qkv_proj/gate_up_proj names)
            qkv = t(p + "self_attn.qkv_proj.weight")
        else:
            qkv = np.concatenate([t(p + "self_attn.q_proj.weight"),
                                  t(p + "self_attn.k_proj.weight"),
                                  t(p + "self_attn.v_proj.weight")], axis=1)
        layer = {
            "qkv": {"w": jnp.asarray(qkv, dtype)},
            "o": {"w": jnp.asarray(t(p + "self_attn.o_proj.weight"), dtype)},
            "input_norm": norm_w(p + "input_layernorm.weight"),
            # gemma2 (post_norms): the MLP pre-norm is
            # pre_feedforward_layernorm; post_attention_layernorm becomes
            # the attention block's POST-norm (models/llama.decoder_layer)
            "post_norm": norm_w(
                p + ("pre_feedforward_layernorm.weight" if cfg.post_norms
                     else "post_attention_layernorm.weight")),
        }
        if cfg.norm_type == "layernorm" and \
                p + "input_layernorm.bias" in sd:
            # biased-LayerNorm llama-keyed families (PhiMoE, Orion)
            layer["input_norm_b"] = jnp.asarray(
                sd[p + "input_layernorm.bias"], dtype)
            layer["post_norm_b"] = jnp.asarray(
                sd[p + "post_attention_layernorm.bias"], dtype)
        if cfg.post_norms:
            layer["post_attn_norm"] = norm_w(
                p + "post_attention_layernorm.weight")
            layer["post_ffw_norm"] = norm_w(
                p + "post_feedforward_layernorm.weight")
        if cfg.num_experts:
            if f"{p}mlp.experts.0.gate_proj.weight" in sd:
                # qwen2-moe naming: mlp.gate + experts.{e}.gate/up/down_proj
                # + always-on shared expert (reference qwen2_moe.py)
                m = p + "mlp."
                layer["router"] = jnp.asarray(t(m + "gate.weight"), dtype)
                gu = [np.concatenate(
                    [t(f"{m}experts.{e}.gate_proj.weight"),
                     t(f"{m}experts.{e}.up_proj.weight")], axis=1)
                    for e in range(cfg.num_experts)]
                dn = [t(f"{m}experts.{e}.down_proj.weight")
                      for e in range(cfg.num_experts)]
                if cfg.shared_expert_intermediate_size:
                    s = m + "shared_expert."
                    layer["shared_gate_up"] = {"w": jnp.asarray(
                        np.concatenate([t(s + "gate_proj.weight"),
                                        t(s + "up_proj.weight")], axis=1),
                        dtype)}
                    layer["shared_down"] = {"w": jnp.asarray(
                        t(s + "down_proj.weight"), dtype)}
                    layer["shared_gate"] = jnp.asarray(
                        t(m + "shared_expert_gate.weight"), dtype)
            else:
                # Mixtral naming: block_sparse_moe.gate + experts.{e}.w1/w3/w2
                # (w1=gate, w3=up, w2=down — reference mixtral.py)
                m = p + "block_sparse_moe."
                layer["router"] = jnp.asarray(t(m + "gate.weight"), dtype)
                gu = [np.concatenate([t(f"{m}experts.{e}.w1.weight"),
                                      t(f"{m}experts.{e}.w3.weight")], axis=1)
                      for e in range(cfg.num_experts)]
                dn = [t(f"{m}experts.{e}.w2.weight")
                      for e in range(cfg.num_experts)]
            layer["experts_gate_up"] = {"w": jnp.asarray(np.stack(gu), dtype)}
            layer["experts_down"] = {"w": jnp.asarray(np.stack(dn), dtype)}
        else:
            if p + "mlp.gate_up_proj.weight" in sd:
                gate_up = t(p + "mlp.gate_up_proj.weight")   # phi-3 fused
            elif not cfg.mlp_gated:
                # non-gated fc MLP with llama naming (arcee/nemotron
                # up_proj -> act -> down_proj)
                gate_up = t(p + "mlp.up_proj.weight")
            else:
                gate_up = np.concatenate([t(p + "mlp.gate_proj.weight"),
                                          t(p + "mlp.up_proj.weight")],
                                         axis=1)
            layer["gate_up"] = {"w": jnp.asarray(gate_up, dtype)}
            layer["down"] = {"w": jnp.asarray(t(p + "mlp.down_proj.weight"),
                                              dtype)}
        if cfg.qkv_bias:
            b = np.concatenate([sd[p + "self_attn.q_proj.bias"],
                                sd[p + "self_attn.k_proj.bias"],
                                sd[p + "self_attn.v_proj.bias"]])
            layer["qkv"]["b"] = jnp.asarray(b, dtype)
        if p + "self_attn.o_proj.bias" in sd:
            # phimoe attention_bias also biases o_proj
            layer["o"]["b"] = jnp.asarray(sd[p + "self_attn.o_proj.bias"],
                                          dtype)
        if "down" in layer and p + "mlp.down_proj.bias" in sd:
            # telechat2 biases down_proj (and o) only
            layer["down"]["b"] = jnp.asarray(sd[p + "mlp.down_proj.bias"],
                                             dtype)
        if cfg.qk_norm:
            # qwen3 per-head q/k norms ([head_dim] gammas); chameleon's
            # head_ln carries per-head [num_heads, head_dim] affine+bias
            layer["q_norm"] = norm_w(p + "self_attn.q_norm.weight")
            layer["k_norm"] = norm_w(p + "self_attn.k_norm.weight")
            if cfg.qk_norm_style == "head_ln":
                def _nb(name, like):
                    if name in sd:
                        return jnp.asarray(sd[name], dtype)
                    return jnp.zeros_like(like)
                layer["q_norm_b"] = _nb(p + "self_attn.q_norm.bias",
                                        layer["q_norm"])
                layer["k_norm_b"] = _nb(p + "self_attn.k_norm.bias",
                                        layer["k_norm"])
        layers.append(layer)

    lm_head = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"], dtype),
        "lm_head": jnp.asarray(np.asarray(lm_head, np.float32).T, dtype),
        "final_norm": norm_w("model.norm.weight"),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        **_common(cfg),
    }
    if "model.norm.bias" in sd:
        params["final_norm_b"] = jnp.asarray(sd["model.norm.bias"], dtype)
    if cfg.lm_head_bias and "lm_head.bias" in sd:
        params["lm_head_b"] = jnp.asarray(sd["lm_head.bias"], jnp.float32)
    return params, cfg


def _score_head(sd, xform):
    """Extract an HF sequence-classification / reward head if present;
    xform maps the FIRST layer's [H, ...] weight into the model's
    final-hidden basis (QuaRot rotation).

    Shapes served: single linear ("score.weight" llama-style /
    "classifier.weight" bert-style / "v_head.weight" InternLM2-reward),
    and the Qwen2 reward stack nn.Sequential(Linear, ReLU, Linear)
    ("score.0.weight" / "score.2.weight", reference models/qwen2_rm.py) —
    stored as {"w1","b1","act","w","b"} and applied by
    entrypoints.llm.cross_encoder_score."""
    for key in ("score.weight", "classifier.weight", "v_head.weight"):
        if key in sd:
            w = np.asarray(sd[key], np.float32).T  # [H, num_labels]
            head = {"w": jnp.asarray(xform(w), jnp.float32)}
            bkey = key[:-6] + "bias"
            if bkey in sd:
                head["b"] = jnp.asarray(np.asarray(sd[bkey], np.float32))
            return head
    if "score.0.weight" in sd:
        head = {"w1": jnp.asarray(
            xform(np.asarray(sd["score.0.weight"], np.float32).T),
            jnp.float32),
            "act": jnp.asarray(0, jnp.int32),  # 0 = relu (1 = tanh)
            "w": jnp.asarray(np.asarray(sd["score.2.weight"], np.float32).T,
                             jnp.float32)}
        if "score.0.bias" in sd:
            head["b1"] = jnp.asarray(np.asarray(sd["score.0.bias"],
                                                np.float32))
        if "score.2.bias" in sd:
            head["b"] = jnp.asarray(np.asarray(sd["score.2.bias"],
                                               np.float32))
        return head
    return None


def quantize_float(path_or_sd, cfg: Optional[ModelConfig] = None,
                   tp_size: int = 1, seed: int = 0, dtype=jnp.bfloat16,
                   bits: Optional[int] = 4):
    """Offline QuaRot rotation + int4 quantization of a float checkpoint.

    Reproduces the reference's offline pipeline (third-party/QuaRot
    rotation_utils: fuse layernorms into adjacent weights, rotate the
    residual stream by a random orthonormal Hadamard Q, rotate o_proj rows /
    v weights by per-head and mlp Hadamards) so the *online* Hadamards in the
    model undo them around the quantized activations.

    Rotations applied (residual basis Q = random_hadamard(H)):
      embed       <- embed @ Q
      qkv         <- (gamma_in * W_qkv) rows rotated: Q^T @ W
      o_proj      <- Q-out: W_o @ Q, and H_heads-in on its input
      gate/up     <- Q^T @ (gamma_post * W)
      down        <- (H_I^T @ W_down) @ Q
      lm_head     <- Q^T @ (gamma_final * W_lm)
    """
    if isinstance(path_or_sd, dict):
        sd = path_or_sd
        assert cfg is not None
    else:
        if cfg is None:
            cfg = config_from_hf_dir(path_or_sd)
        sd = _read_safetensors(path_or_sd)
    from qspec_tpu.model_loader.families import LLAMA_KEY_REMAPS
    if cfg.arch in LLAMA_KEY_REMAPS:
        # baichuan/internlm2 ARE the llama graph under other key names:
        # remap, then the full QuaRot rotate+quantize pipeline applies
        sd = LLAMA_KEY_REMAPS[cfg.arch](sd, cfg)
    if cfg.post_norms:
        raise ValueError(
            "QuaRot rotation folds norm gammas into adjacent projections; "
            "gemma2's post-block norms break that adjacency — serve gemma2 "
            "as bf16 (load_hf_float) or grouped int4 (AWQ/GPTQ)")
    cfg = ModelConfig(**{**cfg.__dict__, "quant": "w4", "weightless_norm": True})

    H, I = cfg.hidden_size, cfg.intermediate_size
    Q = random_hadamard_matrix(H, seed=seed).astype(np.float32)
    H_heads = (np.asarray(__import__("qspec_tpu.ops.hadamard", fromlist=["hadamard_matrix"])
                          .hadamard_matrix(cfg.num_heads), np.float32)
               / math.sqrt(cfg.num_heads))
    from qspec_tpu.ops.hadamard import decompose_dim, hadamard_matrix

    def _mk_HI(width):
        K_f, P_f = decompose_dim(width)
        return np.kron(hadamard_matrix(K_f), hadamard_matrix(P_f)
                       ).astype(np.float32) / math.sqrt(width)

    # MLP hadamard width: the dense MLP's, or the MoE experts'
    H_I = _mk_HI(cfg.expert_intermediate_size if cfg.num_experts else I)
    H_S = (_mk_HI(cfg.shared_expert_intermediate_size)
           if cfg.shared_expert_intermediate_size else None)

    def t(name):
        return np.asarray(sd[name], np.float32).T  # [in, out]

    def g(name):
        return np.asarray(sd[name], np.float32)

    def gnorm(name):
        # gemma (1 + w) norms: fold the offset along with the gamma
        return g(name) + cfg.norm_weight_offset

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        gin = gnorm(p + "input_layernorm.weight")
        gpost = gnorm(p + "post_attention_layernorm.weight")

        # fold gamma into the input side, rotate input basis by Q
        if p + "self_attn.qkv_proj.weight" in sd:   # phi-3 fused layout
            qkv = Q.T @ (gin[:, None] * t(p + "self_attn.qkv_proj.weight"))
        else:
            q_w = Q.T @ (gin[:, None] * t(p + "self_attn.q_proj.weight"))
            k_w = Q.T @ (gin[:, None] * t(p + "self_attn.k_proj.weight"))
            v_w = Q.T @ (gin[:, None] * t(p + "self_attn.v_proj.weight"))
            qkv = np.concatenate([q_w, k_w, v_w], axis=1)

        # o_proj: input side per-head Hadamard (the online head rotation is
        # H_heads applied across heads for each dim slot); output side Q
        o_w = t(p + "self_attn.o_proj.weight")  # [Hq*D, H]
        o_w = o_w.reshape(cfg.num_heads, cfg.head_dim, H)
        o_w = np.einsum("jh,hdk->jdk", H_heads, o_w)  # undo online H_heads
        o_w = o_w.reshape(cfg.num_heads * cfg.head_dim, H) @ Q

        quant_kind = "w4" if bits == 4 else "none"
        layer = {
            "qkv": pack_proj_weight(qkv, quant_kind, col_blocks=(cfg.q_size, cfg.kv_size,
                                                                 cfg.kv_size),
                                    tp_size=tp_size, dtype=dtype,
                                    bias=None if not cfg.qkv_bias else
                                    np.concatenate([g(p + "self_attn.q_proj.bias"),
                                                    g(p + "self_attn.k_proj.bias"),
                                                    g(p + "self_attn.v_proj.bias")])),
            "o": pack_proj_weight(o_w, quant_kind, shard_in=True, tp_size=tp_size, dtype=dtype),
        }
        if cfg.num_experts:
            # MoE: identical QuaRot algebra per expert (gate/up take the
            # Q-rotated, gamma-folded input; down rows get H_I, output
            # rotated by Q); the router reads the same rotated hidden
            qwen_moe = f"{p}mlp.experts.0.gate_proj.weight" in sd
            m = p + ("mlp." if qwen_moe else "block_sparse_moe.")
            names = (("gate_proj", "up_proj", "down_proj") if qwen_moe
                     else ("w1", "w3", "w2"))
            layer["router"] = jnp.asarray(
                Q.T @ (gpost[:, None] * t(m + "gate.weight")), dtype)
            Ie = cfg.expert_intermediate_size
            gu_list, dn_list = [], []
            for e in range(cfg.num_experts):
                gate = Q.T @ (gpost[:, None]
                              * t(f"{m}experts.{e}.{names[0]}.weight"))
                up = Q.T @ (gpost[:, None]
                            * t(f"{m}experts.{e}.{names[1]}.weight"))
                dn = (H_I @ t(f"{m}experts.{e}.{names[2]}.weight")) @ Q
                # experts pack whole (tp_size=1): parallelism is EP over the
                # expert dim, not TP inside one expert
                gu_list.append(pack_proj_weight(
                    np.concatenate([gate, up], axis=1), quant_kind,
                    col_blocks=(Ie, Ie), dtype=dtype))
                dn_list.append(pack_proj_weight(dn, quant_kind,
                                                shard_in=True, dtype=dtype))
            layer["experts_gate_up"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *gu_list)
            layer["experts_down"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *dn_list)
            if cfg.shared_expert_intermediate_size:
                s = m + "shared_expert."
                Is = cfg.shared_expert_intermediate_size
                sg = Q.T @ (gpost[:, None] * t(s + "gate_proj.weight"))
                su = Q.T @ (gpost[:, None] * t(s + "up_proj.weight"))
                sdn = (H_S @ t(s + "down_proj.weight")) @ Q
                layer["shared_gate_up"] = pack_proj_weight(
                    np.concatenate([sg, su], axis=1), quant_kind,
                    col_blocks=(Is, Is), dtype=dtype)
                layer["shared_down"] = pack_proj_weight(sdn, quant_kind,
                                                        shard_in=True,
                                                        dtype=dtype)
                # the sigmoid gate reads the same post-norm hidden as the
                # router: fold gamma_post and rotate like the router rows
                layer["shared_gate"] = jnp.asarray(
                    Q.T @ (gpost[:, None]
                           * t(m + "shared_expert_gate.weight")), dtype)
        else:
            if p + "mlp.gate_up_proj.weight" in sd:   # phi-3 fused layout
                gate_up = Q.T @ (gpost[:, None]
                                 * t(p + "mlp.gate_up_proj.weight"))
            else:
                gate = Q.T @ (gpost[:, None] * t(p + "mlp.gate_proj.weight"))
                up = Q.T @ (gpost[:, None] * t(p + "mlp.up_proj.weight"))
                gate_up = np.concatenate([gate, up], axis=1)

            # online transform acts as y_row = a_row @ H_I^T, so the weight
            # gets the un-transposed H_I (matters for non-symmetric Paley
            # factors, e.g. H_28 in llama's 14336 = 28 * 512)
            down = (H_I @ t(p + "mlp.down_proj.weight")) @ Q
            layer["gate_up"] = pack_proj_weight(gate_up, quant_kind,
                                                col_blocks=(I, I),
                                                tp_size=tp_size, dtype=dtype)
            layer["down"] = pack_proj_weight(down, quant_kind, shard_in=True,
                                             tp_size=tp_size, dtype=dtype)
        if cfg.qk_norm:
            # qwen3 q/k norms sit AFTER the (rotated) projection in the
            # per-head basis, which the residual rotation never touches:
            # the gammas carry through the QuaRot pipeline unchanged
            layer["q_norm"] = jnp.asarray(
                gnorm(p + "self_attn.q_norm.weight"), dtype)
            layer["k_norm"] = jnp.asarray(
                gnorm(p + "self_attn.k_norm.weight"), dtype)
        layers.append(layer)

    gfin = gnorm("model.norm.weight")
    lm = np.asarray(sd.get("lm_head.weight", sd["model.embed_tokens.weight"]),
                    np.float32).T  # [H, V]
    params = {
        "embed": jnp.asarray(np.asarray(sd["model.embed_tokens.weight"],
                                        np.float32) @ Q, dtype),
        "lm_head": pack_lm_head(Q.T @ (gfin[:, None] * lm), cfg, dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "hadamards": make_hadamards(cfg),
        **_common(cfg),
    }
    # cross-encoder classification head (reference cross-encoder classes,
    # models/registry.py:142-150): like lm_head, the head consumes the
    # final hidden, so it picks up the folded final-norm gamma and the
    # residual rotation (w' = Q^T (gamma * w))
    head = _score_head(sd, lambda w: Q.T @ (gfin[:, None] * w))
    if head is not None:
        params["score_head"] = head
        cfg = dataclasses.replace(cfg,
                                  num_labels=int(head["w"].shape[1]))
    return params, cfg


def load_qspec(path: str, cfg: Optional[ModelConfig] = None, tp_size: int = 1,
               dtype=jnp.bfloat16):
    """Reference-format QSpec checkpoint (packed int4 + scales) -> our layout.

    Handles the reference's key remapping (worker/model_runner.py:1139,1181):
    `o_proj.1.` -> o_proj (Sequential[quantizer, linear]), `down_proj.0.` ->
    online hadamard (dropped — our hadamards are constructed).
    """
    if cfg is None:
        cfg = config_from_hf_dir(path)
    cfg = ModelConfig(**{**cfg.__dict__, "quant": "w4", "weightless_norm": True})
    sd = _read_safetensors(path)

    def remap(key):
        return key.replace("o_proj.1.", "o_proj.").replace("down_proj.1.", "down_proj.")

    sd = {remap(k): v for k, v in sd.items()}

    def qproj(prefix, col_blocks=None, shard_in=False):
        w = np.asarray(sd[prefix + ".weight"], np.uint8)       # [out, in//2]
        scales = np.asarray(sd[prefix + ".weight_scales"], np.float32).reshape(-1)
        packed = repack_from_reference(w)                      # our [in//2, out]
        if tp_size > 1:
            # repack respecting TP layout rules via unpack->pack_proj path
            from qspec_tpu.ops.packing import unpack_int4_np
            wf = unpack_int4_np(packed).astype(np.float32) * scales[None, :]
            return pack_proj_weight(wf, "w4", shard_in=shard_in,
                                    col_blocks=col_blocks, tp_size=tp_size,
                                    dtype=dtype)
        return {"qw": jnp.asarray(packed), "qs": jnp.asarray(scales)}

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        if p + "self_attn.qkv_proj.weight" in sd:
            qkv = qproj(p + "self_attn.qkv_proj",
                        col_blocks=(cfg.q_size, cfg.kv_size, cfg.kv_size))
        else:
            parts = [qproj(p + f"self_attn.{n}_proj") for n in ("q", "k", "v")]
            qkv = {"qw": jnp.concatenate([x["qw"] for x in parts], axis=1),
                   "qs": jnp.concatenate([x["qs"] for x in parts])}
        layer = {
            "qkv": qkv,
            "o": qproj(p + "self_attn.o_proj", shard_in=True),
            "gate_up": (qproj(p + "mlp.gate_up_proj", col_blocks=(cfg.intermediate_size,
                                                                  cfg.intermediate_size))
                        if p + "mlp.gate_up_proj.weight" in sd else
                        {"qw": jnp.concatenate([qproj(p + "mlp.gate_proj")["qw"],
                                                qproj(p + "mlp.up_proj")["qw"]], axis=1),
                         "qs": jnp.concatenate([qproj(p + "mlp.gate_proj")["qs"],
                                                qproj(p + "mlp.up_proj")["qs"]])}),
            "down": qproj(p + "mlp.down_proj", shard_in=True),
        }
        layers.append(layer)

    lm = np.asarray(sd.get("lm_head.weight", sd["model.embed_tokens.weight"]),
                    np.float32).T
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"], dtype),
        "lm_head": pack_lm_head(lm, cfg, dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "hadamards": make_hadamards(cfg),
        **_common(cfg),
    }
    head = _score_head(sd, lambda w: w)
    if head is not None:
        params["score_head"] = head
        cfg = dataclasses.replace(cfg,
                                  num_labels=int(head["w"].shape[1]))
    return params, cfg
