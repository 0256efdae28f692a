"""Model registry (reference: vllm/model_executor/models/registry.py:190).

Maps HF architecture names to (family, config translator). The decoder
families here all share the llama.py compute graph — qwen2 is llama with
attention bias and its own dims (the reference similarly subclasses its
QuaRot Qwen2 from the Llama modules, vllm/model_executor/models/
qwen2_quarot.py).
"""

from __future__ import annotations

from typing import Callable, Dict

from qspec_tpu.config import ModelConfig

_REGISTRY: Dict[str, Callable[[dict], ModelConfig]] = {}


def register(arch: str):
    def deco(fn):
        _REGISTRY[arch] = fn
        return fn
    return deco


@register("LlamaForCausalLM")
@register("QuarotLlamaForCausalLM")
@register("llama_quarot")
def _llama(hf: dict) -> ModelConfig:
    return ModelConfig.from_hf_config(hf)


@register("Qwen2ForCausalLM")
@register("Qwen2QuaRotForCausalLM")
@register("qwen2_quarot")
def _qwen2(hf: dict) -> ModelConfig:
    cfg = ModelConfig.from_hf_config(hf)
    return ModelConfig(**{**cfg.__dict__, "arch": "qwen2", "qkv_bias": True})


@register("MistralForCausalLM")
def _mistral(hf: dict) -> ModelConfig:
    return ModelConfig.from_hf_config(hf)


@register("GemmaForCausalLM")
@register("gemma")
def _gemma(hf: dict) -> ModelConfig:
    # gemma specifics handled by from_hf_config: GeGLU (gelu_tanh),
    # sqrt(hidden) embedding scale, (1+w) norms (folded at load),
    # tied lm_head, head_dim 256 (reference
    # vllm/model_executor/models/gemma.py)
    hf = {**hf, "model_type": "gemma"}
    return ModelConfig.from_hf_config(hf)


@register("Gemma2ForCausalLM")
@register("gemma2")
def _gemma2(hf: dict) -> ModelConfig:
    # gemma2: alternating sliding/global attention, attention + final logit
    # softcapping, query_pre_attn_scalar scale, post-block norms
    # (reference vllm/model_executor/models/gemma2.py); serves bf16 or
    # grouped-int4 (AWQ/GPTQ) — the QuaRot pipeline's gamma folding does
    # not compose with the post-block norms
    hf = {**hf, "model_type": "gemma2"}
    return ModelConfig.from_hf_config(hf)


@register("Gemma3ForCausalLM")
@register("Gemma3TextModel")
@register("gemma3")
@register("gemma3_text")
def _gemma3(hf: dict) -> ModelConfig:
    # gemma3 (reference models/gemma3.py): gemma2's pre+post norms and
    # GeGLU, per-head q/k RMSNorm ((1+w), folded at load), every 6th
    # layer GLOBAL with the scaled base theta while sliding layers use a
    # second rope cache at rope_local_base_freq; no softcaps.
    import math
    H = hf["hidden_size"]
    nh = hf.get("num_attention_heads", 8)
    return ModelConfig(
        arch="gemma3",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"], num_heads=nh,
        num_kv_heads=hf.get("num_key_value_heads", nh),
        head_dim=hf.get("head_dim", 256),
        rope_theta=hf.get("rope_theta", 1_000_000.0),
        rope_scaling=hf.get("rope_scaling"),
        rope_local_theta=hf.get("rope_local_base_freq", 10_000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
        sliding_window=hf.get("sliding_window", 4096),
        sliding_window_pattern=hf.get("sliding_window_pattern")
        or hf.get("_sliding_window_pattern", 6),
        sliding_global_every=True,
        qk_norm=True, post_norms=True,
        hidden_act="gelu_tanh",
        embed_scale=math.sqrt(H),
        norm_weight_offset=1.0,
        query_pre_attn_scalar=hf.get("query_pre_attn_scalar", 256),
        tie_word_embeddings=True,
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("MixtralForCausalLM")
@register("mixtral")
def _mixtral(hf: dict) -> ModelConfig:
    # sparse-MoE MLP (num_local_experts / num_experts_per_tok picked up by
    # from_hf_config); attention identical to llama/mistral
    return ModelConfig.from_hf_config(hf)


@register("Phi3ForCausalLM")
@register("phi3")
def _phi3(hf: dict) -> ModelConfig:
    # phi-3 reuses the llama graph with fused qkv_proj / gate_up_proj
    # checkpoint names (handled by the loaders) and longrope scaling for
    # the 128k variants (ops/rotary.make_rope_cache; per-position
    # short/long factor selection like vllm's
    # Phi3LongRoPEScaledRotaryEmbedding); no biases, silu MLP (reference
    # vllm/model_executor/models/phi3.py)
    return ModelConfig.from_hf_config(hf)


@register("Qwen3ForCausalLM")
@register("qwen3")
def _qwen3(hf: dict) -> ModelConfig:
    # qwen3: per-head q/k RMSNorm before rope (qk_norm), no attention bias,
    # explicit head_dim (reference vllm/model_executor/models/qwen3.py)
    hf = {**hf, "model_type": "qwen3"}
    return ModelConfig.from_hf_config(hf)


@register("Qwen3MoeForCausalLM")
@register("qwen3_moe")
def _qwen3_moe(hf: dict) -> ModelConfig:
    # qwen3-moe: qwen3 attention (qk-norm) + qwen2-moe-style routing
    # (softmax over all experts -> top-k -> norm_topk_prob renorm) with no
    # shared expert (reference vllm/model_executor/models/qwen3_moe.py)
    hf = {**hf, "model_type": "qwen3_moe"}
    return ModelConfig.from_hf_config(hf)


@register("GraniteForCausalLM")
@register("granite")
def _granite(hf: dict) -> ModelConfig:
    # granite: llama graph + four scalar multipliers — embedding_multiplier
    # (embed_scale), attention_multiplier (query_pre_attn_scalar**-0.5),
    # residual_multiplier (block outputs), logits_scaling (final logits
    # divisor); tied lm_head (reference vllm/model_executor/models/
    # granite.py GraniteForCausalLM)
    hf = {**hf, "model_type": "granite"}
    return ModelConfig.from_hf_config(hf)


@register("PersimmonForCausalLM")
@register("persimmon")
def _persimmon(hf: dict) -> ModelConfig:
    # Persimmon/Fuyu-base (reference models/persimmon.py): LayerNorm
    # norms + per-head q/k LayerNorm (head_ln), relu^2 fc MLP, partial
    # rotary, interleaved fused qkv (de-interleaved at conversion).
    H = hf["hidden_size"]
    nh = hf["num_attention_heads"]
    hd = H // nh
    return ModelConfig(
        arch="persimmon",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"], num_heads=nh,
        num_kv_heads=nh, head_dim=hd,
        rope_theta=hf.get("rope_theta", 25000.0),
        rotary_dim=int(hf.get("partial_rotary_factor", 0.5) * hd),
        rms_norm_eps=hf.get("layer_norm_eps", 1e-5),
        max_position_embeddings=hf.get("max_position_embeddings", 16384),
        qk_norm=bool(hf.get("qk_layernorm", True)),
        qk_norm_style="head_ln",
        hidden_act="relu2", mlp_gated=False, norm_type="layernorm",
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("ChameleonForConditionalGeneration")
@register("ChameleonForCausalLM")
@register("chameleon")
def _chameleon(hf: dict) -> ModelConfig:
    # Chameleon (reference models/chameleon.py): EARLY-FUSION multimodal —
    # images are VQ-VAE codebook tokens in the same vocab, so the text
    # trunk is the llama graph + per-head q/k LayerNorm with bias
    # ([num_heads, head_dim] affine, applied before rope — the same
    # head_ln style as persimmon but with per-head gammas). swin_norm
    # (30B) moves ALL norms after the blocks (OLMo2's layout). Text
    # serving is complete; image INPUT needs the VQ-VAE encoder the
    # reference embeds (ChameleonVQVAE) — not implemented, so prompts are
    # token-level (pre-quantized image tokens work verbatim).
    H = hf["hidden_size"]
    nh = hf["num_attention_heads"]
    swin = bool(hf.get("swin_norm", False))
    return ModelConfig(
        arch="chameleon",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"], num_heads=nh,
        num_kv_heads=hf.get("num_key_value_heads", nh),
        head_dim=H // nh,
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        qk_norm=True, qk_norm_style="head_ln",
        pre_norms=not swin, post_norms=swin,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        quant="none", weightless_norm=False)


@register("FuyuForCausalLM")
@register("fuyu")
def _fuyu(hf: dict) -> ModelConfig:
    # Fuyu-8b (reference models/fuyu.py): NO vision tower — raw
    # patch_size^2*3 pixel patches project through ONE linear
    # (vision_embed_tokens) straight into the persimmon trunk's embedding
    # space (the decoder-only VLM convention). Patch flatten order is
    # (py, px, c), exactly multimodal.patch_projector_mapper's layout.
    import dataclasses

    from qspec_tpu.config import VisionConfig
    # classic checkpoints keep the persimmon fields top-level; newer
    # transformers nests them under text_config
    base = _persimmon({**hf, **(hf.get("text_config") or {})})
    vc = VisionConfig(image_size=hf.get("image_size", 300),
                      patch_size=hf.get("patch_size", 30),
                      tower="linear")
    return dataclasses.replace(
        base, arch="fuyu", vision=vc,
        image_token_id=hf.get("image_token_id", 71011))


@register("DbrxForCausalLM")
@register("dbrx")
def _dbrx(hf: dict) -> ModelConfig:
    # DBRX (reference models/dbrx.py): fused-slab MoE with clip_qkv and
    # bias-free LayerNorms; p=1 routing == mixtral's renormalized topk.
    H = hf["d_model"]
    nh = hf["n_heads"]
    attn = hf.get("attn_config") or {}
    ffn = hf.get("ffn_config") or {}
    norm_p = ffn.get("moe_normalize_expert_weights", 1)
    return ModelConfig(
        arch="dbrx",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=ffn.get("ffn_hidden_size", 4 * H),
        moe_intermediate_size=ffn.get("ffn_hidden_size", 4 * H),
        num_layers=hf["n_layers"], num_heads=nh,
        num_kv_heads=attn.get("kv_n_heads", nh), head_dim=H // nh,
        rope_theta=attn.get("rope_theta", 500000.0),
        clip_qkv=attn.get("clip_qkv"),
        num_experts=ffn.get("moe_num_experts", 16),
        num_experts_per_tok=ffn.get("moe_top_k", 4),
        moe_softmax_before_topk=norm_p is None,
        max_position_embeddings=hf.get("max_seq_len", 32768),
        norm_type="layernorm",
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("GraniteMoeForCausalLM")
@register("granitemoe")
def _granitemoe(hf: dict) -> ModelConfig:
    # GraniteMoe (reference models/granitemoe.py): granite multipliers +
    # fused-expert MoE riding the mixtral routing semantics.
    import dataclasses
    base = ModelConfig.from_hf_config({**hf, "model_type": "granite"})
    return dataclasses.replace(
        base, arch="granitemoe",
        num_experts=hf.get("num_local_experts", 8),
        num_experts_per_tok=hf.get("num_experts_per_tok", 2))


@register("Qwen2MoeForCausalLM")
@register("qwen2_moe")
def _qwen2_moe(hf: dict) -> ModelConfig:
    # qwen2-moe: softmax-before-topk router, optional topk renorm, and an
    # always-on sigmoid-gated shared expert (reference
    # vllm/model_executor/models/qwen2_moe.py)
    hf = {**hf, "model_type": "qwen2_moe"}
    return ModelConfig.from_hf_config(hf)


@register("OPTForCausalLM")
@register("opt")
def _opt(hf: dict) -> ModelConfig:
    # OPT: learned +2-offset positions, pre-LayerNorm, ReLU fc MLP, biases
    # everywhere, tied head (reference vllm/model_executor/models/opt.py)
    hf = {**hf, "model_type": "opt"}
    return ModelConfig.from_hf_config(hf)


@register("GPT2LMHeadModel")
@register("gpt2")
def _gpt2(hf: dict) -> ModelConfig:
    # GPT-2: Conv1D checkpoint orientation, wpe learned positions,
    # gelu_new fc MLP, fused c_attn (reference models/gpt2.py)
    hf = {**hf, "model_type": "gpt2"}
    return ModelConfig.from_hf_config(hf)


@register("Starcoder2ForCausalLM")
@register("starcoder2")
def _starcoder2(hf: dict) -> ModelConfig:
    # starcoder2: LayerNorm + biases + non-gated gelu c_fc/c_proj MLP with
    # rope and GQA (reference models/starcoder2.py)
    hf = {**hf, "model_type": "starcoder2"}
    return ModelConfig.from_hf_config(hf)


@register("FalconForCausalLM")
@register("RWForCausalLM")
@register("falcon")
def _falcon(hf: dict) -> ModelConfig:
    # falcon: fused query_key_value, MQA/new-decoder GQA; 7B/40B lineage =
    # parallel blocks + rope, falcon-rw lineage = sequential pre-LN blocks
    # + ALiBi + biases (reference models/falcon.py _get_alibi_slopes)
    hf = {**hf, "model_type": "falcon"}
    return ModelConfig.from_hf_config(hf)


@register("BloomForCausalLM")
@register("bloom")
def _bloom(hf: dict) -> ModelConfig:
    # BLOOM (reference models/bloom.py): ALiBi, LayerNorm + biases,
    # embedding LayerNorm, head-interleaved fused query_key_value,
    # non-gated tanh-gelu MLP, tied lm_head
    hf = {**hf, "model_type": "bloom"}
    return ModelConfig.from_hf_config(hf)


@register("MPTForCausalLM")
@register("MptForCausalLM")
@register("mpt")
def _mpt(hf: dict) -> ModelConfig:
    # MPT (reference models/mpt.py): ALiBi, bias-free LayerNorm (no_bias),
    # fused Wqkv, non-gated gelu MLP, tied embeddings
    hf = {**hf, "model_type": "mpt"}
    return ModelConfig.from_hf_config(hf)


@register("JAISLMHeadModel")
@register("jais")
def _jais(hf: dict) -> ModelConfig:
    # JAIS (reference models/jais.py): GPT-2 skeleton + ALiBi + gated
    # swiglu MLP + muP scaling (embeddings_scale / width_scale /
    # scale_qk_dot_by_d)
    hf = {**hf, "model_type": "jais"}
    return ModelConfig.from_hf_config(hf)


@register("BaiChuanForCausalLM")   # 7B (rope)
@register("baichuan")
def _baichuan(hf: dict) -> ModelConfig:
    # baichuan-7B: llama graph + fused W_pack qkv (reference
    # models/baichuan.py BaiChuanForCausalLM, position_embedding="ROPE")
    hf = {**hf, "model_type": "baichuan"}
    return ModelConfig.from_hf_config(hf)


@register("BaichuanForCausalLM")   # 13B (alibi)
def _baichuan13(hf: dict) -> ModelConfig:
    # the reference distinguishes 7B/13B by the architecture string's
    # capital C (models/baichuan.py): 13B is the same W_pack llama graph
    # with ALiBi instead of rope
    hf = {**hf, "model_type": "baichuan", "_alibi": True}
    return ModelConfig.from_hf_config(hf)


@register("InternLM2ForCausalLM")
@register("InternLM2VEForCausalLM")   # vision-enhanced variant: same text
                                      # trunk (reference models/internlm2_ve.py
                                      # routes its LM through the InternLM2
                                      # modules; the "ve" partial-rotary vision
                                      # experts only fire on image tokens)
@register("internlm2")
def _internlm2(hf: dict) -> ModelConfig:
    # internlm2: llama graph; checkpoint uses tok_embeddings/output naming,
    # per-kv-group interleaved wqkv, feed_forward.w1/w3/w2 (reference
    # models/internlm2.py; de-interleave in model_loader/families.py)
    hf = {**hf, "model_type": "internlm2"}
    return ModelConfig.from_hf_config(hf)


@register("DeepseekForCausalLM")
@register("deepseek")
def _deepseek(hf: dict) -> ModelConfig:
    # deepseek-moe V1: llama attention + per-layer MoE past a dense prefix
    # (first_k_dense_replace), softmax-then-topk routing, UNGATED shared
    # experts (reference models/deepseek.py DeepseekMoE)
    hf = {**hf, "model_type": "deepseek"}
    return ModelConfig.from_hf_config(hf)


@register("DeepseekV2ForCausalLM")
@register("deepseek_v2")
def _deepseek_v2(hf: dict) -> ModelConfig:
    # deepseek-v2: Multi-head Latent Attention (weight-absorbed
    # MQA-over-latent serving, models/llama._mla_attention) + V1-style MoE
    # with routed_scaling_factor (reference models/deepseek_v2.py)
    hf = {**hf, "model_type": "deepseek_v2"}
    return ModelConfig.from_hf_config(hf)


@register("StableLmForCausalLM")
@register("StableLMEpochForCausalLM")
@register("stablelm")
def _stablelm(hf: dict) -> ModelConfig:
    # stablelm: LayerNorm(+bias), gated silu MLP, PARTIAL rotary
    # (partial_rotary_factor/rope_pct of head_dim), optional qkv bias
    # (reference models/stablelm.py)
    hf = {**hf, "model_type": "stablelm"}
    return ModelConfig.from_hf_config(hf)


@register("GPTNeoXForCausalLM")
@register("gpt_neox")
def _gpt_neox(hf: dict) -> ModelConfig:
    # GPT-NeoX/Pythia: LayerNorm+biases, non-gated gelu MLP, partial rotary
    # (rotary_pct), use_parallel_residual with TWO norms per block
    # (reference models/gpt_neox.py)
    hf = {**hf, "model_type": "gpt_neox"}
    return ModelConfig.from_hf_config(hf)


@register("PhiForCausalLM")
@register("phi")
def _phi(hf: dict) -> ModelConfig:
    # phi-1/1.5/2: parallel attn+MLP sharing ONE input LayerNorm, partial
    # rotary, gelu_new MLP, biases, lm_head WITH bias (reference
    # models/phi.py; phi-3 is the separate llama-graph Phi3ForCausalLM)
    hf = {**hf, "model_type": "phi"}
    return ModelConfig.from_hf_config(hf)


@register("GPTJForCausalLM")
@register("gptj")
def _gptj(hf: dict) -> ModelConfig:
    # GPT-J: parallel block sharing ln_1, INTERLEAVED (gptj-style) rotary
    # over rotary_dim, gelu_new MLP with biases, lm_head with bias
    # (reference models/gpt_j.py)
    hf = {**hf, "model_type": "gptj"}
    return ModelConfig.from_hf_config(hf)


@register("CohereForCausalLM")
@register("Cohere2ForCausalLM")
@register("cohere")
def _cohere(hf: dict) -> ModelConfig:
    # Cohere/CommandR: parallel attn+MLP sharing one bias-free LayerNorm,
    # gptj-style rope, tied embeddings, logit_scale on the final logits
    # (reference models/commandr.py)
    hf = {**hf, "model_type": "cohere"}
    return ModelConfig.from_hf_config(hf)


@register("OlmoForCausalLM")
@register("olmo")
def _olmo(hf: dict) -> ModelConfig:
    # OLMo: non-parametric LayerNorm, gated silu MLP, no biases, clip_qkv
    # clamp (reference models/olmo.py)
    hf = {**hf, "model_type": "olmo"}
    return ModelConfig.from_hf_config(hf)


@register("GlmForCausalLM")
@register("Glm4ForCausalLM")
@register("glm")
def _glm(hf: dict) -> ModelConfig:
    # GLM-4 (reference models/glm.py): llama graph with qkv bias,
    # half-width INTERLEAVED rotary (gptj-style pairing), fused
    # gate_up_proj checkpoint naming (the phi-3 loader path).
    H = hf["hidden_size"]
    nh = hf["num_attention_heads"]
    hd = hf.get("head_dim") or H // nh
    return ModelConfig(
        arch="glm",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"], num_heads=nh,
        num_kv_heads=hf.get("num_key_value_heads", nh), head_dim=hd,
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        max_position_embeddings=hf.get("max_position_embeddings", 8192),
        rotary_dim=int(hf.get("partial_rotary_factor", 0.5) * hd),
        rope_style="gptj",
        qkv_bias=hf.get("attention_bias", True),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("SmolLM3ForCausalLM")
@register("smollm3")
def _smollm3(hf: dict) -> ModelConfig:
    # SmolLM3 (reference models/smollm3.py): llama graph with every
    # no_rope_layer_interval-th layer skipping rotary (NoPE).
    cfg = ModelConfig.from_hf_config({**hf, "model_type": "llama"})
    import dataclasses
    return dataclasses.replace(
        cfg, arch="smollm3",
        nope_interval=hf.get("no_rope_layer_interval", 4) or 0)


@register("HeliumForCausalLM")
@register("helium")
def _helium(hf: dict) -> ModelConfig:
    # Helium (kyutai; reference models/helium.py): llama graph with
    # INTERLEAVED (gptj-style) rotary pairing.
    cfg = ModelConfig.from_hf_config({**hf, "model_type": "llama"})
    import dataclasses
    return dataclasses.replace(cfg, arch="helium", rope_style="gptj")


@register("ArceeForCausalLM")
@register("arcee")
def _arcee(hf: dict) -> ModelConfig:
    # Arcee AFM (reference models/arcee.py): llama attention + NON-gated
    # squared-ReLU MLP (up_proj -> relu^2 -> down_proj).
    cfg = ModelConfig.from_hf_config({**hf, "model_type": "llama"})
    import dataclasses
    return dataclasses.replace(cfg, arch="arcee", mlp_gated=False,
                               hidden_act="relu2")


@register("Olmo2ForCausalLM")
@register("Olmo3ForCausalLM")
@register("olmo2")
def _olmo2(hf: dict) -> ModelConfig:
    # OLMo2 (reference models/olmo2.py): norm-after-block layout
    # (pre_norms=False + post_norms=True) with full-width q/k RMSNorms.
    H = hf["hidden_size"]
    nh = hf["num_attention_heads"]
    return ModelConfig(
        arch="olmo2",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"], num_heads=nh,
        num_kv_heads=hf.get("num_key_value_heads", nh),
        head_dim=hf.get("head_dim") or H // nh,
        rope_theta=hf.get("rope_theta", 500000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        pre_norms=False, post_norms=True, qk_norm=True,
        qk_norm_style="full",
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("GPTBigCodeForCausalLM")
@register("gpt_bigcode")
def _gpt_bigcode(hf: dict) -> ModelConfig:
    # GPT-BigCode / StarCoder-1 (reference models/gpt_bigcode.py): GPT-2
    # graph with multi-query attention (num_kv_heads=1).
    H = hf["n_embd"]
    nh = hf["n_head"]
    return ModelConfig(
        arch="gpt_bigcode",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=hf.get("n_inner") or 4 * H,
        num_layers=hf["n_layer"], num_heads=nh,
        num_kv_heads=1 if hf.get("multi_query", True) else nh,
        head_dim=H // nh,
        max_position_embeddings=hf.get("n_positions", 2048),
        position_embedding="learned", norm_type="layernorm",
        mlp_gated=False, linear_bias=True,
        hidden_act="gelu_tanh", tie_word_embeddings=True,
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("NemotronForCausalLM")
@register("nemotron")
def _nemotron(hf: dict) -> ModelConfig:
    # Nemotron (reference models/nemotron.py): llama attention with
    # LayerNorm1P norms (the +1 folds into stored gammas at conversion),
    # NON-gated squared-ReLU MLP, partial rotary.
    H = hf["hidden_size"]
    nh = hf["num_attention_heads"]
    hd = hf.get("head_dim") or H // nh
    return ModelConfig(
        arch="nemotron",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"], num_heads=nh,
        num_kv_heads=hf.get("num_key_value_heads", nh), head_dim=hd,
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("norm_eps", 1e-5),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rotary_dim=int(hf.get("partial_rotary_factor", 0.5) * hd),
        hidden_act="relu2", mlp_gated=False, norm_type="layernorm",
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("BertModel")
@register("BertForMaskedLM")
@register("bert")
def _bert(hf: dict) -> ModelConfig:
    # BERT-family encoder-only embedding models (reference
    # models/bert.py BertEmbeddingModel serving bge/e5 retrievers).
    H = hf["hidden_size"]
    nh = hf.get("num_attention_heads", 12)
    return ModelConfig(
        arch="bert",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=hf.get("intermediate_size", 4 * H),
        num_layers=hf.get("num_hidden_layers", 12),
        num_heads=nh, num_kv_heads=nh, head_dim=H // nh,
        rms_norm_eps=hf.get("layer_norm_eps", 1e-12),
        max_position_embeddings=hf.get("max_position_embeddings", 512),
        norm_type="layernorm", position_embedding="learned",
        tie_word_embeddings=True,
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("BertForSequenceClassification")
def _bert_classify(hf: dict) -> ModelConfig:
    # cross-encoder / classifier BERT (reference models/bert.py
    # BertForSequenceClassification + serving_score.py): the bert graph;
    # the pooler+classifier stack rides params["score_head"]
    import dataclasses
    n = (hf.get("num_labels") or len(hf.get("id2label") or {}) or 2)
    return dataclasses.replace(_bert(hf), num_labels=n)


@register("RobertaModel")
@register("RobertaEmbeddingModel")
@register("RobertaForMaskedLM")    # MLM checkpoints served as embedders,
                                   # like BertForMaskedLM above (reference
                                   # models/roberta.py registration)
@register("XLMRobertaModel")
@register("roberta")
@register("xlm-roberta")
def _roberta(hf: dict) -> ModelConfig:
    # RoBERTa/XLM-R retrievers (reference models/roberta.py): the bert
    # graph with position ids offset by padding_idx+1
    import dataclasses
    return dataclasses.replace(
        _bert(hf), bert_pos_offset=(hf.get("pad_token_id", 1) or 1) + 1)


@register("RobertaForSequenceClassification")
@register("XLMRobertaForSequenceClassification")
def _roberta_classify(hf: dict) -> ModelConfig:
    # bge-reranker-style cross-encoders (reference models/roberta.py
    # RobertaForSequenceClassification): classifier.dense->tanh->out_proj
    # over CLS, served through /v1/score
    import dataclasses
    n = (hf.get("num_labels") or len(hf.get("id2label") or {}) or 1)
    return dataclasses.replace(_roberta(hf), num_labels=n)


@register("Qwen2ForSequenceClassification")
def _qwen2_classify(hf: dict) -> ModelConfig:
    # decoder-as-classifier (reference models/qwen2_cls.py): qwen2 trunk +
    # score.weight over the last-token hidden (loader _score_head)
    import dataclasses
    n = (hf.get("num_labels") or len(hf.get("id2label") or {}) or 2)
    return dataclasses.replace(_qwen2(hf), num_labels=n)


@register("Qwen2ForRewardModel")
@register("Qwen2ForProcessRewardModel")
def _qwen2_reward(hf: dict) -> ModelConfig:
    # reward models (reference models/qwen2_rm.py): qwen2 trunk + the
    # Sequential(Linear, ReLU, Linear) score stack (loader _score_head);
    # the PRM variant shares the head shape, scored at the pooled position
    import dataclasses
    return dataclasses.replace(_qwen2(hf), num_labels=1)


@register("InternLM2ForRewardModel")
def _internlm2_reward(hf: dict) -> ModelConfig:
    # reference models/internlm2_ve.py lineage reward head: internlm2
    # trunk + v_head.weight (loader _score_head)
    import dataclasses
    return dataclasses.replace(_internlm2(hf), num_labels=1)


@register("JambaForSequenceClassification")
def _jamba_classify(hf: dict) -> ModelConfig:
    # reference models/jamba.py JambaForSequenceClassification: the jamba
    # trunk with a score head over the pooled hidden
    import dataclasses
    n = (hf.get("num_labels") or len(hf.get("id2label") or {}) or 2)
    return dataclasses.replace(_jamba(hf), num_labels=n)


@register("WhisperForConditionalGeneration")
@register("whisper")
def _whisper(hf: dict) -> ModelConfig:
    # Whisper audio enc-dec (reference models/whisper.py): pre-LN blocks,
    # mel conv frontend, row-bank cross cache (models/whisper.py).
    import math
    H = hf["d_model"]
    nh = hf.get("decoder_attention_heads", 8)
    return ModelConfig(
        arch="whisper",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=hf.get("decoder_ffn_dim", 4 * H),
        num_layers=hf.get("decoder_layers", 12),
        encoder_layers=hf.get("encoder_layers", 12),
        num_heads=nh, num_kv_heads=nh, head_dim=H // nh,
        max_position_embeddings=hf.get("max_target_positions", 448),
        whisper_num_mel=hf.get("num_mel_bins", 80),
        whisper_max_source_positions=hf.get("max_source_positions", 1500),
        embed_scale=math.sqrt(H) if hf.get("scale_embedding") else None,
        decoder_start_token_id=hf.get("decoder_start_token_id", 50257),
        norm_type="layernorm", tie_word_embeddings=True,
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("BartForConditionalGeneration")
@register("MBartForConditionalGeneration")
@register("BartModel")   # bare-encoder-decoder checkpoints; the reference
                         # maps BartModel onto the same conditional-generation
                         # graph (models/registry.py _TEXT_GENERATION_MODELS)
@register("bart")
def _bart(hf: dict) -> ModelConfig:
    # BART/mBART encoder-decoder (reference models/bart.py +
    # enc_dec_model_runner.py; ours: models/bart.py, cross-KV in a second
    # paged cache over the same page tables).
    import math
    H = hf["d_model"]
    nh = hf.get("decoder_attention_heads", 16)
    return ModelConfig(
        arch="bart",
        vocab_size=hf["vocab_size"],
        hidden_size=H,
        intermediate_size=hf.get("decoder_ffn_dim", 4 * H),
        num_layers=hf.get("decoder_layers", 12),
        encoder_layers=hf.get("encoder_layers", 12),
        num_heads=nh, num_kv_heads=nh, head_dim=H // nh,
        max_position_embeddings=hf.get("max_position_embeddings", 1024),
        embed_scale=math.sqrt(H) if hf.get("scale_embedding") else None,
        decoder_start_token_id=hf.get("decoder_start_token_id", 2),
        norm_type="layernorm", tie_word_embeddings=True,
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("Mamba2ForCausalLM")
@register("mamba2")
def _mamba2(hf: dict) -> ModelConfig:
    # Mamba2 / SSD (reference models/mamba2.py): per-head scalar decay,
    # grouped B/C, conv over [x|B|C], gated RMSNorm before out_proj.
    H = hf["hidden_size"]
    expand = hf.get("expand", 2)
    nh = hf.get("num_heads", (expand * H) // hf.get("head_dim", 64))
    return ModelConfig(
        arch="mamba2",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=expand * H,
        num_layers=hf["num_hidden_layers"],
        num_heads=1, num_kv_heads=1, head_dim=128,
        mamba_d_state=hf.get("state_size", 128),
        mamba_d_conv=hf.get("conv_kernel", 4),
        mamba_expand=expand,
        mamba_heads=nh,
        mamba_n_groups=hf.get("n_groups", 1),
        mamba_dt_min=(hf.get("time_step_limit") or [0.0, 1e30])[0],
        mamba_dt_max=(hf.get("time_step_limit") or [0.0, 1e30])[1],
        rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        max_position_embeddings=hf.get("max_position_embeddings", 1 << 20),
        tie_word_embeddings=hf.get("tie_word_embeddings", True),
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("JambaForCausalLM")
@register("jamba")
def _jamba(hf: dict) -> ModelConfig:
    # Jamba hybrid (reference models/jamba.py): interleaved rope-free
    # attention + mamba layers with periodic sparse MoE.
    H = hf["hidden_size"]
    nh = hf.get("num_attention_heads", 32)
    tsr = hf.get("mamba_dt_rank", "auto")
    return ModelConfig(
        arch="jamba",
        vocab_size=hf["vocab_size"], hidden_size=H,
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"], num_heads=nh,
        num_kv_heads=hf.get("num_key_value_heads", 8),
        head_dim=H // nh,
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        max_position_embeddings=hf.get("max_position_embeddings", 1 << 18),
        num_experts=hf.get("num_experts", 16),
        num_experts_per_tok=hf.get("num_experts_per_tok", 2),
        jamba_attn_period=hf.get("attn_layer_period", 8),
        jamba_attn_offset=hf.get("attn_layer_offset", 4),
        jamba_expert_period=hf.get("expert_layer_period", 2),
        jamba_expert_offset=hf.get("expert_layer_offset", 1),
        mamba_d_state=hf.get("mamba_d_state", 16),
        mamba_d_conv=hf.get("mamba_d_conv", 4),
        mamba_expand=hf.get("mamba_expand", 2),
        mamba_dt_rank=None if tsr == "auto" else int(tsr),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("FalconMambaForCausalLM")
@register("falcon_mamba")
def _falcon_mamba(hf: dict) -> ModelConfig:
    # FalconMamba (reference models/falcon_mamba.py): Mamba-1 with
    # weightless RMSNorm on the (dt, B, C) ssm parameters.
    import dataclasses
    base = _mamba(hf)
    return dataclasses.replace(
        base, mamba_mixer_rms_eps=hf.get("mixer_rms_eps", 1e-6))


@register("MambaForCausalLM")
@register("mamba")
def _mamba(hf: dict) -> ModelConfig:
    # Mamba selective-SSM family (reference models/mamba.py + csrc/mamba/;
    # ours: models/mamba.py state-in-page). No attention: head fields are
    # placeholders that keep cache-geometry math inert.
    tsr = hf.get("time_step_rank", "auto")
    return ModelConfig(
        arch="mamba",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf.get("intermediate_size",
                                 2 * hf["hidden_size"]),
        num_layers=hf["num_hidden_layers"],
        num_heads=1, num_kv_heads=1, head_dim=128,
        mamba_d_state=hf.get("state_size", 16),
        mamba_d_conv=hf.get("conv_kernel", 4),
        mamba_expand=hf.get("expand", 2),
        mamba_dt_rank=None if tsr == "auto" else int(tsr),
        rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        max_position_embeddings=hf.get("max_position_embeddings", 1 << 20),
        tie_word_embeddings=hf.get("tie_word_embeddings", True),
        quant="none", weightless_norm=False, lm_head_quant="bf16")


@register("LlavaForConditionalGeneration")
@register("llava")
def _llava_vlm(hf: dict) -> ModelConfig:
    # LLaVA (reference vllm/model_executor/models/llava.py): CLIP-style
    # vision tower + 2-linear projector over any registered text trunk.
    # The text_config routes through the normal registry; the tower rides
    # cfg.vision (models/vit.py).
    import dataclasses

    from qspec_tpu.config import VisionConfig
    text = dict(hf.get("text_config") or {})
    if text.get("architectures"):
        base = resolve(text)
    else:
        base = ModelConfig.from_hf_config(text)
    v = dict(hf.get("vision_config") or {})
    siglip = v.get("model_type") == "siglip_vision_model"
    vc = VisionConfig(
        hidden_size=v.get("hidden_size", 1024),
        intermediate_size=v.get("intermediate_size", 4096),
        num_layers=v.get("num_hidden_layers", 24),
        num_heads=v.get("num_attention_heads", 16),
        image_size=v.get("image_size", 336),
        patch_size=v.get("patch_size", 14),
        layer_norm_eps=v.get("layer_norm_eps",
                             1e-6 if siglip else 1e-5),
        feature_layer=hf.get("vision_feature_layer", -2),
        drop_cls=(hf.get("vision_feature_select_strategy", "default")
                  == "default"),
        hidden_act=v.get("hidden_act",
                         "gelu_pytorch_tanh" if siglip else "quick_gelu"),
        tower="siglip" if siglip else "clip",
    )
    return dataclasses.replace(
        base, arch="llava", vision=vc,
        image_token_id=hf.get("image_token_index", 32000))


@register("Idefics3ForConditionalGeneration")
@register("SmolVLMForConditionalGeneration")   # SmolVLM IS idefics3 with
                                               # its own processor defaults
@register("idefics3")
def _idefics3(hf: dict) -> ModelConfig:
    # Idefics3/SmolVLM (reference models/idefics3.py): SigLIP-style tower
    # whose post_layernorm'd last_hidden_state passes a PIXEL-SHUFFLE
    # connector (sf x sf patches fold into sf^2*hidden channels) and a
    # single bias-free linear into the llama trunk. Tile splitting with
    # <row_r_col_c> markers is processor-level (prompts may carry the
    # markers as text tokens); the mapper serves the global-image view.
    import dataclasses

    from qspec_tpu.config import VisionConfig
    text = dict(hf.get("text_config") or {})
    base = resolve(text) if text.get("architectures") \
        else ModelConfig.from_hf_config(text)
    v = dict(hf.get("vision_config") or {})
    vc = VisionConfig(
        hidden_size=v.get("hidden_size", 1152),
        intermediate_size=v.get("intermediate_size", 4304),
        num_layers=v.get("num_hidden_layers", 27),
        num_heads=v.get("num_attention_heads", 16),
        image_size=v.get("image_size", 364),
        patch_size=v.get("patch_size", 14),
        layer_norm_eps=v.get("layer_norm_eps", 1e-6),
        feature_layer=-1, drop_cls=False,
        hidden_act=v.get("hidden_act", "gelu_pytorch_tanh"),
        tower="siglip", post_norm=True,
        pixel_shuffle=int(hf.get("scale_factor", 2)))
    return dataclasses.replace(
        base, arch="idefics3", vision=vc,
        image_token_id=hf.get("image_token_id", 128257))


@register("Qwen2AudioForConditionalGeneration")
@register("qwen2_audio")
def _qwen2_audio(hf: dict) -> ModelConfig:
    # Qwen2-Audio (reference models/qwen2_audio.py): a whisper-encoder
    # audio tower + AvgPool1d(2) + single-linear projector into the qwen2
    # trunk — the audio-tower-into-LM convention (Ultravox shares it).
    # Audio placeholders ride the SAME placeholder-expansion machinery as
    # images: image_token_id holds audio_token_index and the arch's
    # registered mapper interprets the attached array as audio
    # (multimodal.qwen2_audio_mapper).
    import dataclasses

    from qspec_tpu.config import AudioConfig
    text = dict(hf.get("text_config") or {})
    base = resolve(text) if text.get("architectures") else _qwen2(text)
    a = dict(hf.get("audio_config") or {})
    ac = AudioConfig(
        hidden_size=a.get("d_model", 1280),
        intermediate_size=a.get("encoder_ffn_dim", 5120),
        num_layers=a.get("encoder_layers", 32),
        num_heads=a.get("encoder_attention_heads", 20),
        num_mel=a.get("num_mel_bins", 128),
        max_source_positions=a.get("max_source_positions", 1500))
    return dataclasses.replace(
        base, arch="qwen2_audio", audio=ac,
        image_token_id=hf.get("audio_token_index", 151646))


@register("LlavaNextForConditionalGeneration")
@register("llava_next")
def _llava_next(hf: dict) -> ModelConfig:
    # LLaVA-NeXT / v1.6 (reference models/llava_next.py): the llava tower +
    # projector over ANYRES tiling — the image resizes onto the best-fit
    # canvas from image_grid_pinpoints, splits into image_size tiles, and
    # tile features pack spatially with aspect-ratio unpadding and a
    # per-row image_newline embedding (multimodal.llava_next_mapper).
    import dataclasses
    base = _llava_vlm(hf)
    pins = tuple(tuple(p) for p in (hf.get("image_grid_pinpoints") or
                                    [[336, 672], [672, 336], [672, 672],
                                     [1008, 336], [336, 1008]]))
    return dataclasses.replace(base, arch="llava_next",
                               image_grid_pinpoints=pins)


@register("PaliGemmaForConditionalGeneration")
@register("paligemma")
def _paligemma(hf: dict) -> ModelConfig:
    # PaliGemma / PaliGemma2 (reference models/paligemma.py): SigLIP tower
    # whose post_layernorm'd last_hidden_state feeds a SINGLE-linear
    # projector into a gemma/gemma2 trunk; pixels normalized to [-1, 1].
    # Feature scaling (HF divides by sqrt(text_H), the gemma normalizer
    # multiplies it back) nets out — see multimodal.paligemma_tower_mapper.
    import dataclasses

    from qspec_tpu.config import VisionConfig
    text = dict(hf.get("text_config") or {})
    if text.get("architectures"):
        base = resolve(text)
    else:
        base = ModelConfig.from_hf_config(text)
    v = dict(hf.get("vision_config") or {})
    vc = VisionConfig(
        hidden_size=v.get("hidden_size", 1152),
        intermediate_size=v.get("intermediate_size", 4304),
        num_layers=v.get("num_hidden_layers", 27),
        num_heads=v.get("num_attention_heads", 16),
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 14),
        layer_norm_eps=v.get("layer_norm_eps", 1e-6),
        feature_layer=-1,             # last_hidden_state, not -2
        drop_cls=False,               # siglip has no CLS row
        hidden_act=v.get("hidden_act", "gelu_pytorch_tanh"),
        tower="siglip", post_norm=True)
    return dataclasses.replace(
        base, arch="paligemma", vision=vc,
        image_token_id=hf.get("image_token_index", 257152))


# ---------------------------------------------------------------------------
# llama-graph lineage (reference models/registry.py:30-109): these archs ARE
# the llama compute graph — per-arch differences are config knobs and/or
# checkpoint key layouts (model_loader/families.py), exactly how the
# reference's per-model files mostly re-wire the same decoder modules.
# ---------------------------------------------------------------------------


@register("AquilaForCausalLM")
@register("AquilaModel")
@register("aquila")
def _aquila(hf: dict) -> ModelConfig:
    # BAAI Aquila: llama graph verbatim (reference models/registry.py maps
    # both arch strings onto models/llama.py)
    return ModelConfig.from_hf_config(hf)


@register("LLaMAForCausalLM")       # legacy capitalization
@register("LlamaModel")            # decoder-as-embedder registration
@register("Fairseq2LlamaForCausalLM")
def _llama_aliases(hf: dict) -> ModelConfig:
    return ModelConfig.from_hf_config(hf)


@register("MistralModel")          # e5-mistral-style embedder
def _mistral_embed(hf: dict) -> ModelConfig:
    return ModelConfig.from_hf_config(hf)


@register("GritLM")
def _gritlm(hf: dict) -> ModelConfig:
    # GritLM (reference models/gritlm.py): a mistral/llama trunk serving
    # BOTH generation and embedding — the reference subclasses
    # LlamaForCausalLM and adds an instruction-masked mean pooler for
    # embed requests. Here the trunk is the llama graph; generation is
    # exact, and /v1/embeddings rides the decoder-as-embedder path
    # (last-token pooling — a pooling-convention delta vs the reference's
    # masked mean, as with the e5-mistral embedder above).
    return ModelConfig.from_hf_config(hf)


@register("Qwen2Model")
@register("Qwen2EmbeddingModel")   # gte-qwen2-style embedder
def _qwen2_embed(hf: dict) -> ModelConfig:
    return _qwen2(hf)


@register("Gemma2Model")           # gemma2-based embedder
def _gemma2_embed(hf: dict) -> ModelConfig:
    return _gemma2(hf)


@register("QuantMixtralForCausalLM")
def _quant_mixtral(hf: dict) -> ModelConfig:
    return _mixtral(hf)


@register("XverseForCausalLM")
@register("xverse")
def _xverse(hf: dict) -> ModelConfig:
    # XVERSE: llama graph verbatim (reference models/registry.py)
    return ModelConfig.from_hf_config(hf)


@register("SolarForCausalLM")
@register("solar")
def _solar(hf: dict) -> ModelConfig:
    # Upstage SOLAR: depth-up-scaled llama (reference models/solar.py);
    # the bskcn_* backbone-skip variants change the graph and are rejected
    if hf.get("bskcn_1") or hf.get("bskcn_tv"):
        raise ValueError("SOLAR bskcn (backbone skip connections) variants "
                         "are not supported; plain SOLAR checkpoints are")
    return ModelConfig.from_hf_config(hf)


@register("InternLMForCausalLM")
@register("internlm")
def _internlm(hf: dict) -> ModelConfig:
    # InternLM(1): llama graph with biases on every projection when the
    # config's `bias` flag is set (reference models/internlm.py... folded
    # into llama.py in the reference registry)
    import dataclasses
    cfg = ModelConfig.from_hf_config(hf)
    bias = bool(hf.get("bias", False))
    return dataclasses.replace(cfg, arch="llama", qkv_bias=bias,
                               linear_bias=bias)


@register("InternLM3ForCausalLM")
@register("internlm3")
def _internlm3(hf: dict) -> ModelConfig:
    # InternLM3: llama graph + optional qkv bias (reference
    # models/registry.py InternLM3ForCausalLM -> llama)
    import dataclasses
    cfg = ModelConfig.from_hf_config(hf)
    return dataclasses.replace(cfg, qkv_bias=bool(hf.get("qkv_bias", False)))


@register("OrionForCausalLM")
@register("orion")
def _orion(hf: dict) -> ModelConfig:
    # OrionStar: llama projections under biased LayerNorm instead of
    # RMSNorm (reference models/orion.py)
    import dataclasses
    cfg = ModelConfig.from_hf_config(hf)
    return dataclasses.replace(
        cfg, arch="orion", norm_type="layernorm",
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5))


@register("DeciLMForCausalLM")
@register("decilm")
def _decilm(hf: dict) -> ModelConfig:
    # DeciLM: llama graph whose GQA ratio VARIES per layer
    # (num_key_value_heads_per_layer, reference models/decilm.py). The
    # stacked-layer executable requires uniform kv heads: uniform configs
    # serve; variable ones are rejected.
    per_layer = hf.get("num_key_value_heads_per_layer")
    if per_layer and len(set(per_layer)) > 1:
        raise ValueError(
            "DeciLM with per-layer variable GQA is not supported (the "
            "stacked-layer executable needs uniform kv heads); uniform "
            "num_key_value_heads_per_layer configs are")
    hf = dict(hf)
    if per_layer:
        hf["num_key_value_heads"] = per_layer[0]
    return ModelConfig.from_hf_config(hf)


@register("MiniCPMForCausalLM")
@register("minicpm")
def _minicpm(hf: dict) -> ModelConfig:
    # MiniCPM (reference models/minicpm.py): llama graph + muP-style
    # scales — embeddings * scale_emb, per-block residual *
    # scale_depth/sqrt(L), logits / (hidden_size / dim_model_base) — all
    # existing knobs; tied embeddings
    import dataclasses
    import math
    cfg = ModelConfig.from_hf_config(hf)
    L = hf["num_hidden_layers"]
    if hf.get("num_experts") or hf.get("num_experts_per_tok"):
        raise ValueError("MiniCPM-MoE variants are not supported")
    return dataclasses.replace(
        cfg, arch="minicpm",
        embed_scale=float(hf.get("scale_emb", 1.0)) or None,
        residual_multiplier=float(hf.get("scale_depth", math.sqrt(L)))
        / math.sqrt(L),
        logits_scaling=(hf["hidden_size"] / hf["dim_model_base"]
                        if hf.get("dim_model_base") else None),
        tie_word_embeddings=hf.get("tie_word_embeddings", True))


@register("MiniCPM3ForCausalLM")
@register("minicpm3")
def _minicpm3(hf: dict) -> ModelConfig:
    # MiniCPM3 (reference models/minicpm3.py): MiniCPM's muP scales over
    # MLA attention with q LoRA (the deepseek-v2 attention machinery and
    # checkpoint key layout)
    import dataclasses
    import math
    nh = hf["num_attention_heads"]
    L = hf["num_hidden_layers"]
    cfg = ModelConfig(
        arch="deepseek_v2", attention_type="mla",
        kv_lora_rank=hf["kv_lora_rank"], q_lora_rank=hf.get("q_lora_rank"),
        qk_nope_head_dim=hf["qk_nope_head_dim"],
        qk_rope_head_dim=hf["qk_rope_head_dim"],
        v_head_dim=hf.get("v_head_dim", hf["hidden_size"] // nh),
        rotary_dim=hf["qk_rope_head_dim"],
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=L, num_heads=nh, num_kv_heads=nh,
        head_dim=hf["qk_nope_head_dim"] + hf["qk_rope_head_dim"],
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
        quant="none", weightless_norm=False)
    return dataclasses.replace(
        cfg,
        embed_scale=float(hf.get("scale_emb", 1.0)) or None,
        residual_multiplier=float(hf.get("scale_depth", math.sqrt(L)))
        / math.sqrt(L),
        logits_scaling=(hf["hidden_size"] / hf["dim_model_base"]
                        if hf.get("dim_model_base") else None),
        tie_word_embeddings=hf.get("tie_word_embeddings", True))


@register("QWenLMHeadModel")
@register("qwen")
def _qwen1(hf: dict) -> ModelConfig:
    # Qwen(1) (reference models/qwen.py): llama graph, fused c_attn with
    # qkv-only bias, swiglu with gate=w2/up=w1 (families.py remap)
    import dataclasses
    nh = hf["num_attention_heads"]
    cfg = ModelConfig.from_hf_config({
        **hf, "model_type": "llama",
        "num_key_value_heads": nh,
        # HF Qwen-1 reports the DOUBLED ffn width (intermediate_size is
        # 2*ffn in its config; modeling_qwen halves it)
        "intermediate_size": hf["intermediate_size"] // 2,
        "rms_norm_eps": hf.get("layer_norm_epsilon", 1e-6),
        "max_position_embeddings": hf.get("max_position_embeddings",
                                          hf.get("seq_length", 8192))})
    return dataclasses.replace(cfg, arch="qwen", qkv_bias=True)


@register("ExaoneForCausalLM")
@register("exaone")
def _exaone(hf: dict) -> ModelConfig:
    # EXAONE (reference models/exaone.py): llama graph under GPT-style
    # key names (families.py remap)
    import dataclasses
    cfg = ModelConfig.from_hf_config({
        **hf, "model_type": "llama",
        "hidden_size": hf.get("hidden_size", hf.get("n_embd")),
        "num_hidden_layers": hf.get("num_hidden_layers",
                                    hf.get("num_layers")),
        "num_attention_heads": hf.get("num_attention_heads",
                                      hf.get("n_head")),
        "rms_norm_eps": hf.get("layer_norm_epsilon", 1e-5)})
    return dataclasses.replace(cfg, arch="exaone")


@register("TeleChat2ForCausalLM")
@register("telechat2")
def _telechat2(hf: dict) -> ModelConfig:
    # TeleChat2 (reference models/telechat2.py): llama graph, separate
    # query + per-head-fused key_value, biased o/down only
    import dataclasses
    nh = hf.get("n_head", hf.get("num_attention_heads"))
    cfg = ModelConfig.from_hf_config({
        **hf, "model_type": "llama",
        "num_attention_heads": nh,
        "num_key_value_heads": nh,
        "num_hidden_layers": hf.get("n_layer",
                                    hf.get("num_hidden_layers")),
        "intermediate_size": hf.get("ffn_hidden_size",
                                    hf.get("intermediate_size")),
        "max_position_embeddings": hf.get("seq_length", 8192)})
    return dataclasses.replace(cfg, arch="telechat2")


@register("ChatGLMModel")
@register("ChatGLMForCausalLM")
@register("ChatGLMForConditionalGeneration")
@register("chatglm")
@register("glm4")
def _chatglm(hf: dict) -> ModelConfig:
    # ChatGLM2/3 / GLM-4-chat (reference models/chatglm.py): MQA groups,
    # straight-fused qkv with qkv-only bias, RMSNorm, fused swiglu
    # dense_h_to_4h, rotary over HALF the head dim in interleaved (gptj)
    # pairs (:278-285 is_neox_style = not original_rope), untied head
    nh = hf["num_attention_heads"]
    dh = hf.get("kv_channels", hf["hidden_size"] // nh)
    nkv = (hf.get("multi_query_group_num", nh)
           if hf.get("multi_query_attention") else nh)
    if hf.get("apply_residual_connection_post_layernorm"):
        raise ValueError("chatglm post-layernorm residual variant "
                         "unsupported")
    return ModelConfig(
        arch="chatglm",
        qkv_bias=bool(hf.get("add_qkv_bias", True)),
        linear_bias=bool(hf.get("add_bias_linear", False)),
        rotary_dim=dh // 2,
        rope_style="gptj" if hf.get("original_rope", True) else "neox",
        rope_theta=10000.0 * hf.get("rope_ratio", 1.0),
        vocab_size=hf.get("padded_vocab_size", hf.get("vocab_size")),
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["ffn_hidden_size"],
        num_layers=hf["num_layers"], num_heads=nh, num_kv_heads=nkv,
        head_dim=dh,
        rms_norm_eps=hf.get("layernorm_epsilon", 1e-5),
        max_position_embeddings=hf.get("seq_length", 8192),
        tie_word_embeddings=False,
        quant="none", weightless_norm=False)


@register("MantisForConditionalGeneration")
def _mantis(hf: dict) -> ModelConfig:
    # Mantis IS the llava architecture with its own processor (the
    # reference maps it onto LlavaForConditionalGeneration,
    # models/registry.py multimodal section)
    return _llava_vlm(hf)


@register("MedusaModel")
@register("EAGLEModel")
@register("MLPSpeculatorPreTrainedModel")
def _speculator_arch(hf: dict) -> ModelConfig:
    # these arch strings describe PROPOSER nets, not servable trunks; the
    # reference instantiates them inside its spec-decode workers. Here the
    # equivalents load through the spec_decode loaders and ride the fused
    # rounds: spec_decode.medusa.load_medusa / eagle.load_eagle /
    # mlp_speculator (SpeculativeConfig.method medusa|eagle|mlp_speculator)
    raise ValueError(
        "speculator architectures load as proposer nets, not engines: use "
        "SpeculativeConfig(method='medusa'|'eagle'|'mlp_speculator') with "
        "spec_decode.{medusa,eagle,mlp_speculator}.load_* on the target "
        "engine (reference: vllm spec_decode workers)")


@register("UltravoxModel")
def _ultravox(hf: dict) -> ModelConfig:
    # reference models/ultravox.py: the same whisper-encoder-into-LM
    # convention as Qwen2-Audio but with a frame-STACKING SwiGLU projector
    # (stack_factor consecutive frames concatenated before projection) and
    # trust_remote_code HF weights. The audio-tower path this build ships
    # (qwen2_audio) covers the structural convention; ultravox's stacking
    # projector is not wired
    raise ValueError(
        "Ultravox's stack-factor SwiGLU audio projector is not "
        "implemented; Qwen2AudioForConditionalGeneration serves the "
        "whisper-tower-into-LM convention")


@register("Phi3SmallForCausalLM")
def _phi3_small(hf: dict) -> ModelConfig:
    # reference models/phi3_small.py serves this with a dedicated
    # blocksparse attention kernel (local-block + vertical-stride pattern);
    # this build's paged kernel implements dense/sliding/tree masks only
    raise ValueError(
        "Phi-3-small's blocksparse attention (homo_head local+vertical "
        "stride pattern) is not implemented; Phi-3 mini/medium "
        "(Phi3ForCausalLM) serve via the llama graph")


@register("ArcticForCausalLM")
def _arctic(hf: dict) -> ModelConfig:
    # reference models/arctic.py: dense-MoE hybrid whose MoE layers run a
    # PARALLEL residual MLP behind its own layernorm — a second norm+branch
    # per block this graph does not wire
    raise ValueError(
        "Snowflake Arctic's parallel residual-MLP MoE blocks are not "
        "supported; Mixtral/DBRX/Qwen-MoE/DeepSeek/OLMoE/PhiMoE MoE "
        "families are")


@register("DeepseekV3ForCausalLM")
@register("deepseek_v3")
def _deepseek_v3(hf: dict) -> ModelConfig:
    # DeepSeek-V3/R1 (reference deepseek_v2.py's V3 branch + HF
    # DeepseekV3TopkRouter): the V2 MLA + shared-expert MoE graph with
    # sigmoid scoring and noaux_tc group-limited expert selection
    # (e_score_correction_bias biases SELECTION only)
    import dataclasses
    if hf.get("topk_method", "noaux_tc") not in ("noaux_tc", "greedy"):
        raise ValueError(f"deepseek-v3 topk_method {hf['topk_method']!r} "
                         "unsupported")
    base = dict(hf, model_type="deepseek_v2", topk_method="greedy")
    cfg = ModelConfig.from_hf_config(base)
    return dataclasses.replace(
        cfg, arch="deepseek_v3",
        moe_routing="noaux_tc",
        moe_n_group=hf.get("n_group", 1) or 1,
        moe_topk_group=hf.get("topk_group", 1) or 1,
        moe_norm_topk_prob=hf.get("norm_topk_prob", True),
        moe_softmax_before_topk=False)


@register("OlmoeForCausalLM")
@register("olmoe")
def _olmoe(hf: dict) -> ModelConfig:
    # OLMoE (reference models/olmoe.py): llama attention with FULL-width
    # q/k RMSNorms (olmo2-style) over a 64-expert top-8 MoE MLP
    # (qwen2-moe checkpoint key naming, handled by the loader)
    nh = hf["num_attention_heads"]
    return ModelConfig(
        arch="olmoe", qk_norm=True, qk_norm_style="full",
        num_experts=hf.get("num_experts", 64),
        num_experts_per_tok=hf.get("num_experts_per_tok", 8),
        moe_norm_topk_prob=hf.get("norm_topk_prob", False),
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"], num_heads=nh,
        num_kv_heads=hf.get("num_key_value_heads", nh),
        head_dim=hf["hidden_size"] // nh,
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        quant="none", weightless_norm=False)


@register("PhiMoEForCausalLM")
@register("phimoe")
def _phimoe(hf: dict) -> ModelConfig:
    # Phi-3.5-MoE (reference models/phimoe.py): mixtral's sparse-MoE MLP
    # and checkpoint naming under biased LayerNorm, attention bias, and a
    # biased untied lm_head
    nh = hf["num_attention_heads"]
    return ModelConfig(
        arch="phimoe", norm_type="layernorm", moe_routing="sparsemixer",
        qkv_bias=bool(hf.get("attention_bias", True)),
        lm_head_bias=bool(hf.get("lm_head_bias", True)),
        num_experts=hf.get("num_local_experts", 16),
        num_experts_per_tok=hf.get("num_experts_per_tok", 2),
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"], num_heads=nh,
        num_kv_heads=hf.get("num_key_value_heads", nh),
        head_dim=hf["hidden_size"] // nh,
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_scaling=hf.get("rope_scaling"),
        sliding_window=hf.get("sliding_window"),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        quant="none", weightless_norm=False)


@register("Qwen2VLForConditionalGeneration")
@register("qwen2_vl")
def _qwen2vl(hf: dict) -> ModelConfig:
    # Qwen2-VL (reference models/qwen2_vl.py:66-120 uses_mrope): qwen2
    # text trunk under 3-channel M-RoPE + the native-resolution rope-2D
    # vision tower with PatchMerger (models/qwen2vl_vit.py)
    import dataclasses

    from qspec_tpu.config import VisionConfig
    rs = hf.get("rope_scaling") or {}
    sect = rs.get("mrope_section")
    # the mrope "type" is not a cache-shaping scaling — strip it
    base = dict(hf)
    base["rope_scaling"] = None
    cfg = _qwen2(base)
    v = dict(hf.get("vision_config") or {})
    vc = VisionConfig(
        hidden_size=hf["hidden_size"],            # merger output = LM H
        intermediate_size=int(v.get("embed_dim", 1280)
                              * v.get("mlp_ratio", 4)),
        num_layers=v.get("depth", 32),
        num_heads=v.get("num_heads", 16),
        patch_size=v.get("patch_size", 14),
        tower="qwen2vl",
        spatial_merge=v.get("spatial_merge_size", 2),
        temporal_patch=v.get("temporal_patch_size", 2),
        hidden_act=v.get("hidden_act", "quick_gelu"))
    return dataclasses.replace(
        cfg, arch="qwen2vl",
        mrope_section=tuple(sect) if sect else None,
        vision=vc,
        image_token_id=hf.get("image_token_id", 151655))


def resolve(hf_config: dict) -> ModelConfig:
    archs = hf_config.get("architectures") or [hf_config.get("model_type", "")]
    for a in archs:
        if a in _REGISTRY:
            return _REGISTRY[a](hf_config)
    raise ValueError(f"unsupported architectures {archs}; known: {sorted(_REGISTRY)}")


def supported_architectures():
    return sorted(_REGISTRY)


# documented plugin-facing name (see qspec_tpu/plugins.py)
register_model = register
