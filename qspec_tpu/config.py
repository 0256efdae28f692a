"""Configuration dataclasses (TPU-native analogue of vllm/config.py).

The reference composes ModelConfig / CacheConfig / ParallelConfig /
SchedulerConfig / SpeculativeConfig into one VllmConfig threaded everywhere
(/root/reference/vllm/config.py:83,950,1219,1366,1567,2959). We keep the same
taxonomy with TPU-first fields: page counts instead of GPU blocks, mesh axes
instead of world sizes, and padding buckets instead of CUDA-graph batch sizes
(XLA recompiles per shape, so the bucketing policy is a first-class config).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """CLIP-style vision tower hyperparameters (the LLaVA tower;
    reference: transformers CLIPVisionConfig via
    vllm/model_executor/models/clip.py)."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    # which encoder hidden_states index feeds the projector (HF
    # vision_feature_layer; hidden_states[0] is the embedding output,
    # [i] the i-th layer's output; LLaVA default -2)
    feature_layer: int = -2
    # vision_feature_select_strategy == "default": drop the CLS row
    drop_cls: bool = True
    hidden_act: str = "quick_gelu"    # "quick_gelu"|"gelu"|"gelu_tanh"
    # "siglip": conv bias, NO class token, no pre-layernorm
    # (reference: transformers SiglipVisionModel via vllm models/siglip.py)
    # "qwen2vl": native-resolution tower with 2D vision rope + PatchMerger
    # (reference models/qwen2_vl.py; models/qwen2vl_vit.py here)
    tower: str = "clip"
    # qwen2vl tower geometry (HF Qwen2VLVisionConfig)
    spatial_merge: int = 2
    temporal_patch: int = 2
    # Idefics3/SmolVLM-style pixel-shuffle connector: fold sf x sf feature
    # patches into one row of sf^2 * hidden channels before the projector
    # (transformers Idefics3Connector.pixel_shuffle); 1 = no shuffle
    pixel_shuffle: int = 1
    # apply the tower's final post_layernorm to the selected features —
    # last_hidden_state semantics (PaliGemma feeds the SigLIP tower's
    # last_hidden_state into its projector, transformers
    # modeling_paligemma.get_image_features), vs LLaVA's hidden_states[-2]
    # which post_layernorm never touches
    post_norm: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Whisper-style audio ENCODER feeding an LM trunk (the Qwen2-Audio
    audio_tower; reference vllm/model_executor/models/qwen2_audio.py).
    All-scalar so ModelConfig stays hashable as a jit static arg."""

    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 20
    num_mel: int = 128
    max_source_positions: int = 1500


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for one model."""

    arch: str = "llama"               # "llama" | "qwen2"
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rope_scaling: Optional[dict] = None
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = False
    qkv_bias: bool = False            # qwen2-style attention bias
    # qwen3-style per-head RMSNorm on q and k after the projection, before
    # rope (HF Qwen3Attention q_norm/k_norm, gamma shape [head_dim]). The
    # gammas sit AFTER the qkv matmul, so they stay live weights even in
    # QuaRot checkpoints (only pre-projection norms fold into the weights).
    qk_norm: bool = False
    # "full": OLMo2's q/k RMSNorm spans the WHOLE projection width
    # ([num_heads*head_dim] / [num_kv_heads*head_dim] gammas), not per head
    qk_norm_style: str = "head"       # "head" | "full"
    # False: OLMo2's norm-after-block layout — NO input norms; post_norms
    # (post_attention/post_feedforward, applied to the block output before
    # the residual add) carry all normalization (reference models/olmo2.py)
    pre_norms: bool = True
    # MLP activation: "silu" (llama/qwen/mistral) | "gelu_tanh" (gemma's
    # approximate GeGLU, HF gelu_pytorch_tanh)
    hidden_act: str = "silu"
    # multiply embeddings by this after lookup (gemma: sqrt(hidden_size))
    embed_scale: Optional[float] = None
    # gemma RMSNorm computes x * (1 + w): loaders fold the +1 into the
    # stored gamma so the runtime norm stays the standard x * gamma
    norm_weight_offset: float = 0.0
    # Mistral-style sliding-window attention: each query attends only to the
    # last `sliding_window` positions (reference quarot_llama.py:125-136).
    # None = full causal attention.
    sliding_window: Optional[int] = None
    # gemma2 (reference vllm/model_executor/models/gemma2.py):
    # every `sliding_window_pattern`-th layer alternates sliding/global
    # (2 = even layers sliding, odd global); tanh softcaps on attention
    # scores and final logits; query scale from query_pre_attn_scalar;
    # post-attention/pre+post-feedforward norms around each block
    sliding_window_pattern: int = 1
    # gemma3 (reference models/gemma3.py): the pattern marks GLOBAL layers
    # instead — layer li is full-attention iff (li+1) % pattern == 0, all
    # others sliding; sliding layers also use a SECOND rope cache at
    # rope_local_theta (params["rope_cache_local"])
    sliding_global_every: bool = False
    rope_local_theta: Optional[float] = None
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    query_pre_attn_scalar: Optional[float] = None
    post_norms: bool = False
    # granite scalar multipliers (reference vllm/model_executor/models/
    # granite.py): each block's output is scaled by residual_multiplier
    # before the residual add; final logits are divided by logits_scaling
    # (embedding_multiplier rides embed_scale, attention_multiplier rides
    # query_pre_attn_scalar as attention_multiplier**-2)
    residual_multiplier: float = 1.0
    logits_scaling: Optional[float] = None
    # quantization scheme of the stored checkpoint:
    # "w4"   QuaRot packed int4, per-channel symmetric (dual-scheme QSpec)
    # "w4g"  grouped asymmetric int4 (AWQ/GPTQ/compressed-tensors
    #        pack-quantized ingestion, W4A16 only)
    # "w8"   per-channel int8 (compressed-tensors int-quantized, W8A16)
    # "none" bf16
    quant: str = "w4"
    # vocab-projection weight dtype. At decode M the dense bf16 head streams
    # ~1 GB/step (Llama-3's 128k vocab); per-channel int8 halves that at
    # near-zero quality cost (QServe-style W8 head). "auto" = int8 for w4
    # checkpoints, bf16 otherwise.
    lm_head_quant: str = "auto"       # "auto" | "bf16" | "int8" | "int4"
    # QuaRot models fold RMSNorm gammas into the rotated weights offline, so
    # the live norms are weightless (reference quarot_nn/normalization.py:5).
    weightless_norm: bool = True
    # Mixtral-style sparse MoE: each layer's MLP is `num_experts` expert
    # MLPs with a top-k softmax router (reference MixtralForCausalLM +
    # fused_moe). 0 = dense MLP.
    num_experts: int = 0
    num_experts_per_tok: int = 2
    # qwen2-moe variations (reference Qwen2MoeForCausalLM): experts sized
    # separately from the dense MLP, softmax over ALL experts before
    # top-k (mixtral softmaxes after), optional top-k renormalization,
    # and an always-on shared expert gated by sigmoid(x @ w_gate)
    moe_intermediate_size: Optional[int] = None   # None -> intermediate_size
    shared_expert_intermediate_size: int = 0      # 0 -> no shared expert
    moe_norm_topk_prob: bool = False
    moe_softmax_before_topk: bool = False
    # "topk" (mixtral/qwen2-moe shapes, refined by the two flags around
    # this) | "sparsemixer" (Phi-3.5-MoE: threshold-masked softmax around
    # the running max, reference models/phimoe.py sparsemixer) |
    # "noaux_tc" (DeepSeek-V3: sigmoid scores + e_score_correction_bias
    # group-limited routing, reference models/deepseek_v3.py)
    moe_routing: str = "topk"
    # noaux_tc group-limited routing (DeepSeek-V3): experts partition into
    # n_group groups; only the topk_group best groups (by their top-2
    # biased scores) may receive tokens
    moe_n_group: int = 1
    moe_topk_group: int = 1
    # deepseek-moe variations (reference DeepseekForCausalLM,
    # models/deepseek.py): the first k layers keep a DENSE MLP
    # (first_k_dense_replace) — their stack lives in params["layers_dense"]
    # and runs as a separate scan segment; the shared expert adds its
    # output directly (no sigmoid gate, unlike qwen2-moe)
    first_k_dense: int = 0
    shared_expert_gated: bool = True
    # cross-encoder sequence-classification head (reference cross-encoder
    # model class, models/registry.py:142-150 + serving_score.py): >0 adds
    # params["score_head"] {w: [H, num_labels], b} applied to the pooled
    # hidden; /v1/score then runs TRUE cross-encoding (query+doc jointly
    # through the trunk) instead of bi-encoder cosine
    num_labels: int = 0
    # RoBERTa-family position offset: position ids start at
    # padding_idx + 1 (= 2) instead of 0 (reference models/roberta.py
    # create_position_ids_from_input_ids)
    bert_pos_offset: int = 0
    # Qwen2-VL M-RoPE section widths in HALF-dims, e.g. (16, 24, 24) for
    # head_dim 128 (reference qwen2_vl.py uses_mrope; HF rope_scaling
    # mrope_section): rotary channels split over (temporal, height, width)
    # position streams. None = standard rope.
    mrope_section: Optional[tuple] = None
    # pre-RMSNorm GPT-family graph knobs (reference models/{opt,gpt2,
    # starcoder2,falcon}.py). These serve bf16/grouped-int4 only — the
    # QuaRot pipeline's norm folding assumes weightless RMSNorm.
    # "layernorm": mean-subtracting LayerNorm with bias
    # (params layers.input_norm_b / post_norm_b / final_norm_b)
    norm_type: str = "rmsnorm"        # "rmsnorm" | "layernorm"
    # False: non-gated MLP fc1 -> act -> fc2 ("gate_up" holds fc1 [H, I])
    mlp_gated: bool = True
    # "learned": trained position table params["pos_embed"] added to the
    # token embedding (GPT-2/Starcoder2 wpe); "learned_opt": same with
    # OPT's +2 position offset; rope is skipped for both
    position_embedding: str = "rope"  # "rope"|"learned"|"learned_opt"
    # Falcon parallel blocks: x + attn(norm(x)) + mlp(norm(x)) with ONE
    # shared input norm (reference falcon.py parallel_attn)
    parallel_block: bool = False
    # bias on every projection incl. o/down (OPT/GPT-2/Starcoder2)
    linear_bias: bool = False
    # SmolLM3/Llama4-style NoPE layers: every `nope_interval`-th layer
    # (1-indexed) skips rotary entirely (HF no_rope_layer_interval;
    # no_rope_layers[li] == 0 means NoPE). 0 = rope everywhere.
    nope_interval: int = 0
    # partial rotary: rope only the first `rotary_dim` dims of each head
    # (StableLM rope_pct / GPT-NeoX rotary_pct / Phi partial_rotary_factor /
    # GPT-J rotary_dim; reference rotary_embedding.py rotary_dim).
    # None = full head_dim.
    rotary_dim: Optional[int] = None
    # "neox": rotate half-split pairs (x_i, x_{i+d/2}); "gptj": rotate
    # interleaved pairs (x_{2i}, x_{2i+1}) (reference get_rope
    # is_neox_style=False — GPT-J, Cohere/CommandR)
    rope_style: str = "neox"          # "neox" | "gptj"
    # parallel_block norm count: 1 = attn and MLP share the input norm
    # (falcon/phi/gptj/cohere); 2 = MLP reads its own post_attention norm of
    # the SAME residual input (GPT-NeoX use_parallel_residual)
    parallel_norms: int = 1
    # additive bias on the vocab projection (phi/gptj ParallelLMHead
    # bias=True); stored as params["lm_head_b"]
    lm_head_bias: bool = False
    # clamp qkv projection outputs to [-clip_qkv, +clip_qkv] (OLMo)
    clip_qkv: Optional[float] = None
    # DeepSeek-V2 Multi-head Latent Attention (reference
    # models/deepseek_v2.py DeepseekV2Attention): keys/values are encoded
    # into a shared low-rank latent c_kv [kv_lora_rank] plus one decoupled
    # rope key [qk_rope_head_dim]; per-head keys/values are up-projections
    # of the latent. Serving uses the weight-absorbed decode form: the
    # cache stores ONLY (c_kv, k_pe) per position — MQA over the latent —
    # and W_UK/W_UV fold into the query/output sides. "mha" = standard.
    attention_type: str = "mha"       # "mha" | "mla"
    kv_lora_rank: int = 512
    q_lora_rank: Optional[int] = None  # None -> direct q projection
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    # DeepSeek-V2 MoE: routed-expert outputs are scaled by this factor
    # before the residual add (reference config routed_scaling_factor)
    routed_scaling_factor: float = 1.0
    # Encoder-decoder family (reference vllm/model_executor/models/bart.py
    # + worker/enc_dec_model_runner.py). The encoder runs once per request
    # (bidirectional, post-LN); its per-decoder-layer cross K/V is written
    # into a SECOND paged cache over encoder positions; decode is the
    # decoder with paged self-KV (models/bart.py).
    encoder_layers: int = 0
    decoder_start_token_id: Optional[int] = None
    # BERT-family embedding pooling (models/bert.py): "cls"|"mean"|"last"
    bert_pooling: str = "cls"
    # whisper audio frontend (models/whisper.py)
    whisper_num_mel: int = 80
    whisper_max_source_positions: int = 1500
    # Mamba selective-state-space family (reference csrc/mamba/ +
    # vllm/model_executor/models/mamba.py). No attention, no paged KV:
    # each sequence carries a constant-size recurrent state
    # (conv tail [d_conv-1, d_inner] + SSM state [d_inner, d_state]) that
    # the engine stores inside the sequence's FIRST cache page
    # (models/mamba.py state-in-page layout) so scheduling, preemption,
    # swap and KV-transfer machinery apply unchanged.
    mamba_d_state: int = 16
    mamba_d_conv: int = 4
    mamba_expand: int = 2
    mamba_dt_rank: Optional[int] = None   # None -> ceil(hidden/16)
    # Mamba2 (SSD; reference models/mamba2.py): multi-head state space
    # with a SCALAR per-head decay, grouped B/C, conv over [x|B|C], and a
    # gated RMSNorm before out_proj. mamba_heads None = Mamba-1.
    mamba_heads: Optional[int] = None
    mamba_n_groups: int = 1
    # softplus(dt) clamp range (HF time_step_limit)
    mamba_dt_min: float = 0.0
    mamba_dt_max: float = 1e30
    # FalconMamba: weightless RMSNorm on the (dt, B, C) ssm parameters
    # before dt_proj / the scan (HF mixer_rms_eps); None = plain Mamba
    mamba_mixer_rms_eps: Optional[float] = None
    # Jamba hybrid layout (reference models/jamba.py): attention layers at
    # li % attn_period == attn_offset (rope-free GQA), mamba elsewhere;
    # sparse MoE feed-forward at li % expert_period == expert_offset
    jamba_attn_period: int = 8
    jamba_attn_offset: int = 4
    jamba_expert_period: int = 2
    jamba_expert_offset: int = 1
    # LLaVA-style VLM (reference vllm/model_executor/models/llava.py):
    # a CLIP-style vision tower (params["vision"]) feeds patch features
    # through the mm projector into the LM's embedding space; prompts
    # Qwen2-Audio-style audio tower (encoder + avg-pool + linear projector
    # into the trunk's embedding space); audio placeholders expand through
    # the same prompt-embeds path as images (multimodal.py)
    audio: Optional[AudioConfig] = None
    # LLaVA-NeXT anyres tiling grid: candidate (h, w) canvas resolutions
    # (HF image_grid_pinpoints); the mapper picks the best fit, tiles the
    # canvas into vision.image_size squares, and packs tile features
    # spatially with unpadding + per-row image_newline
    # (multimodal.llava_next_mapper)
    image_grid_pinpoints: Optional[tuple] = None
    # expand each `image_token_id` placeholder into that image's rows
    # (multimodal.splice_image_embeds)
    vision: Optional["VisionConfig"] = None
    image_token_id: Optional[int] = None

    @property
    def resolved_lm_head_quant(self) -> str:
        if self.lm_head_quant != "auto":
            return self.lm_head_quant
        return "int8" if self.quant in ("w4", "w4g", "w8") else "bf16"

    @property
    def expert_intermediate_size(self) -> int:
        return self.moe_intermediate_size or self.intermediate_size

    # --- KV-cache geometry (may differ from the attention's logical
    # heads: MLA caches ONE latent "head" of kv_lora_rank + rope dims,
    # padded to the Pallas kernel's 128-lane multiple) ---
    @property
    def cache_kv_heads(self) -> int:
        return 1 if self.attention_type == "mla" else self.num_kv_heads

    @property
    def cache_head_dim(self) -> int:
        if self.attention_type == "mla":
            d = self.kv_lora_rank + self.qk_rope_head_dim
            return -(-d // 128) * 128
        # pad small head dims (GPT-2/GPT-J/Phi/StableLM: 64/80/96) to the
        # TPU's 128-lane tile: the paged-attention kernel DMAs page slices
        # straight out of HBM, and Mosaic requires those slices to be
        # tile-aligned in the lane dim (a 64-wide slice of a 128-padded
        # tile is unmaterializable). update_layer zero-pads writes and
        # ops.attention.paged_attention pads q / slices the output.
        return -(-self.head_dim // 128) * 128

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def qkv_out(self) -> int:
        return self.q_size + 2 * self.kv_size

    @staticmethod
    def llama3_8b(**over) -> "ModelConfig":
        return ModelConfig(**over)

    @staticmethod
    def llama3_70b(**over) -> "ModelConfig":
        d = dict(hidden_size=8192, intermediate_size=28672, num_layers=80,
                 num_heads=64, num_kv_heads=8)
        d.update(over)
        return ModelConfig(**d)

    @staticmethod
    def qwen2_7b(**over) -> "ModelConfig":
        d = dict(arch="qwen2", vocab_size=152064, hidden_size=3584,
                 intermediate_size=18944, num_layers=28, num_heads=28,
                 num_kv_heads=4, rope_theta=1000000.0, qkv_bias=True,
                 max_position_embeddings=32768)
        d.update(over)
        return ModelConfig(**d)

    @staticmethod
    def tiny(**over) -> "ModelConfig":
        """Small config for tests: real structure, CPU-sized."""
        d = dict(vocab_size=512, hidden_size=256, intermediate_size=448,
                 num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
                 rope_theta=10000.0, max_position_embeddings=512)
        d.update(over)
        return ModelConfig(**d)

    @staticmethod
    def gemma_7b(**over) -> "ModelConfig":
        d = dict(arch="gemma", vocab_size=256000, hidden_size=3072,
                 intermediate_size=24576, num_layers=28, num_heads=16,
                 num_kv_heads=16, head_dim=256, rope_theta=10000.0,
                 max_position_embeddings=8192, tie_word_embeddings=True,
                 hidden_act="gelu_tanh", embed_scale=3072.0 ** 0.5,
                 norm_weight_offset=1.0)
        d.update(over)
        return ModelConfig(**d)

    @staticmethod
    def gemma_2b(**over) -> "ModelConfig":
        d = dict(arch="gemma", vocab_size=256000, hidden_size=2048,
                 intermediate_size=16384, num_layers=18, num_heads=8,
                 num_kv_heads=1, head_dim=256, rope_theta=10000.0,
                 max_position_embeddings=8192, tie_word_embeddings=True,
                 hidden_act="gelu_tanh", embed_scale=2048.0 ** 0.5,
                 norm_weight_offset=1.0)
        d.update(over)
        return ModelConfig(**d)

    @staticmethod
    def qwen15_moe_a2_7b(**over) -> "ModelConfig":
        d = dict(arch="qwen2moe", vocab_size=151936, hidden_size=2048,
                 intermediate_size=5632, num_layers=24, num_heads=16,
                 num_kv_heads=16, head_dim=128, rope_theta=1000000.0,
                 max_position_embeddings=8192, qkv_bias=True,
                 num_experts=60, num_experts_per_tok=4,
                 moe_intermediate_size=1408,
                 shared_expert_intermediate_size=5632,
                 moe_softmax_before_topk=True)
        d.update(over)
        return ModelConfig(**d)

    @staticmethod
    def mixtral_8x7b(**over) -> "ModelConfig":
        d = dict(arch="mixtral", vocab_size=32000, hidden_size=4096,
                 intermediate_size=14336, num_layers=32, num_heads=32,
                 num_kv_heads=8, rope_theta=1000000.0,
                 max_position_embeddings=32768, num_experts=8,
                 num_experts_per_tok=2)
        d.update(over)
        return ModelConfig(**d)

    @staticmethod
    def from_hf_config(hf: dict) -> "ModelConfig":
        """Build from a HuggingFace config.json dict."""
        mt = hf.get("model_type", "")
        if mt in ("opt", "gpt2", "starcoder2", "falcon", "stablelm",
                  "gpt_neox", "phi", "gptj", "cohere", "olmo", "bloom",
                  "mpt", "jais"):
            return ModelConfig._from_gpt_family(mt, hf)
        if mt == "deepseek_v2":
            # deepseek-v2 (reference models/deepseek_v2.py): MLA attention
            # (low-rank latent KV + decoupled rope key, served in the
            # weight-absorbed MQA-over-latent form) over the V1-style MoE
            # with routed_scaling_factor. yarn rope scaling and
            # group-limited routing (topk_method "group_limited_greedy")
            # are not implemented — V2-Lite-style greedy routing is.
            nh = hf["num_attention_heads"]
            if hf.get("topk_method", "greedy") not in ("greedy", None):
                raise ValueError("deepseek-v2 group-limited routing "
                                 "unsupported (topk_method="
                                 f"{hf['topk_method']!r})")
            if (hf.get("rope_scaling") or {}).get("type") == "yarn":
                raise ValueError("deepseek-v2 yarn rope scaling unsupported")
            n_exp = hf.get("n_routed_experts", 0) or 0
            return ModelConfig(
                arch="deepseek_v2",
                attention_type="mla",
                kv_lora_rank=hf["kv_lora_rank"],
                q_lora_rank=hf.get("q_lora_rank"),
                qk_nope_head_dim=hf["qk_nope_head_dim"],
                qk_rope_head_dim=hf["qk_rope_head_dim"],
                v_head_dim=hf["v_head_dim"],
                rotary_dim=hf["qk_rope_head_dim"],
                routed_scaling_factor=hf.get("routed_scaling_factor", 1.0),
                num_experts=n_exp,
                num_experts_per_tok=hf.get("num_experts_per_tok", 2),
                moe_intermediate_size=hf.get("moe_intermediate_size"),
                shared_expert_intermediate_size=(
                    hf.get("n_shared_experts", 0) or 0)
                * (hf.get("moe_intermediate_size") or 0),
                shared_expert_gated=False,
                first_k_dense=hf.get("first_k_dense_replace", 0),
                moe_softmax_before_topk=True,
                moe_norm_topk_prob=hf.get("norm_topk_prob", False),
                vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"],
                num_layers=hf["num_hidden_layers"], num_heads=nh,
                num_kv_heads=nh,
                head_dim=(hf["qk_nope_head_dim"] + hf["qk_rope_head_dim"]),
                quant="none", weightless_norm=False,
                rope_theta=hf.get("rope_theta", 10000.0),
                rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
                max_position_embeddings=hf.get("max_position_embeddings",
                                               4096),
                tie_word_embeddings=hf.get("tie_word_embeddings", False))
        if mt == "deepseek":
            # deepseek-moe V1 (reference models/deepseek.py): llama
            # attention; MoE on every layer past first_k_dense_replace with
            # softmax-then-topk routing and UNGATED always-on shared experts
            # sized n_shared_experts * moe_intermediate_size
            nh = hf["num_attention_heads"]
            if hf.get("moe_layer_freq", 1) != 1:
                raise ValueError("deepseek moe_layer_freq != 1 unsupported")
            return ModelConfig(
                arch="deepseek",
                num_experts=hf["n_routed_experts"],
                num_experts_per_tok=hf["num_experts_per_tok"],
                moe_intermediate_size=hf["moe_intermediate_size"],
                shared_expert_intermediate_size=(
                    hf.get("n_shared_experts", 0) or 0)
                * hf["moe_intermediate_size"],
                shared_expert_gated=False,
                first_k_dense=hf.get("first_k_dense_replace", 0),
                moe_softmax_before_topk=True,
                moe_norm_topk_prob=hf.get("norm_topk_prob", False),
                vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"],
                num_layers=hf["num_hidden_layers"], num_heads=nh,
                num_kv_heads=hf.get("num_key_value_heads", nh),
                head_dim=hf["hidden_size"] // nh,
                rope_theta=hf.get("rope_theta", 10000.0),
                rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
                max_position_embeddings=hf.get("max_position_embeddings",
                                               4096),
                tie_word_embeddings=hf.get("tie_word_embeddings", False))
        arch = ("qwen3moe" if "qwen3_moe" in mt
                else "qwen3" if "qwen3" in mt
                else "qwen2moe" if "qwen2_moe" in mt
                else "qwen2" if "qwen2" in mt
                else "mixtral" if "mixtral" in mt
                else "gemma2" if "gemma2" in mt
                else "gemma" if "gemma" in mt
                else "granite" if "granite" in mt
                # baichuan (rope variant) and internlm2 ARE the llama graph;
                # only their checkpoint key layouts differ (families.py)
                else "baichuan" if "baichuan" in mt
                else "internlm2" if "internlm2" in mt else "llama")
        nh = hf["num_attention_heads"]
        gemma = arch in ("gemma", "gemma2")
        gemma2 = arch == "gemma2"
        granite = arch == "granite"
        qwen2moe = arch == "qwen2moe"
        qwen3 = arch in ("qwen3", "qwen3moe")
        # qwen3-moe routes like qwen2-moe (softmax over ALL experts, then
        # top-k, then norm_topk_prob renorm) but has no shared expert
        moe = qwen2moe or arch == "qwen3moe"
        return ModelConfig(
            sliding_window_pattern=2 if gemma2 else 1,
            attn_logit_softcap=(hf.get("attn_logit_softcapping")
                                if gemma2 else None),
            final_logit_softcap=(hf.get("final_logit_softcapping")
                                 if gemma2 else None),
            query_pre_attn_scalar=(
                hf.get("query_pre_attn_scalar") if gemma2
                # granite replaces 1/sqrt(d) with attention_multiplier:
                # expressed as the scalar whose **-0.5 equals it
                else hf["attention_multiplier"] ** -2 if granite
                and hf.get("attention_multiplier") else None),
            post_norms=gemma2,
            residual_multiplier=(hf.get("residual_multiplier", 1.0)
                                 if granite else 1.0),
            logits_scaling=hf.get("logits_scaling") if granite else None,
            # Baichuan-13B: llama graph with ALiBi instead of rope (the
            # registry's capital-C entry sets the flag; the 13B HF config
            # carries no explicit marker — the reference keys off the
            # architecture string, models/baichuan.py)
            position_embedding="alibi" if hf.get("_alibi") else "rope",
            moe_intermediate_size=hf.get("moe_intermediate_size"),
            shared_expert_intermediate_size=hf.get(
                "shared_expert_intermediate_size", 0) if qwen2moe else 0,
            moe_norm_topk_prob=hf.get("norm_topk_prob", False),
            moe_softmax_before_topk=moe,
            qk_norm=qwen3,
            hidden_act=("gelu_tanh" if gemma or "gelu" in
                        hf.get("hidden_act", hf.get("hidden_activation", ""))
                        else "silu"),
            embed_scale=(hf["hidden_size"] ** 0.5 if gemma
                         else hf.get("embedding_multiplier")
                         if granite else None),
            norm_weight_offset=1.0 if gemma else 0.0,
            num_experts=hf.get("num_local_experts",
                               hf.get("num_experts", 0) if moe else 0),
            num_experts_per_tok=hf.get("num_experts_per_tok", 2),
            arch=arch,
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=nh,
            num_kv_heads=hf.get("num_key_value_heads", nh),
            head_dim=hf.get("head_dim", hf["hidden_size"] // nh),
            rope_theta=hf.get("rope_theta", 10000.0),
            rope_scaling=hf.get("rope_scaling"),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
            max_position_embeddings=hf.get("max_position_embeddings", 8192),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            qkv_bias=arch in ("qwen2", "qwen2moe"),
            sliding_window=hf.get("sliding_window"),
        )

    @staticmethod
    def _from_gpt_family(mt: str, hf: dict) -> "ModelConfig":
        """Pre-RMSNorm families (reference models/{opt,gpt2,starcoder2,
        falcon}.py): LayerNorm / non-gated MLP / learned-position /
        parallel-block graph knobs instead of per-family module trees."""
        if mt == "opt":
            nh = hf["num_attention_heads"]
            if not hf.get("do_layer_norm_before", True):
                raise ValueError("OPT post-LayerNorm (350m) not supported")
            return ModelConfig(
                arch="opt", norm_type="layernorm", mlp_gated=False,
                position_embedding="learned_opt", parallel_block=False,
                linear_bias=hf.get("enable_bias", True),
                hidden_act=hf.get("activation_function", "relu"),
                vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
                intermediate_size=hf["ffn_dim"],
                num_layers=hf["num_hidden_layers"], num_heads=nh,
                num_kv_heads=nh, head_dim=hf["hidden_size"] // nh,
                max_position_embeddings=hf.get("max_position_embeddings", 2048),
                rms_norm_eps=1e-5, quant="none", weightless_norm=False,
                tie_word_embeddings=hf.get("tie_word_embeddings", True))
        if mt == "gpt2":
            nh = hf["n_head"]
            return ModelConfig(
                arch="gpt2", norm_type="layernorm", mlp_gated=False,
                position_embedding="learned", linear_bias=True,
                hidden_act=hf.get("activation_function", "gelu_new"),
                vocab_size=hf["vocab_size"], hidden_size=hf["n_embd"],
                intermediate_size=hf.get("n_inner") or 4 * hf["n_embd"],
                num_layers=hf["n_layer"], num_heads=nh, num_kv_heads=nh,
                head_dim=hf["n_embd"] // nh,
                max_position_embeddings=hf.get("n_positions", 1024),
                rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
                quant="none", weightless_norm=False,
                tie_word_embeddings=True)
        if mt == "starcoder2":
            nh = hf["num_attention_heads"]
            return ModelConfig(
                arch="starcoder2", norm_type="layernorm", mlp_gated=False,
                linear_bias=hf.get("use_bias", True),
                hidden_act="gelu_tanh",
                vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"],
                num_layers=hf["num_hidden_layers"], num_heads=nh,
                num_kv_heads=hf.get("num_key_value_heads", nh),
                head_dim=hf["hidden_size"] // nh,
                rope_theta=hf.get("rope_theta", 100000.0),
                sliding_window=hf.get("sliding_window"),
                max_position_embeddings=hf.get("max_position_embeddings", 4096),
                rms_norm_eps=hf.get("norm_epsilon", 1e-5),
                quant="none", weightless_norm=False,
                tie_word_embeddings=hf.get("tie_word_embeddings", True))
        if mt == "stablelm":
            # stablelm (reference models/stablelm.py): LayerNorm(+bias),
            # gated silu MLP, PARTIAL rotary (rope_pct/partial_rotary_factor
            # of head_dim), optional qkv bias (use_qkv_bias), GQA
            nh = hf["num_attention_heads"]
            dh = hf["hidden_size"] // nh
            pct = hf.get("partial_rotary_factor", hf.get("rope_pct", 0.25))
            return ModelConfig(
                arch="stablelm", norm_type="layernorm", mlp_gated=True,
                hidden_act="silu",
                linear_bias=False, qkv_bias=hf.get("use_qkv_bias", False),
                rotary_dim=max(2, int(dh * pct)) // 2 * 2,
                vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"],
                num_layers=hf["num_hidden_layers"], num_heads=nh,
                num_kv_heads=hf.get("num_key_value_heads", nh), head_dim=dh,
                rope_theta=hf.get("rope_theta", 10000.0),
                max_position_embeddings=hf.get("max_position_embeddings",
                                               4096),
                rms_norm_eps=hf.get("layer_norm_eps", 1e-5),
                quant="none", weightless_norm=False,
                tie_word_embeddings=hf.get("tie_word_embeddings", False))
        if mt == "gpt_neox":
            # GPT-NeoX/Pythia (reference models/gpt_neox.py): LayerNorm,
            # biases, non-gated gelu MLP, partial rotary (rotary_pct),
            # use_parallel_residual blocks with TWO norms (attention and
            # MLP each norm the same residual input)
            nh = hf["num_attention_heads"]
            dh = hf["hidden_size"] // nh
            return ModelConfig(
                arch="gpt_neox", norm_type="layernorm", mlp_gated=False,
                parallel_block=hf.get("use_parallel_residual", True),
                parallel_norms=2, linear_bias=True,
                hidden_act=hf.get("hidden_act", "gelu"),
                rotary_dim=max(2, int(dh * hf.get("rotary_pct", 0.25)))
                // 2 * 2,
                vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"],
                num_layers=hf["num_hidden_layers"], num_heads=nh,
                num_kv_heads=nh, head_dim=dh,
                rope_theta=hf.get("rotary_emb_base", 10000.0),
                max_position_embeddings=hf.get("max_position_embeddings",
                                               2048),
                rms_norm_eps=hf.get("layer_norm_eps", 1e-5),
                quant="none", weightless_norm=False,
                tie_word_embeddings=hf.get("tie_word_embeddings", False))
        if mt == "phi":
            # phi-1/1.5/2 (reference models/phi.py): parallel attn+MLP
            # sharing ONE input LayerNorm, partial rotary, gelu_new MLP,
            # biases everywhere, lm_head WITH bias, untied
            nh = hf["num_attention_heads"]
            dh = hf["hidden_size"] // nh
            pct = hf.get("partial_rotary_factor", 0.5)
            return ModelConfig(
                arch="phi", norm_type="layernorm", mlp_gated=False,
                parallel_block=True, parallel_norms=1, linear_bias=True,
                lm_head_bias=True,
                hidden_act=hf.get("hidden_act", "gelu_new"),
                rotary_dim=max(2, int(dh * pct)) // 2 * 2,
                vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"],
                num_layers=hf["num_hidden_layers"], num_heads=nh,
                num_kv_heads=hf.get("num_key_value_heads", nh) or nh,
                head_dim=dh,
                rope_theta=hf.get("rope_theta", 10000.0),
                max_position_embeddings=hf.get("max_position_embeddings",
                                               2048),
                rms_norm_eps=hf.get("layer_norm_eps", 1e-5),
                quant="none", weightless_norm=False,
                tie_word_embeddings=hf.get("tie_word_embeddings", False))
        if mt == "gptj":
            # GPT-J (reference models/gpt_j.py): parallel attn+MLP sharing
            # ln_1, INTERLEAVED (gptj-style) partial rotary over rotary_dim,
            # gelu_new fc MLP with biases, attention without biases,
            # lm_head with bias, untied
            nh = hf["n_head"]
            dh = hf["n_embd"] // nh
            return ModelConfig(
                arch="gptj", norm_type="layernorm", mlp_gated=False,
                parallel_block=True, parallel_norms=1, linear_bias=False,
                lm_head_bias=True, rope_style="gptj",
                hidden_act=hf.get("activation_function", "gelu_new"),
                rotary_dim=hf.get("rotary_dim") or dh,
                vocab_size=hf["vocab_size"], hidden_size=hf["n_embd"],
                intermediate_size=hf.get("n_inner") or 4 * hf["n_embd"],
                num_layers=hf["n_layer"], num_heads=nh,
                num_kv_heads=nh, head_dim=dh,
                rope_theta=10000.0,
                max_position_embeddings=hf.get("n_positions", 2048),
                rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
                quant="none", weightless_norm=False,
                tie_word_embeddings=hf.get("tie_word_embeddings", False))
        if mt == "cohere":
            # Cohere/CommandR (reference models/commandr.py): parallel
            # attn+MLP sharing one bias-free LayerNorm, gptj-style
            # (non-neox) rope, gated silu MLP, ALWAYS-tied embeddings,
            # final logits multiplied by logit_scale
            nh = hf["num_attention_heads"]
            if hf.get("use_qk_norm"):
                raise ValueError("cohere use_qk_norm (per-head LayerNorm) "
                                 "not supported")
            scale = hf.get("logit_scale", 1.0)
            return ModelConfig(
                arch="cohere", norm_type="layernorm", mlp_gated=True,
                parallel_block=True, parallel_norms=1, linear_bias=False,
                qkv_bias=hf.get("attention_bias", False),
                rope_style="gptj", hidden_act="silu",
                logits_scaling=(1.0 / scale) if scale != 1.0 else None,
                vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"],
                num_layers=hf["num_hidden_layers"], num_heads=nh,
                num_kv_heads=hf.get("num_key_value_heads", nh),
                head_dim=hf["hidden_size"] // nh,
                rope_theta=hf.get("rope_theta", 10000.0),
                max_position_embeddings=hf.get("max_position_embeddings",
                                               8192),
                rms_norm_eps=hf.get("layer_norm_eps", 1e-5),
                quant="none", weightless_norm=False,
                tie_word_embeddings=True)
        if mt == "olmo":
            # OLMo (reference models/olmo.py): NON-PARAMETRIC LayerNorm
            # (converter stores gamma=1/beta=0), gated silu MLP, no biases,
            # optional clip_qkv clamp
            nh = hf["num_attention_heads"]
            return ModelConfig(
                arch="olmo", norm_type="layernorm", mlp_gated=True,
                hidden_act="silu", linear_bias=False,
                clip_qkv=hf.get("clip_qkv"),
                vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
                intermediate_size=hf["intermediate_size"],
                num_layers=hf["num_hidden_layers"], num_heads=nh,
                num_kv_heads=hf.get("num_key_value_heads", nh),
                head_dim=hf["hidden_size"] // nh,
                rope_theta=hf.get("rope_theta", 10000.0),
                max_position_embeddings=hf.get("max_position_embeddings",
                                               2048),
                rms_norm_eps=1e-5,
                quant="none", weightless_norm=False,
                tie_word_embeddings=hf.get("tie_word_embeddings", True))
        if mt == "bloom":
            # BLOOM (reference models/bloom.py): ALiBi, LayerNorm + biases,
            # non-gated tanh-gelu MLP of width 4H, head-interleaved fused
            # query_key_value, an embedding LayerNorm
            # (word_embeddings_layernorm), tied lm_head
            nh = hf["n_head"]
            return ModelConfig(
                arch="bloom", norm_type="layernorm", mlp_gated=False,
                position_embedding="alibi", linear_bias=True,
                parallel_block=False, hidden_act="gelu_tanh",
                vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
                intermediate_size=4 * hf["hidden_size"],
                num_layers=hf["n_layer"], num_heads=nh, num_kv_heads=nh,
                head_dim=hf["hidden_size"] // nh,
                max_position_embeddings=hf.get("seq_length", 8192),
                rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
                quant="none", weightless_norm=False,
                tie_word_embeddings=True)
        if mt == "mpt":
            # MPT (reference models/mpt.py): ALiBi, LayerNorm (bias-free
            # when no_bias), fused Wqkv, non-gated gelu MLP of
            # expansion_ratio*d, tied embeddings, optional clip_qkv
            ac = hf.get("attn_config", {}) or {}
            if not ac.get("alibi", True):
                raise ValueError("MPT without ALiBi (learned positions) is "
                                 "not supported")
            if ac.get("qk_ln"):
                raise ValueError("MPT qk_ln is not supported")
            nh = hf["n_heads"]
            return ModelConfig(
                arch="mpt", norm_type="layernorm", mlp_gated=False,
                position_embedding="alibi",
                linear_bias=not hf.get("no_bias", True),
                clip_qkv=ac.get("clip_qkv"),
                parallel_block=False, hidden_act="gelu",
                vocab_size=hf["vocab_size"], hidden_size=hf["d_model"],
                intermediate_size=int(hf.get("expansion_ratio", 4)
                                      * hf["d_model"]),
                num_layers=hf["n_layers"], num_heads=nh,
                num_kv_heads=ac.get("kv_n_heads", nh) or nh,
                head_dim=hf["d_model"] // nh,
                max_position_embeddings=hf.get("max_seq_len", 2048),
                rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
                quant="none", weightless_norm=False,
                tie_word_embeddings=True)
        if mt == "jais":
            # JAIS (reference models/jais.py, custom remote code): GPT-2
            # skeleton (LayerNorm + biases, fused c_attn) with ALiBi, a
            # GATED swiglu MLP, muP scaling knobs: embeddings *
            # embeddings_scale, logits * width_scale, and attention scores
            # scaled 1/d instead of 1/sqrt(d) (scale_qk_dot_by_d) — 1/d ==
            # (d^2)^-0.5 rides query_pre_attn_scalar
            nh = hf["n_head"]
            dh = hf["n_embd"] // nh
            emb_scale = hf.get("mup_embeddings_scale",
                               hf.get("embeddings_scale", 1.0))
            width_scale = (hf.get("mup_output_alpha", 1.0)
                           * hf.get("mup_width_scale", 1.0)
                           if "mup_output_alpha" in hf
                           else hf.get("width_scale", 1.0))
            return ModelConfig(
                arch="jais", norm_type="layernorm", mlp_gated=True,
                position_embedding=("alibi"
                                    if hf.get("position_embedding_type",
                                              "alibi") == "alibi"
                                    else "learned"),
                linear_bias=True, hidden_act="silu",
                embed_scale=emb_scale if emb_scale != 1.0 else None,
                logits_scaling=(1.0 / width_scale
                                if width_scale != 1.0 else None),
                query_pre_attn_scalar=(dh * dh
                                       if hf.get("scale_qk_dot_by_d")
                                       else None),
                vocab_size=hf["vocab_size"], hidden_size=hf["n_embd"],
                intermediate_size=hf.get("n_inner") or 4 * hf["n_embd"],
                num_layers=hf["n_layer"], num_heads=nh, num_kv_heads=nh,
                head_dim=dh,
                max_position_embeddings=hf.get("n_positions", 2048),
                rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
                quant="none", weightless_norm=False,
                tie_word_embeddings=True)
        # falcon: fused qkv, gelu MLP of width 4H; parallel blocks (7B/40B
        # rope lineage) or sequential pre-LN blocks with ALiBi (falcon-rw)
        nh = hf["num_attention_heads"]
        alibi = bool(hf.get("alibi"))
        nkv = (hf.get("num_kv_heads", nh)
               if hf.get("new_decoder_architecture") else
               (1 if hf.get("multi_query", True) else nh))
        return ModelConfig(
            arch="falcon", norm_type="layernorm", mlp_gated=False,
            parallel_block=hf.get("parallel_attn", True),
            linear_bias=hf.get("bias", False),
            position_embedding="alibi" if alibi else "rope",
            hidden_act="gelu",
            vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
            intermediate_size=hf.get("ffn_hidden_size", 4 * hf["hidden_size"]),
            num_layers=hf["num_hidden_layers"], num_heads=nh,
            num_kv_heads=nkv, head_dim=hf["hidden_size"] // nh,
            rope_theta=hf.get("rope_theta", 10000.0),
            max_position_embeddings=hf.get("max_position_embeddings", 2048),
            rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
            quant="none", weightless_norm=False,
            tie_word_embeddings=hf.get("tie_word_embeddings", True))


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    """Paged KV cache sizing (reference: vllm/config.py:950 CacheConfig)."""

    # 128-token pages: the Pallas attention kernel streams one page per
    # pipeline stage, so big pages mean few, large DMAs (~470 GB/s vs
    # ~180 GB/s at 16-token pages on v5e). 16 is fine for CPU tests.
    page_size: int = 128
    num_pages: Optional[int] = None      # None -> derive from memory fraction
    kv_cache_dtype: str = "bfloat16"     # "bfloat16"|"int8"|"fp8_e4m3"|"fp8_e5m2"
    enable_prefix_caching: bool = True
    gpu_memory_utilization: float = 0.9  # kept name-compatible; means HBM here
    # host RAM budget for swap-mode preemption (reference swap_space,
    # vllm/config.py:950): preempted sequences' KV pages park in host
    # memory instead of being recomputed
    swap_space_gb: float = 4.0


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Continuous-batching knobs (reference: vllm/config.py:1366)."""

    max_num_seqs: int = 8
    max_num_batched_tokens: int = 2048
    max_model_len: int = 4096
    enable_chunked_prefill: bool = True
    prefill_chunk_size: int = 512
    # co-schedule running decodes with prefill chunks (reference
    # _schedule_chunked_prefill mixes phases, vllm/core/scheduler.py:1151):
    # every prefill iteration also advances the running batch one decode
    # step, so admissions don't spike inter-token latency
    mix_decode_with_prefill: bool = True
    # "recompute" re-prefills preempted sequences (reference RECOMPUTE,
    # the TPU worker default); "swap" parks their KV pages in host RAM
    # (reference PreemptionMode.SWAP + CacheEngine swap_in/swap_out) and
    # restores them device-side on resume — cheaper than recompute for
    # long contexts at the cost of PCIe/host traffic
    preemption_mode: str = "recompute"
    # fused AR decode steps per host call (multi-step runner analogue)
    steps_per_decode_call: int = 1
    # static-shape buckets for the jitted step fns (TPU-specific)
    decode_batch_buckets: tuple = (1, 2, 4, 8, 16, 32)
    prefill_token_buckets: tuple = (128, 256, 512, 1024, 2048)


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Mesh shape (replaces reference TP/PP worker fan-out, config.py:1219)."""

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1


@dataclasses.dataclass(frozen=True)
class SpeculativeConfig:
    """QSpec speculative decoding (reference: vllm/config.py:1567)."""

    num_speculative_tokens: int = 3
    # draft scheme; verify is always w4a16. "w4a4" is the QSpec method.
    draft_scheme: str = "w4a4"
    # fused rounds per host call: each engine step runs this many complete
    # draft+verify rounds on device (amortizes host round-trips; the TPU
    # analogue of the reference's multi-step runner)
    rounds_per_step: int = 1
    # disable speculation above this batch size (reference
    # speculative_disable_by_batch_size)
    disable_by_batch_size: Optional[int] = None
    # "qspec": w4a4 model draft; "ngram": device-side prompt lookup
    # (ngram_worker.py analogue); "null": same executable as "ngram" with
    # proposals disabled — the bit-exact autoregressive oracle used to
    # demonstrate lossless rejection sampling on hardware; "medusa":
    # trained multi-token heads riding the verify pass's hidden state
    # (medusa_worker.py analogue; heads in params["medusa"], see
    # spec_decode/medusa.py + benchmarks/train_medusa.py); "eagle":
    # one-layer draft transformer over (embed, hidden) features with its
    # own draft KV cache (models/eagle.py analogue; net in params["eagle"],
    # spec_decode/eagle.py + benchmarks/train_eagle.py)
    # "mlp_speculator": IBM recurrent token/embedding speculator heads
    # (mlp_speculator.py analogue; net in params["mlp_spec"], see
    # spec_decode/mlp_speculator.py + benchmarks/train_mlp_speculator.py)
    # "qspec_null": the spec_rounds executable with proposals nulled — the
    # model-draft path's bit-exact AR oracle (mirrors "null" for ngram)
    method: str = "qspec"  # "qspec"|"qspec_null"|"ngram"|"null"|"medusa"|"eagle"|"mlp_speculator"
    # SEPARATE draft model (reference draft_model_config / multi_step_worker
    # + smaller_tp_proposer_worker.py): a smaller LM proposes, the target
    # verifies; must share the target's vocabulary. On a TP mesh the draft's
    # weights are REPLICATED and its forward runs collective-free on every
    # chip — the TPU-idiomatic draft-TP=1 vs target-TP=N split (no separate
    # process group needed; ICI carries zero draft traffic). None = QSpec
    # shared-weights dual-scheme drafting.
    draft_model: Optional[ModelConfig] = None
    # Medusa candidate TREE (reference models/medusa.py heads + the Medusa
    # paper's tree attention; the reference scores top-k continuations per
    # head): a tuple of paths in Medusa-choices format, e.g.
    # ((0,), (1,), (0, 0), ...) — see spec_decode/medusa_tree.py
    # (DEFAULT_TREE). None = single top-1 chain per round. Tree mode walks
    # target-sampled tokens down the candidate tree, which is lossless at
    # any temperature; it does not compose with guided decoding.
    medusa_tree: Optional[tuple] = None
    # "rejection_sampler" (lossless) | "typical_acceptance_sampler" (lossy)
    acceptance_method: str = "rejection_sampler"
    ngram_prompt_lookup_max: int = 4
    ngram_prompt_lookup_min: int = 1
    # Sliding-window cap on the shared-weights draft's attention (MagicDec /
    # StreamingLLM-style draft; the reference's analogous knob is
    # speculative_max_model_len, vllm/config.py): the w4a4/w4a8 draft reads
    # only the last `draft_kv_window` KV positions, so at long context its
    # per-step KV traffic is ~window/ctx of the target's — the regime where
    # shared-weights speculation beats a bandwidth-floor AR baseline on
    # physics. Losslessness is unaffected (verification is full-context);
    # only acceptance depends on the window covering the model's effective
    # lookback. None = full-context drafting.
    draft_kv_window: Optional[int] = None
    # TIMING-HARNESS ONLY: force every round to accept exactly this many
    # draft tokens (+1 recovery/bonus) regardless of the rejection-sampler
    # outcome. All device work (k draft forwards + the full verify pass +
    # rejection arithmetic) still runs, so wall time is honest — but the
    # emitted tokens are NOT the target's greedy continuation. Used to
    # sweep throughput-vs-acceptance at dims whose weights are synthetic
    # (the 8B-dims regime: no honest in-image-trainable checkpoint at that
    # scale); the real acceptance to read the curve at comes from the
    # trained draft/target pair at in-image scale (bench.py medium-draft).
    force_accept_len: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Composed config (reference VllmConfig, config.py:2959)."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    cache: CacheConfig = dataclasses.field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    speculative: Optional[SpeculativeConfig] = None
