"""Round-5 zoo sweep: OLMoE / PhiMoE / DeepSeek-V3 HF-golden tests plus the
llama-lineage alias registrations (reference models/registry.py:30-109).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.model_loader.families import load_family_float  # noqa: E402
from qspec_tpu.model_loader.loader import load_hf_float  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402

TOKENS = list(range(2, 14))


def run_ours(params, cfg, tokens):
    T = len(tokens)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.cache_kv_heads,
                               head_dim=cfg.cache_head_dim, num_pages=8,
                               page_size=16)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    logits, _ = model_forward(params, cfg, jnp.asarray(np.asarray(tokens)[None]),
                              cache, batch, scheme="bf16")
    return np.asarray(logits[0], np.float32)


def check(hf_model, hf_cfg_dict, atol=0.3, loader="family"):
    cfg = resolve(hf_cfg_dict)
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    if loader == "family":
        params, cfg = load_family_float(sd, cfg)
    else:
        params, cfg = load_hf_float(sd, cfg)
    got = run_ours(params, cfg, TOKENS)
    with torch.no_grad():
        want = hf_model(torch.tensor([TOKENS])).logits[0].numpy()
    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.08
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.9, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=atol, rtol=0.06)
    return cfg


def test_olmoe_vs_hf():
    hf_cfg = transformers.OlmoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=64, rope_theta=10000.0)
    torch.manual_seed(0)
    hf = transformers.OlmoeForCausalLM(hf_cfg).eval()
    cfg = check(hf, {**hf_cfg.to_dict(),
                     "architectures": ["OlmoeForCausalLM"]}, loader="hf")
    assert cfg.arch == "olmoe" and cfg.qk_norm
    assert cfg.num_experts == 4


def test_phimoe_vs_hf():
    hf_cfg = transformers.PhimoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, rope_theta=10000.0,
        attention_bias=True, lm_head_bias=True, sliding_window=None,
        router_jitter_noise=0.0, input_jitter_noise=0.0)
    torch.manual_seed(0)
    hf = transformers.PhimoeForCausalLM(hf_cfg).eval()
    cfg = check(hf, {**hf_cfg.to_dict(),
                     "architectures": ["PhiMoEForCausalLM"]}, loader="hf")
    assert cfg.arch == "phimoe" and cfg.moe_routing == "sparsemixer"
    assert cfg.norm_type == "layernorm" and cfg.lm_head_bias


def test_deepseek_v3_vs_hf():
    hf_cfg = transformers.DeepseekV3Config(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, routed_scaling_factor=2.0,
        kv_lora_rank=32, q_lora_rank=48, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32, first_k_dense_replace=1,
        norm_topk_prob=True, max_position_embeddings=64,
        rope_theta=10000.0, rope_scaling=None, scoring_func="sigmoid",
        topk_method="noaux_tc", attention_bias=False)
    torch.manual_seed(0)
    hf = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
    # make the selection bias matter: give it real values
    with torch.no_grad():
        for layer in hf.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.5, 0.5)
    cfg = check(hf, {**hf_cfg.to_dict(),
                     "architectures": ["DeepseekV3ForCausalLM"]})
    assert cfg.arch == "deepseek_v3" and cfg.moe_routing == "noaux_tc"
    assert cfg.moe_n_group == 2 and cfg.moe_topk_group == 1
    assert cfg.routed_scaling_factor == 2.0


def test_minicpm_scales():
    """MiniCPM muP knobs (reference models/minicpm.py): embeddings *
    scale_emb, residual * scale_depth/sqrt(L), logits / (H/dim_model_base).
    Remote-code upstream -> knob-mapping + scaled-forward sanity."""
    import math
    hf = {"architectures": ["MiniCPMForCausalLM"], "vocab_size": 256,
          "hidden_size": 64, "intermediate_size": 128,
          "num_hidden_layers": 2, "num_attention_heads": 4,
          "num_key_value_heads": 4, "max_position_embeddings": 64,
          "scale_emb": 12.0, "scale_depth": 1.4, "dim_model_base": 32,
          "rms_norm_eps": 1e-5, "tie_word_embeddings": True}
    cfg = resolve(hf)
    assert cfg.arch == "minicpm"
    assert cfg.embed_scale == pytest.approx(12.0)
    assert cfg.residual_multiplier == pytest.approx(1.4 / math.sqrt(2))
    assert cfg.logits_scaling == pytest.approx(64 / 32)
    import dataclasses
    cfg = dataclasses.replace(cfg, quant="none", weightless_norm=False)
    from qspec_tpu.models.llama import init_params
    params = init_params(cfg, seed=0)
    got = run_ours(params, cfg, TOKENS)
    assert np.isfinite(got).all()
    # the scales must be live: unscaled config produces different logits
    flat = dataclasses.replace(cfg, embed_scale=None,
                               residual_multiplier=1.0, logits_scaling=None)
    assert not np.allclose(got, run_ours(params, flat, TOKENS), atol=1e-3)


def test_minicpm3_is_mla():
    hf = {"architectures": ["MiniCPM3ForCausalLM"], "vocab_size": 256,
          "hidden_size": 64, "intermediate_size": 128,
          "num_hidden_layers": 2, "num_attention_heads": 4,
          "kv_lora_rank": 32, "q_lora_rank": 48, "qk_rope_head_dim": 16,
          "qk_nope_head_dim": 32, "v_head_dim": 16,
          "scale_emb": 12.0, "scale_depth": 1.4, "dim_model_base": 256,
          "max_position_embeddings": 64}
    cfg = resolve(hf)
    assert cfg.attention_type == "mla" and cfg.q_lora_rank == 48
    assert cfg.embed_scale == pytest.approx(12.0)


def test_alias_registrations_resolve():
    base = {"vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 4, "max_position_embeddings": 64}
    for arch, want in [
            ("AquilaForCausalLM", "llama"), ("AquilaModel", "llama"),
            ("LLaMAForCausalLM", "llama"), ("LlamaModel", "llama"),
            ("Fairseq2LlamaForCausalLM", "llama"),
            ("MistralModel", "llama"), ("XverseForCausalLM", "llama"),
            ("SolarForCausalLM", "llama"),
            ("InternLM3ForCausalLM", "llama")]:
        cfg = resolve({**base, "architectures": [arch]})
        assert cfg.arch == want, arch
    cfg = resolve({**base, "architectures": ["Qwen2Model"]})
    assert cfg.qkv_bias
    cfg = resolve({**base, "architectures": ["InternLMForCausalLM"],
                   "bias": True})
    assert cfg.qkv_bias and cfg.linear_bias
    cfg = resolve({**base, "architectures": ["OrionForCausalLM"]})
    assert cfg.norm_type == "layernorm"
    cfg = resolve({**base, "architectures": ["DeciLMForCausalLM"],
                   "num_key_value_heads_per_layer": [4, 4]})
    assert cfg.num_kv_heads == 4
    with pytest.raises(ValueError, match="variable"):
        resolve({**base, "architectures": ["DeciLMForCausalLM"],
                 "num_key_value_heads_per_layer": [4, 2]})
    with pytest.raises(ValueError, match="bskcn"):
        resolve({**base, "architectures": ["SolarForCausalLM"],
                 "bskcn_1": [1]})


def test_orion_layernorm_forward():
    """Orion = llama projections + biased LayerNorm: the graph must run and
    differ from the rmsnorm run of the same weights."""
    base = {"architectures": ["OrionForCausalLM"], "vocab_size": 256,
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 4, "max_position_embeddings": 64}
    cfg = resolve(base)
    import dataclasses
    cfg = dataclasses.replace(cfg, quant="none", weightless_norm=False)
    from qspec_tpu.models.llama import init_params
    params = init_params(cfg, seed=0)
    got = run_ours(params, cfg, TOKENS)
    assert np.isfinite(got).all()


# -- remote-code families: layout-translation tests (the graphs are the
# llama/ChatGLM knob sets already golden-tested; key layout is the whole
# correctness question, like Baichuan/InternLM2 in test_gpt_family.py) ----

def _llama_sd_mha(seed, nh=4):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=nh, num_key_value_heads=nh,
        max_position_embeddings=64)
    torch.manual_seed(seed)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    return {k: v.detach().numpy() for k, v in hf.state_dict().items()}


def _assert_params_equal(a, b):
    import jax
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_qwen1_layout():
    sd = _llama_sd_mha(seed=7)
    qsd = {"transformer.wte.weight": sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    rng = np.random.default_rng(0)
    for i in range(2):
        p, o = f"transformer.h.{i}.", f"model.layers.{i}."
        qsd[p + "attn.c_attn.weight"] = np.concatenate(
            [sd[o + "self_attn.q_proj.weight"],
             sd[o + "self_attn.k_proj.weight"],
             sd[o + "self_attn.v_proj.weight"]], axis=0)
        qsd[p + "attn.c_attn.bias"] = rng.standard_normal(192).astype(np.float32)
        qsd[p + "attn.c_proj.weight"] = sd[o + "self_attn.o_proj.weight"]
        qsd[p + "mlp.w2.weight"] = sd[o + "mlp.gate_proj.weight"]
        qsd[p + "mlp.w1.weight"] = sd[o + "mlp.up_proj.weight"]
        qsd[p + "mlp.c_proj.weight"] = sd[o + "mlp.down_proj.weight"]
        qsd[p + "ln_1.weight"] = sd[o + "input_layernorm.weight"]
        qsd[p + "ln_2.weight"] = sd[o + "post_attention_layernorm.weight"]
    cfg = resolve({"architectures": ["QWenLMHeadModel"], "vocab_size": 256,
                   "hidden_size": 64, "intermediate_size": 256,  # doubled
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "seq_length": 64, "layer_norm_epsilon": 1e-5})
    assert cfg.arch == "qwen" and cfg.qkv_bias
    assert cfg.intermediate_size == 128  # halved from the doubled config
    params, cfg = load_family_float(qsd, cfg)
    got = run_ours(params, cfg, TOKENS)
    assert np.isfinite(got).all()
    # qkv bias survived the remap in q|k|v order
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["qkv"]["b"][0], np.float32),
        qsd["transformer.h.0.attn.c_attn.bias"].astype(jnp.bfloat16)
        .astype(np.float32))


def test_exaone_layout_matches_llama():
    sd = _llama_sd_mha(seed=8)
    esd = {"transformer.wte.weight": sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for i in range(2):
        p, o = f"transformer.h.{i}.", f"model.layers.{i}."
        a = p + "attn.attention."
        for n in ("q", "k", "v"):
            esd[a + f"{n}_proj.weight"] = sd[o + f"self_attn.{n}_proj.weight"]
        esd[a + "out_proj.weight"] = sd[o + "self_attn.o_proj.weight"]
        esd[p + "mlp.c_fc_0.weight"] = sd[o + "mlp.gate_proj.weight"]
        esd[p + "mlp.c_fc_1.weight"] = sd[o + "mlp.up_proj.weight"]
        esd[p + "mlp.c_proj.weight"] = sd[o + "mlp.down_proj.weight"]
        esd[p + "ln_1.weight"] = sd[o + "input_layernorm.weight"]
        esd[p + "ln_2.weight"] = sd[o + "post_attention_layernorm.weight"]
    cfg = resolve({"architectures": ["ExaoneForCausalLM"], "vocab_size": 256,
                   "hidden_size": 64, "intermediate_size": 128,
                   "num_layers": 2, "num_attention_heads": 4,
                   "num_key_value_heads": 4,
                   "max_position_embeddings": 64})
    assert cfg.arch == "exaone"
    params, cfg = load_family_float(esd, cfg)
    want, _ = load_hf_float(sd, cfg)
    _assert_params_equal(params["layers"], want["layers"])


def test_telechat2_kv_deinterleave():
    sd = _llama_sd_mha(seed=9)
    nh, dh = 4, 16
    rng = np.random.default_rng(1)
    tsd = {"transformer.word_embeddings.weight": sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for i in range(2):
        p, o = f"transformer.h.{i}.", f"model.layers.{i}."
        k = sd[o + "self_attn.k_proj.weight"].reshape(nh, dh, -1)
        v = sd[o + "self_attn.v_proj.weight"].reshape(nh, dh, -1)
        tsd[p + "self_attention.key_value.weight"] = np.stack(
            [k, v], axis=1).reshape(nh * 2 * dh, -1)
        tsd[p + "self_attention.query.weight"] = sd[o + "self_attn.q_proj.weight"]
        tsd[p + "self_attention.dense.weight"] = sd[o + "self_attn.o_proj.weight"]
        tsd[p + "self_attention.dense.bias"] = rng.standard_normal(64).astype(np.float32)
        for n in ("gate", "up", "down"):
            tsd[p + f"mlp.{n}_proj.weight"] = sd[o + f"mlp.{n}_proj.weight"]
        tsd[p + "mlp.down_proj.bias"] = rng.standard_normal(64).astype(np.float32)
        tsd[p + "input_layernorm.weight"] = sd[o + "input_layernorm.weight"]
        tsd[p + "post_attention_layernorm.weight"] = \
            sd[o + "post_attention_layernorm.weight"]
    cfg = resolve({"architectures": ["TeleChat2ForCausalLM"],
                   "vocab_size": 256, "hidden_size": 64,
                   "ffn_hidden_size": 128, "n_layer": 2, "n_head": 4,
                   "seq_length": 64})
    assert cfg.arch == "telechat2"
    params, cfg = load_family_float(tsd, cfg)
    # k/v de-interleaved back to llama order + biases live
    want, _ = load_hf_float(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["qkv"]["w"]),
        np.asarray(want["layers"]["qkv"]["w"]))
    assert "b" in params["layers"]["o"] and "b" in params["layers"]["down"]
    got = run_ours(params, cfg, TOKENS)
    assert np.isfinite(got).all()


def test_chatglm_layout_and_knobs():
    rng = np.random.default_rng(3)
    H, I, V, L, NH, G, DH = 64, 96, 128, 2, 4, 2, 16
    sd = {"transformer.embedding.word_embeddings.weight":
          rng.standard_normal((V, H)).astype(np.float32),
          "transformer.encoder.final_layernorm.weight":
          np.ones(H, np.float32),
          "transformer.output_layer.weight":
          rng.standard_normal((V, H)).astype(np.float32)}
    qkv_out = NH * DH + 2 * G * DH
    for i in range(L):
        p = f"transformer.encoder.layers.{i}."
        sd[p + "self_attention.query_key_value.weight"] = \
            rng.standard_normal((qkv_out, H)).astype(np.float32)
        sd[p + "self_attention.query_key_value.bias"] = \
            rng.standard_normal(qkv_out).astype(np.float32)
        sd[p + "self_attention.dense.weight"] = \
            rng.standard_normal((H, NH * DH)).astype(np.float32)
        sd[p + "mlp.dense_h_to_4h.weight"] = \
            rng.standard_normal((2 * I, H)).astype(np.float32)
        sd[p + "mlp.dense_4h_to_h.weight"] = \
            rng.standard_normal((H, I)).astype(np.float32)
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
    cfg = resolve({"architectures": ["ChatGLMModel"], "padded_vocab_size": V,
                   "hidden_size": H, "ffn_hidden_size": I, "num_layers": L,
                   "num_attention_heads": NH, "kv_channels": DH,
                   "multi_query_attention": True,
                   "multi_query_group_num": G, "add_qkv_bias": True,
                   "original_rope": True, "seq_length": 64})
    assert cfg.arch == "chatglm" and cfg.num_kv_heads == G
    assert cfg.rotary_dim == DH // 2 and cfg.rope_style == "gptj"
    params, cfg = load_family_float(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["qkv"]["w"][0], np.float32),
        sd["transformer.encoder.layers.0.self_attention.query_key_value"
           ".weight"].T.astype(jnp.bfloat16).astype(np.float32))
    got = run_ours(params, cfg, TOKENS)
    assert np.isfinite(got).all()


# -- classifier / reward heads + RoBERTa family -----------------------------

def _cls_logits_ours(params, cfg, tokens):
    from qspec_tpu.models.bert import embed_bert_step
    toks = jnp.asarray(np.asarray(tokens)[None])
    valid = jnp.ones_like(toks, bool)
    pooled = np.asarray(embed_bert_step(params, toks, valid, cfg=cfg,
                                        pooling="cls"), np.float32)[0]
    h = params["score_head"]
    x = pooled @ np.asarray(h["w1"], np.float32) + np.asarray(h["b1"])
    x = np.tanh(x)
    return x @ np.asarray(h["w"], np.float32) + np.asarray(h["b"])


def test_roberta_classifier_vs_hf():
    """XLM-R/bge-reranker-style cross-encoder: position offset + the
    dense->tanh->out_proj head must reproduce HF's classification logits."""
    from qspec_tpu.models.bert import convert_bert

    hf_cfg = transformers.RobertaConfig(
        vocab_size=120, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=40, pad_token_id=1, num_labels=1,
        type_vocab_size=1)
    torch.manual_seed(0)
    hf = transformers.RobertaForSequenceClassification(hf_cfg).eval()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["RobertaForSequenceClassification"]})
    assert cfg.arch == "bert" and cfg.bert_pos_offset == 2
    assert cfg.num_labels == 1
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_bert(sd, cfg)
    toks = [5, 9, 14, 3, 22, 8]
    got = _cls_logits_ours(params, cfg, toks)
    with torch.no_grad():
        want = hf(torch.tensor([toks])).logits[0].numpy()
    np.testing.assert_allclose(got, want, atol=0.03, rtol=0.03)


def test_bert_classifier_vs_hf():
    from qspec_tpu.models.bert import convert_bert

    hf_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=40, num_labels=3)
    torch.manual_seed(1)
    hf = transformers.BertForSequenceClassification(hf_cfg).eval()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["BertForSequenceClassification"]})
    assert cfg.num_labels == 3 and cfg.bert_pos_offset == 0
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_bert(sd, cfg)
    toks = [5, 9, 14, 3, 22, 8]
    got = _cls_logits_ours(params, cfg, toks)
    with torch.no_grad():
        want = hf(torch.tensor([toks])).logits[0].numpy()
    np.testing.assert_allclose(got, want, atol=0.03, rtol=0.03)


def test_roberta_embedding_vs_hf():
    from qspec_tpu.models.bert import convert_bert, embed_bert_step

    hf_cfg = transformers.XLMRobertaConfig(
        vocab_size=120, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=40, pad_token_id=1, type_vocab_size=1)
    torch.manual_seed(2)
    hf = transformers.XLMRobertaModel(hf_cfg).eval()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["XLMRobertaModel"]})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_bert(sd, cfg)
    toks = [5, 9, 14, 3]
    t = jnp.asarray(np.asarray(toks)[None])
    got = np.asarray(embed_bert_step(params, t, jnp.ones_like(t, bool),
                                     cfg=cfg, pooling="cls"), np.float32)[0]
    with torch.no_grad():
        want = hf(torch.tensor([toks])).last_hidden_state[0, 0].numpy()
    np.testing.assert_allclose(got, want, atol=0.03, rtol=0.03)


def test_qwen2_reward_head():
    """Qwen2-RM Sequential(Linear, ReLU, Linear) head through the loader +
    cross_encoder_score (reference models/qwen2_rm.py)."""
    from qspec_tpu.entrypoints.llm import cross_encoder_score
    from qspec_tpu.model_loader.loader import _score_head

    rng = np.random.default_rng(0)
    H = 16
    sd = {"score.0.weight": rng.standard_normal((8, H)).astype(np.float32),
          "score.0.bias": rng.standard_normal(8).astype(np.float32),
          "score.2.weight": rng.standard_normal((1, 8)).astype(np.float32)}
    head = _score_head(sd, lambda w: w)
    assert head is not None and int(np.asarray(head["act"])) == 0
    pooled = rng.standard_normal(H).astype(np.float32)
    got = cross_encoder_score(head, pooled)
    h = np.maximum(pooled @ sd["score.0.weight"].T + sd["score.0.bias"], 0)
    logit = float(h @ sd["score.2.weight"].T)
    assert got == pytest.approx(1.0 / (1.0 + np.exp(-logit)), rel=1e-5)


def test_internlm2_reward_v_head():
    from qspec_tpu.model_loader.loader import _score_head
    sd = {"v_head.weight": np.ones((1, 8), np.float32)}
    head = _score_head(sd, lambda w: w)
    assert head is not None and np.asarray(head["w"]).shape == (8, 1)
    cfg = resolve({"architectures": ["InternLM2ForRewardModel"],
                   "vocab_size": 256, "hidden_size": 64,
                   "intermediate_size": 128, "num_hidden_layers": 2,
                   "num_attention_heads": 4, "num_key_value_heads": 4,
                   "max_position_embeddings": 64})
    assert cfg.arch == "internlm2" and cfg.num_labels == 1


def test_reward_classifier_archs_resolve():
    base = {"vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 4, "max_position_embeddings": 64}
    for arch in ("Qwen2ForRewardModel", "Qwen2ForProcessRewardModel",
                 "Qwen2ForSequenceClassification"):
        cfg = resolve({**base, "architectures": [arch]})
        assert cfg.arch == "qwen2" and cfg.num_labels >= 1, arch


def test_explicit_rejections_and_mantis():
    with pytest.raises(ValueError, match="blocksparse"):
        resolve({"architectures": ["Phi3SmallForCausalLM"]})
    with pytest.raises(ValueError, match="residual"):
        resolve({"architectures": ["ArcticForCausalLM"]})
    with pytest.raises(ValueError, match="proposer"):
        resolve({"architectures": ["MedusaModel"]})
    cfg = resolve({
        "architectures": ["MantisForConditionalGeneration"],
        "text_config": {"architectures": ["LlamaForCausalLM"],
                        "vocab_size": 256, "hidden_size": 64,
                        "intermediate_size": 128, "num_hidden_layers": 2,
                        "num_attention_heads": 4, "num_key_value_heads": 4,
                        "max_position_embeddings": 64},
        "vision_config": {"hidden_size": 32, "num_hidden_layers": 2}})
    assert cfg.arch == "llava" and cfg.vision is not None
