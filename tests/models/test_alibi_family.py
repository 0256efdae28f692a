"""HF-golden tests for the ALiBi position-encoding class (reference
models/{bloom,mpt,falcon,jais,baichuan}.py; slopes bloom.py:49, backend bias
build flash_attn.py:603-619).

BLOOM / MPT / Falcon-rw instantiate the real transformers modules at tiny
dims as ground truth; JAIS and Baichuan-13B ship custom remote code the
image cannot run, so their tests verify the CHECKPOINT LAYOUT translation
(the shared alibi attention graph itself is golden-covered by the first
three).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.model_loader.families import load_family_float  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402


def run_ours(params, cfg, tokens):
    T = len(tokens)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8,
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


def check_against_hf(hf_model, hf_cfg_dict, tokens, atol=0.25):
    cfg = resolve(hf_cfg_dict)
    assert cfg.position_embedding == "alibi"
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params, cfg = load_family_float(sd, cfg)
    got = run_ours(params, cfg, tokens)
    with torch.no_grad():
        want = hf_model(torch.tensor([tokens])).logits[0].numpy()
    # random tiny weights put genuine near-ties at some positions (top-2
    # margins under the bf16 noise floor, ~0.08 here) — those count as
    # agreement; the allclose below still bounds every logit
    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.08
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.95, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=atol, rtol=0.05)
    return cfg


TOKENS = list(range(2, 14))


def test_bloom_vs_hf():
    hf_cfg = transformers.BloomConfig(
        vocab_size=256, hidden_size=64, n_layer=2, n_head=4,
        layer_norm_epsilon=1e-5)
    torch.manual_seed(0)
    hf = transformers.BloomForCausalLM(hf_cfg).eval()
    cfg = check_against_hf(hf, {**hf_cfg.to_dict(),
                                "architectures": ["BloomForCausalLM"]},
                           TOKENS)
    assert cfg.arch == "bloom" and cfg.norm_type == "layernorm"
    assert not cfg.mlp_gated


def test_mpt_vs_hf():
    hf_cfg = transformers.MptConfig(
        d_model=64, n_heads=4, n_layers=2, expansion_ratio=4,
        max_seq_len=64, vocab_size=256,
        attn_config=transformers.models.mpt.configuration_mpt
        .MptAttentionConfig(alibi=True))
    torch.manual_seed(0)
    hf = transformers.MptForCausalLM(hf_cfg).eval()
    cfg = check_against_hf(hf, {**hf_cfg.to_dict(),
                                "architectures": ["MPTForCausalLM"]}, TOKENS)
    assert cfg.arch == "mpt"
    assert not cfg.linear_bias  # mpt no_bias default


def test_falcon_rw_alibi_vs_hf():
    """falcon-rw lineage: sequential pre-LN blocks + ALiBi + biases
    (alibi=True, parallel_attn=False, bias=True)."""
    hf_cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=False,
        new_decoder_architecture=False, parallel_attn=False, bias=True,
        alibi=True, max_position_embeddings=64)
    torch.manual_seed(0)
    hf = transformers.FalconForCausalLM(hf_cfg).eval()
    cfg = check_against_hf(hf, {**hf_cfg.to_dict(),
                                "architectures": ["FalconForCausalLM"]},
                           TOKENS)
    assert not cfg.parallel_block and cfg.linear_bias


def test_baichuan_13b_alibi_layout():
    """Baichuan-13B: same W_pack llama layout as 7B, ALiBi instead of rope
    (reference models/baichuan.py keys off the capital-C arch string).
    Custom remote code upstream -> layout-translation test: the W_pack
    checkpoint must load to the identical params as llama keys, and the
    graph must actually apply alibi."""
    from qspec_tpu.model_loader.loader import load_hf_float

    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64)
    torch.manual_seed(3)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    bsd = {}
    for i in range(2):
        p = f"model.layers.{i}."
        bsd[p + "self_attn.W_pack.weight"] = np.concatenate(
            [sd[p + "self_attn.q_proj.weight"],
             sd[p + "self_attn.k_proj.weight"],
             sd[p + "self_attn.v_proj.weight"]], axis=0)
        for k in ("self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj",
                  "mlp.down_proj", "input_layernorm",
                  "post_attention_layernorm"):
            bsd[p + k + ".weight"] = sd[p + k + ".weight"]
    bsd["model.embed_tokens.weight"] = sd["model.embed_tokens.weight"]
    bsd["model.norm.weight"] = sd["model.norm.weight"]
    bsd["lm_head.weight"] = sd["lm_head.weight"]

    cfg = resolve({"architectures": ["BaichuanForCausalLM"],
                   "vocab_size": 256, "hidden_size": 64,
                   "intermediate_size": 128, "num_hidden_layers": 2,
                   "num_attention_heads": 4,
                   "max_position_embeddings": 64, "rms_norm_eps": 1e-5})
    assert cfg.arch == "baichuan" and cfg.position_embedding == "alibi"
    params, cfg = load_family_float(bsd, cfg)
    want, _ = load_hf_float(sd, cfg)
    import jax
    got_leaves = jax.tree.leaves(params["layers"])
    want_leaves = jax.tree.leaves(want["layers"])
    assert len(got_leaves) == len(want_leaves)
    for a, b in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # alibi must be live: logits differ from the rope run of the same weights
    got = run_ours(params, cfg, TOKENS)
    assert np.isfinite(got).all()
    import dataclasses
    rope_cfg = dataclasses.replace(cfg, position_embedding="rope")
    rope = run_ours(params, rope_cfg, TOKENS)
    assert not np.allclose(got[4:], rope[4:], atol=1e-3)


def test_jais_layout():
    """JAIS (custom remote code): GPT-2 Conv1D layout + swiglu c_fc/c_fc2 +
    muP scales. Verify the converter's layout transforms and the cfg's muP
    knob mapping; the alibi graph itself is golden-covered above."""
    rng = np.random.default_rng(0)
    H, I, V, L, NH = 64, 96, 256, 2, 4
    sd = {"transformer.wte.weight": rng.standard_normal((V, H)).astype(np.float32),
          "transformer.ln_f.weight": np.ones(H, np.float32),
          "transformer.ln_f.bias": np.zeros(H, np.float32)}
    for i in range(L):
        p = f"transformer.h.{i}."
        sd[p + "attn.c_attn.weight"] = rng.standard_normal((H, 3 * H)).astype(np.float32)
        sd[p + "attn.c_attn.bias"] = rng.standard_normal(3 * H).astype(np.float32)
        sd[p + "attn.c_proj.weight"] = rng.standard_normal((H, H)).astype(np.float32)
        sd[p + "attn.c_proj.bias"] = np.zeros(H, np.float32)
        sd[p + "mlp.c_fc.weight"] = rng.standard_normal((H, I)).astype(np.float32)
        sd[p + "mlp.c_fc.bias"] = np.zeros(I, np.float32)
        sd[p + "mlp.c_fc2.weight"] = rng.standard_normal((H, I)).astype(np.float32)
        sd[p + "mlp.c_fc2.bias"] = np.zeros(I, np.float32)
        sd[p + "mlp.c_proj.weight"] = rng.standard_normal((I, H)).astype(np.float32)
        sd[p + "mlp.c_proj.bias"] = np.zeros(H, np.float32)
        for n in ("ln_1", "ln_2"):
            sd[p + n + ".weight"] = np.ones(H, np.float32)
            sd[p + n + ".bias"] = np.zeros(H, np.float32)

    cfg = resolve({"architectures": ["JAISLMHeadModel"], "model_type": "jais",
                   "vocab_size": V, "n_embd": H, "n_head": NH, "n_layer": L,
                   "n_inner": I, "n_positions": 64,
                   "position_embedding_type": "alibi",
                   "mup_embeddings_scale": 9.17,
                   "mup_output_alpha": 2.22, "mup_width_scale": 0.5,
                   "scale_qk_dot_by_d": True,
                   "activation_function": "swiglu"})
    assert cfg.arch == "jais" and cfg.position_embedding == "alibi"
    assert cfg.mlp_gated and cfg.embed_scale == pytest.approx(9.17)
    assert cfg.logits_scaling == pytest.approx(1.0 / (2.22 * 0.5))
    # 1/d attention scale via query_pre_attn_scalar = d^2
    assert (cfg.query_pre_attn_scalar or 0) == cfg.head_dim ** 2

    params, cfg = load_family_float(sd, cfg)
    # layout: Conv1D kept [in, out], gate|up concat order c_fc|c_fc2
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["qkv"]["w"][0], np.float32),
        sd["transformer.h.0.attn.c_attn.weight"].astype(jnp.bfloat16).astype(np.float32))
    gu = np.asarray(params["layers"]["gate_up"]["w"][0], np.float32)
    np.testing.assert_array_equal(
        gu, np.concatenate([sd["transformer.h.0.mlp.c_fc.weight"],
                            sd["transformer.h.0.mlp.c_fc2.weight"]],
                           axis=1).astype(jnp.bfloat16).astype(np.float32))
    got = run_ours(params, cfg, TOKENS)
    assert np.isfinite(got).all()
