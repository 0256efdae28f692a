"""HF-golden tests for the pre-RMSNorm GPT-family archs (reference test
pattern: tests/models/ HfRunner vs VllmRunner logprob comparison).

OPT / GPT-2 / Starcoder2 / Falcon instantiate the real transformers
modules at tiny dims as ground truth; Baichuan / InternLM2 ship custom
remote code the image cannot run, so their tests verify the CHECKPOINT
LAYOUT translation (W_pack split, wqkv de-interleave) against an
identically-weighted llama-keyed load — the graphs are identical by
construction, so layout equality is the whole correctness question.
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
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params, cfg = load_family_float(sd, cfg)
    got = run_ours(params, cfg, tokens)
    with torch.no_grad():
        want = hf_model(torch.tensor([tokens])).logits[0].numpy()
    # bf16 trunk vs f32 HF: compare top-1 everywhere + logit closeness.
    # Random tiny weights put genuine near-ties at some positions (top-2
    # margins under the bf16 noise floor) — those count as agreement.
    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.95, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=atol, rtol=0.05)
    return cfg


TOKENS = list(range(2, 14))


def test_opt_vs_hf():
    hf_cfg = transformers.OPTConfig(
        vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, activation_function="relu",
        word_embed_proj_dim=64)
    torch.manual_seed(0)
    hf = transformers.OPTForCausalLM(hf_cfg).eval()
    cfg = check_against_hf(hf, {**hf_cfg.to_dict(),
                                "architectures": ["OPTForCausalLM"]}, TOKENS)
    assert cfg.position_embedding == "learned_opt"
    assert not cfg.mlp_gated and cfg.norm_type == "layernorm"


def test_gpt2_vs_hf():
    hf_cfg = transformers.GPT2Config(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=64,
        n_inner=None, activation_function="gelu_new")
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    check_against_hf(hf, {**hf_cfg.to_dict(),
                          "architectures": ["GPT2LMHeadModel"]}, TOKENS)


def test_starcoder2_vs_hf():
    hf_cfg = transformers.Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, use_bias=True,
        sliding_window=None, tie_word_embeddings=True)
    torch.manual_seed(0)
    hf = transformers.Starcoder2ForCausalLM(hf_cfg).eval()
    check_against_hf(hf, {**hf_cfg.to_dict(),
                          "architectures": ["Starcoder2ForCausalLM"]}, TOKENS)


@pytest.mark.parametrize("new_arch,nkv", [(False, 1), (True, 2)])
def test_falcon_vs_hf(new_arch, nkv):
    """7B layout (multi_query, kv=1) and 40B layout (new_decoder_architecture
    GQA interleave)."""
    hf_cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=nkv, multi_query=not new_arch,
        new_decoder_architecture=new_arch, parallel_attn=True, bias=False,
        alibi=False, rope_theta=10000.0, max_position_embeddings=64)
    torch.manual_seed(0)
    hf = transformers.FalconForCausalLM(hf_cfg).eval()
    cfg = check_against_hf(hf, {**hf_cfg.to_dict(),
                                "architectures": ["FalconForCausalLM"]},
                           TOKENS)
    assert cfg.parallel_block
    assert cfg.num_kv_heads == nkv


# -- layout-translation families (custom remote code upstream) --------------


def _llama_sd(seed=0):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(seed)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    return {k: v.detach().numpy() for k, v in hf.state_dict().items()}


def test_baichuan_wpack_matches_llama():
    """A baichuan-keyed checkpoint (fused W_pack) must load to the same
    params as the identical weights in llama keys — 7B baichuan IS the
    llama graph (reference models/baichuan.py)."""
    sd = _llama_sd()
    # baichuan-7B is MHA: rebuild a 4-head/4-kv state dict
    cfg_dict = {"architectures": ["BaiChuanForCausalLM"],
                "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 128, "num_hidden_layers": 2,
                "num_attention_heads": 4, "rope_theta": 10000.0,
                "max_position_embeddings": 64, "rms_norm_eps": 1e-5}
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rope_theta=10000.0)
    torch.manual_seed(1)
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
                  "mlp.down_proj"):
            bsd[p + k + ".weight"] = sd[p + k + ".weight"]
        for k in ("input_layernorm", "post_attention_layernorm"):
            bsd[p + k + ".weight"] = sd[p + k + ".weight"]
    bsd["model.embed_tokens.weight"] = sd["model.embed_tokens.weight"]
    bsd["model.norm.weight"] = sd["model.norm.weight"]
    bsd["lm_head.weight"] = sd["lm_head.weight"]

    cfg = resolve(cfg_dict)
    assert cfg.arch == "baichuan"
    params, cfg = load_family_float(bsd, cfg)
    got = run_ours(params, cfg, TOKENS)
    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    np.testing.assert_allclose(got, want, atol=0.25, rtol=0.05)


def test_baichuan_13b_resolves_alibi():
    # capital-C 13B arch -> the W_pack llama graph with ALiBi
    # (tests/models/test_alibi_family.py has the layout + graph tests)
    cfg = resolve({"architectures": ["BaichuanForCausalLM"],
                   "vocab_size": 256, "hidden_size": 64,
                   "intermediate_size": 128, "num_hidden_layers": 2,
                   "num_attention_heads": 4, "max_position_embeddings": 64})
    assert cfg.arch == "baichuan" and cfg.position_embedding == "alibi"


def test_internlm2_wqkv_deinterleave_matches_llama():
    """InternLM2's wqkv packs [kv_groups, q_per_group + 2, dh]; the
    converter must de-interleave to q|k|v exactly (reference
    models/internlm2.py InternLM2Attention.split_qkv)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0)
    torch.manual_seed(2)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    nh, nkv, dh = 4, 2, 16
    isd = {"model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
           "model.norm.weight": sd["model.norm.weight"],
           "output.weight": sd["lm_head.weight"]}
    for i in range(2):
        p = f"model.layers.{i}."
        q = sd[p + "self_attn.q_proj.weight"].reshape(nkv, nh // nkv, dh, -1)
        k = sd[p + "self_attn.k_proj.weight"].reshape(nkv, 1, dh, -1)
        v = sd[p + "self_attn.v_proj.weight"].reshape(nkv, 1, dh, -1)
        isd[p + "attention.wqkv.weight"] = np.concatenate(
            [q, k, v], axis=1).reshape(-1, 64)
        isd[p + "attention.wo.weight"] = sd[p + "self_attn.o_proj.weight"]
        isd[p + "feed_forward.w1.weight"] = sd[p + "mlp.gate_proj.weight"]
        isd[p + "feed_forward.w3.weight"] = sd[p + "mlp.up_proj.weight"]
        isd[p + "feed_forward.w2.weight"] = sd[p + "mlp.down_proj.weight"]
        isd[p + "attention_norm.weight"] = sd[p + "input_layernorm.weight"]
        isd[p + "ffn_norm.weight"] = \
            sd[p + "post_attention_layernorm.weight"]

    cfg = resolve({"architectures": ["InternLM2ForCausalLM"],
                   "vocab_size": 256, "hidden_size": 64,
                   "intermediate_size": 128, "num_hidden_layers": 2,
                   "num_attention_heads": 4, "num_key_value_heads": 2,
                   "rope_theta": 10000.0, "max_position_embeddings": 64,
                   "rms_norm_eps": 1e-5})
    assert cfg.arch == "internlm2"
    params, cfg = load_family_float(isd, cfg)
    got = run_ours(params, cfg, TOKENS)
    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    np.testing.assert_allclose(got, want, atol=0.25, rtol=0.05)
