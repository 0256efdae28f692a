"""DeepSeek-MoE V1 family (reference vllm/model_executor/models/deepseek.py).

DeepSeek ships custom remote code upstream, so HF modules can't be the
oracle. Instead the deepseek-specific graph properties are pinned against a
transformers Llama with algebraically-equivalent weights:

- identical routed experts + norm_topk_prob + ZEROED shared experts
  ==> the MoE mixture collapses to one dense MLP ==> must equal llama
  (validates the router softmax-topk-renorm, expert stacking, the dense
  first_k_dense prefix scan, and the key mapping);
- ZEROED routed experts + real shared experts ==> output is the UNGATED
  shared MLP alone ==> must equal llama again (validates that deepseek's
  shared expert adds directly, with no qwen2-moe sigmoid gate).

Distinct-expert routing math is covered by the mixtral/qwen2-moe suites —
the MoE scan is the same code path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.model_loader.families import load_family_float  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402

E, K, H, I = 4, 2, 64, 128
TOKENS = list(range(2, 14))

HF_CFG = dict(vocab_size=256, hidden_size=H, intermediate_size=I,
              num_hidden_layers=3, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=64,
              rope_theta=10000.0, rms_norm_eps=1e-6)

DS_CFG = {"architectures": ["DeepseekForCausalLM"], **HF_CFG,
          "moe_intermediate_size": I, "n_routed_experts": E,
          "n_shared_experts": 1, "num_experts_per_tok": K,
          "first_k_dense_replace": 1, "norm_topk_prob": True}


def llama_golden(seed):
    hf_cfg = transformers.LlamaConfig(**HF_CFG, attention_bias=False,
                                      tie_word_embeddings=False)
    torch.manual_seed(seed)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    return sd, want


def to_deepseek_sd(sd, routed_from_llama: bool):
    """Translate llama keys to deepseek layout. Layer 0 stays dense; layers
    1..n become MoE where either every routed expert is the llama MLP and
    shared is zero (routed_from_llama), or routed experts are zero and the
    shared expert is the llama MLP."""
    rng = np.random.default_rng(0)
    out = {"model.embed_tokens.weight": sd["model.embed_tokens.weight"],
           "model.norm.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    n_layers = HF_CFG["num_hidden_layers"]
    for i in range(n_layers):
        p = f"model.layers.{i}."
        for k in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                  "self_attn.o_proj", "input_layernorm",
                  "post_attention_layernorm"):
            out[p + k + ".weight"] = sd[p + k + ".weight"]
        mlps = {n: sd[p + f"mlp.{n}_proj.weight"]
                for n in ("gate", "up", "down")}
        if i == 0:   # dense prefix
            for n, w in mlps.items():
                out[p + f"mlp.{n}_proj.weight"] = w
            continue
        out[p + "mlp.gate.weight"] = \
            rng.standard_normal((E, H)).astype(np.float32) * 0.1
        for e in range(E):
            for n, w in mlps.items():
                out[f"{p}mlp.experts.{e}.{n}_proj.weight"] = \
                    w if routed_from_llama else np.zeros_like(w)
        for n, w in mlps.items():
            out[p + f"mlp.shared_experts.{n}_proj.weight"] = \
                np.zeros_like(w) if routed_from_llama else w
    return out


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


def test_config_translation():
    cfg = resolve(DS_CFG)
    assert cfg.arch == "deepseek"
    assert cfg.first_k_dense == 1 and cfg.num_experts == E
    assert cfg.shared_expert_intermediate_size == I
    assert not cfg.shared_expert_gated
    assert cfg.moe_softmax_before_topk and cfg.moe_norm_topk_prob


@pytest.mark.parametrize("routed", [True, False])
def test_deepseek_collapses_to_llama(routed):
    sd, want = llama_golden(seed=3)
    cfg = resolve(DS_CFG)
    params, cfg = load_family_float(to_deepseek_sd(sd, routed), cfg)
    assert ("layers_dense" in params
            and params["layers_dense"]["qkv"]["w"].shape[0] == 1)
    assert params["layers"]["experts_gate_up"]["w"].shape[:2] == (2, E)
    got = run_ours(params, cfg, TOKENS)
    np.testing.assert_allclose(got, want, atol=0.25, rtol=0.05)
