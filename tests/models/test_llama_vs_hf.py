"""Golden-model test: our bf16 Llama forward vs HuggingFace transformers.

Mirrors the reference's HfRunner/VllmRunner logprob comparison
(tests/conftest.py:250, tests/models/utils.py check_logprobs_close): same
random weights in both frameworks, compare next-token distributions.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402
from qspec_tpu.ops.rotary import make_rope_cache  # noqa: E402


def build_pair(seed=0):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(seed)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()

    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=128,
                      intermediate_size=224, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      max_position_embeddings=128, quant="none",
                      weightless_norm=False)

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    H = cfg.hidden_size

    def t(name):
        return jnp.asarray(sd[name].T, jnp.float32)  # torch [out,in] -> [in,out]

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        qkv = jnp.concatenate([t(p + "self_attn.q_proj.weight"),
                               t(p + "self_attn.k_proj.weight"),
                               t(p + "self_attn.v_proj.weight")], axis=1)
        gate_up = jnp.concatenate([t(p + "mlp.gate_proj.weight"),
                                   t(p + "mlp.up_proj.weight")], axis=1)
        layers.append({
            "qkv": {"w": qkv},
            "o": {"w": t(p + "self_attn.o_proj.weight")},
            "gate_up": {"w": gate_up},
            "down": {"w": t(p + "mlp.down_proj.weight")},
            "input_norm": jnp.asarray(sd[p + "input_layernorm.weight"], jnp.float32),
            "post_norm": jnp.asarray(sd[p + "post_attention_layernorm.weight"], jnp.float32),
        })
    import jax
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"], jnp.float32),
        "lm_head": jnp.asarray(sd["lm_head.weight"].T, jnp.float32),
        "final_norm": jnp.asarray(sd["model.norm.weight"], jnp.float32),
        "layers": stacked,
        "rope_cache": make_rope_cache(cfg.head_dim, cfg.max_position_embeddings,
                                      cfg.rope_theta),
    }
    return hf, cfg, params


def test_prefill_logits_match_hf(rng):
    hf, cfg, params = build_pair()
    T = 16
    tokens = rng.integers(1, 256, size=T).astype(np.int32)

    with torch.no_grad():
        hf_logits = hf(torch.tensor(tokens[None].astype(np.int64))).logits[0].numpy()

    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers, num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8, page_size=16)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],  # page 1
        block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    ours, _ = model_forward(params, cfg, jnp.asarray(tokens[None]), cache, batch,
                            scheme="bf16")
    ours = np.asarray(ours[0], np.float32)

    # bf16 path vs torch f32: compare distributions loosely + argmax tightly
    hf_lp = hf_logits - hf_logits.max(-1, keepdims=True)
    our_lp = ours - ours.max(-1, keepdims=True)
    agree = (hf_logits.argmax(-1) == ours.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"
    np.testing.assert_allclose(our_lp, hf_lp, atol=0.35)


def test_decode_matches_prefill(rng):
    """Incremental decode through the paged cache == full prefill logits."""
    hf, cfg, params = build_pair()
    T = 12
    tokens = rng.integers(1, 256, size=T).astype(np.int32)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers, num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8, page_size=4)
    # full prefill
    cache = kvc.allocate(kv_cfg)
    tables = jnp.asarray([[1, 2, 3]], jnp.int32)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) // 4 * 4 + 4 +
                      jnp.arange(T, dtype=jnp.int32) % 4)[None, :],
        block_tables=tables, ctx_lens=jnp.asarray([T], jnp.int32))
    full, _ = model_forward(params, cfg, jnp.asarray(tokens[None]), cache, batch,
                            scheme="bf16")

    # token-by-token
    cache2 = kvc.allocate(kv_cfg)
    outs = []
    for i in range(T):
        b = AttentionBatch(
            positions=jnp.asarray([[i]], jnp.int32),
            slot_mapping=jnp.asarray([[(i // 4) * 4 + 4 + i % 4]], jnp.int32),
            block_tables=tables, ctx_lens=jnp.asarray([i + 1], jnp.int32))
        lg, cache2 = model_forward(params, cfg, jnp.asarray([[tokens[i]]]), cache2,
                                   b, scheme="bf16")
        outs.append(np.asarray(lg[0, 0], np.float32))
    inc = np.stack(outs)
    np.testing.assert_allclose(inc, np.asarray(full[0], np.float32),
                               atol=0.05, rtol=0.05)
