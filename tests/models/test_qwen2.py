"""Qwen2 family: attention bias + its dims through the shared graph, vs HF."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.models.registry import resolve, supported_architectures  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402
from qspec_tpu.ops.rotary import make_rope_cache  # noqa: E402


def test_registry_resolution():
    cfg = resolve({"architectures": ["Qwen2ForCausalLM"], "vocab_size": 1000,
                   "hidden_size": 64, "intermediate_size": 128,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "num_key_value_heads": 2, "model_type": "qwen2"})
    assert cfg.qkv_bias and cfg.arch == "qwen2"
    assert "LlamaForCausalLM" in supported_architectures()


def test_qwen2_matches_hf(rng):
    hf_cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, use_sliding_window=False)
    torch.manual_seed(0)
    hf = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig(arch="qwen2", vocab_size=256, hidden_size=128,
                      intermediate_size=224, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      max_position_embeddings=128, qkv_bias=True,
                      quant="none", weightless_norm=False)

    def t(name):
        return jnp.asarray(sd[name].T, jnp.float32)

    import jax
    layers = []
    for i in range(2):
        p = f"model.layers.{i}."
        layers.append({
            "qkv": {"w": jnp.concatenate([t(p + "self_attn.q_proj.weight"),
                                          t(p + "self_attn.k_proj.weight"),
                                          t(p + "self_attn.v_proj.weight")], axis=1),
                    "b": jnp.concatenate([jnp.asarray(sd[p + "self_attn.q_proj.bias"]),
                                          jnp.asarray(sd[p + "self_attn.k_proj.bias"]),
                                          jnp.asarray(sd[p + "self_attn.v_proj.bias"])])},
            "o": {"w": t(p + "self_attn.o_proj.weight")},
            "gate_up": {"w": jnp.concatenate([t(p + "mlp.gate_proj.weight"),
                                              t(p + "mlp.up_proj.weight")], axis=1)},
            "down": {"w": t(p + "mlp.down_proj.weight")},
            "input_norm": jnp.asarray(sd[p + "input_layernorm.weight"]),
            "post_norm": jnp.asarray(sd[p + "post_attention_layernorm.weight"]),
        })
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"]),
        "lm_head": jnp.asarray(sd["lm_head.weight"].T),
        "final_norm": jnp.asarray(sd["model.norm.weight"]),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "rope_cache": make_rope_cache(32, 128, 10000.0),
    }

    T = 12
    tokens = rng.integers(1, 256, size=T).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(tokens[None].astype(np.int64))).logits[0].numpy()

    kv_cfg = kvc.KVCacheConfig(num_layers=2, num_kv_heads=2, head_dim=32,
                               num_pages=8, page_size=16)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    ours, _ = model_forward(params, cfg, jnp.asarray(tokens[None]), cache, batch,
                            scheme="bf16")
    ours = np.asarray(ours[0], np.float32)
    agree = (ref.argmax(-1) == ours.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"
