"""Granite family: llama graph + four scalar multipliers — embedding,
attention, residual, logits scaling (reference:
vllm/model_executor/models/granite.py GraniteForCausalLM). HF golden +
registry resolution + tied-head handling."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402


def build_hf(seed=0, tie=True):
    hf_cfg = transformers.GraniteConfig(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=tie, attention_bias=False,
        embedding_multiplier=6.0, attention_multiplier=0.3,
        residual_multiplier=0.22, logits_scaling=4.0)
    torch.manual_seed(seed)
    hf = transformers.GraniteForCausalLM(hf_cfg).eval()
    sd = {kk: v.detach().numpy() for kk, v in hf.state_dict().items()}
    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict())
    return hf, cfg, sd


def test_registry_resolves():
    from qspec_tpu.models.registry import resolve
    cfg = resolve({"architectures": ["GraniteForCausalLM"],
                   "vocab_size": 256, "hidden_size": 128,
                   "intermediate_size": 224, "num_hidden_layers": 2,
                   "num_attention_heads": 4,
                   "embedding_multiplier": 6.0,
                   "attention_multiplier": 0.3,
                   "residual_multiplier": 0.22, "logits_scaling": 4.0})
    assert cfg.arch == "granite"
    assert cfg.embed_scale == 6.0
    assert cfg.residual_multiplier == 0.22
    assert cfg.logits_scaling == 4.0
    # attention_multiplier rides query_pre_attn_scalar: qpas**-0.5 == am
    assert abs(cfg.query_pre_attn_scalar ** -0.5 - 0.3) < 1e-9


def _prefill_batch(T):
    return AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))


@pytest.mark.parametrize("tie", [True, False])
def test_granite_prefill_logits_match_hf(rng, tie):
    hf, cfg, sd = build_hf(tie=tie)
    from qspec_tpu.model_loader.loader import load_hf_float
    params, cfg_f = load_hf_float(sd, cfg)

    T = 16
    tokens = rng.integers(1, 256, size=T).astype(np.int32)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(tokens[None].astype(np.int64))
                       ).logits[0].numpy()

    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8,
                               page_size=16)
    ours, _ = model_forward(params, cfg_f, jnp.asarray(tokens[None]),
                            kvc.allocate(kv_cfg), _prefill_batch(T),
                            scheme="bf16")
    ours = np.asarray(ours[0], np.float32)

    agree = (hf_logits.argmax(-1) == ours.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"
    hf_lp = hf_logits - hf_logits.max(-1, keepdims=True)
    our_lp = ours - ours.max(-1, keepdims=True)
    np.testing.assert_allclose(our_lp, hf_lp, atol=0.35)


def test_multipliers_change_output(rng):
    """A granite model with neutral multipliers must differ from the same
    weights with the real multipliers — guards against the knobs being
    silently dropped."""
    _, cfg, sd = build_hf()
    from qspec_tpu.model_loader.loader import load_hf_float
    import dataclasses
    params, cfg_f = load_hf_float(sd, cfg)
    neutral = dataclasses.replace(cfg_f, residual_multiplier=1.0,
                                  logits_scaling=None, embed_scale=None,
                                  query_pre_attn_scalar=None)
    T = 8
    tokens = rng.integers(1, 256, size=T).astype(np.int32)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8,
                               page_size=16)
    a, _ = model_forward(params, cfg_f, jnp.asarray(tokens[None]),
                         kvc.allocate(kv_cfg), _prefill_batch(T),
                         scheme="bf16")
    b, _ = model_forward(params, neutral, jnp.asarray(tokens[None]),
                         kvc.allocate(kv_cfg), _prefill_batch(T),
                         scheme="bf16")
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-2)
