"""Phi-3 family: fused-weight loading + longrope cache
(reference: vllm/model_executor/models/phi3.py + rotary_embedding.py
Phi3LongRoPEScaledRotaryEmbedding)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402
from qspec_tpu.ops.rotary import make_rope_cache  # noqa: E402


def build_hf(seed=0):
    hf_cfg = transformers.Phi3Config(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, original_max_position_embeddings=128,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        sliding_window=None, resid_pdrop=0.0, embd_pdrop=0.0,
        attention_dropout=0.0, pad_token_id=0, bos_token_id=1,
        eos_token_id=2)
    torch.manual_seed(seed)
    hf = transformers.Phi3ForCausalLM(hf_cfg).eval()
    sd = {kk: v.detach().numpy() for kk, v in hf.state_dict().items()}
    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict())
    return hf, cfg, sd


def test_registry_resolves():
    from qspec_tpu.models.registry import resolve
    cfg = resolve({"architectures": ["Phi3ForCausalLM"], "vocab_size": 256,
                   "hidden_size": 128, "intermediate_size": 224,
                   "num_hidden_layers": 2, "num_attention_heads": 4})
    assert not cfg.qkv_bias


def test_phi3_fused_weights_logits_match_hf(rng):
    hf, cfg, sd = build_hf()
    assert "model.layers.0.self_attn.qkv_proj.weight" in sd  # fused layout
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
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    ours, _ = model_forward(params, cfg_f, jnp.asarray(tokens[None]),
                            kvc.allocate(kv_cfg), batch, scheme="bf16")
    ours = np.asarray(ours[0], np.float32)
    agree = (hf_logits.argmax(-1) == ours.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"
    hf_lp = hf_logits - hf_logits.max(-1, keepdims=True)
    our_lp = ours - ours.max(-1, keepdims=True)
    np.testing.assert_allclose(our_lp, hf_lp, atol=0.35)


def test_phi3_quantize_float_ingests_fused(rng):
    """The QuaRot pipeline handles the fused qkv_proj/gate_up_proj layout."""
    _, cfg, sd = build_hf(seed=3)
    from qspec_tpu.model_loader.loader import quantize_float
    params, cfg_q = quantize_float(sd, cfg)
    assert cfg_q.quant == "w4"
    T = 8
    tokens = rng.integers(1, 256, size=T).astype(np.int32)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8,
                               page_size=16)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    lg, _ = model_forward(params, cfg_q, jnp.asarray(tokens[None]),
                          kvc.allocate(kv_cfg), batch, scheme="w4a16")
    assert np.isfinite(np.asarray(lg, np.float32)).all()


def test_longrope_cache():
    """Longrope: short factors inside the original window, long factors (and
    the sqrt-log attention scale) beyond it — vllm's per-position selection."""
    D, orig, ext = 8, 32, 128
    short = [1.0] * (D // 2)
    long = [4.0] * (D // 2)
    scaling = {"rope_type": "longrope", "short_factor": short,
               "long_factor": long,
               "original_max_position_embeddings": orig}
    cache = np.asarray(make_rope_cache(D, ext, 10000.0,
                                       rope_scaling=scaling))
    mscale = np.sqrt(1.0 + np.log(ext / orig) / np.log(orig))
    inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    # inside the window: short factors (1.0) -> plain rope * mscale
    t = 7
    np.testing.assert_allclose(cache[0, t], np.cos(t * inv) * mscale,
                               rtol=1e-5)
    # beyond: long factors (4.0)
    t = 64
    np.testing.assert_allclose(cache[1, t], np.sin(t * inv / 4.0) * mscale,
                               rtol=1e-5)
    # no scaling config -> no mscale
    plain = np.asarray(make_rope_cache(D, ext, 10000.0))
    np.testing.assert_allclose(plain[0, 7], np.cos(7 * inv), rtol=1e-5)
