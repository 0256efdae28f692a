"""Offline QuaRot rotation + quantization consistency.

The rotated/quantized model evaluated with online Hadamards (w4a16 scheme)
must reproduce the float model up to int4 quantization noise. Intermediate
size 448 = 28 * 16 exercises the non-symmetric Paley H_28 factor (the
llama-3 14336 case).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.model_loader.loader import quantize_float  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402


def build(seed=0):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=448,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(seed)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig(vocab_size=256, hidden_size=128, intermediate_size=448,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                      rope_theta=10000.0, max_position_embeddings=128)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, qcfg = quantize_float(sd, cfg)
    return hf, params, qcfg


def run_ours(params, cfg, tokens, scheme):
    T = len(tokens)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8, page_size=16)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1, 2]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    logits, _ = model_forward(params, cfg, jnp.asarray(np.asarray(tokens)[None]),
                              cache, batch, scheme=scheme)
    return np.asarray(logits[0], np.float32)


def test_rotation_algebra_exact(rng):
    """bits=None: rotated but unquantized — online Hadamards must exactly
    invert the offline rotations (up to bf16 noise). Catches any basis-
    algebra error independent of quantization."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=448,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig(vocab_size=256, hidden_size=128, intermediate_size=448,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                      rope_theta=10000.0, max_position_embeddings=128)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, qcfg = quantize_float(sd, cfg, bits=None)

    tokens = rng.integers(1, 256, size=12).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(tokens[None].astype(np.int64))).logits[0].numpy()
    ours = run_ours(params, qcfg, tokens, "w4a16")
    agree = (ref.argmax(-1) == ours.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"
    np.testing.assert_allclose(ours, ref, atol=0.35)


def test_w4a16_close_to_float(rng):
    hf, params, cfg = build()
    tokens = rng.integers(1, 256, size=12).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(tokens[None].astype(np.int64))).logits[0].numpy()
    ours = run_ours(params, cfg, tokens, "w4a16")

    corr = np.corrcoef(ref.ravel(), ours.ravel())[0, 1]
    assert corr > 0.98, f"logit correlation {corr}"


def test_w4a4_correlated(rng):
    """Draft path: noisier (activations int4) but must track the model."""
    hf, params, cfg = build()
    tokens = rng.integers(1, 256, size=12).astype(np.int32)
    ref = run_ours(params, cfg, tokens, "w4a16")
    ours = run_ours(params, cfg, tokens, "w4a4")
    corr = np.corrcoef(ref.ravel(), ours.ravel())[0, 1]
    assert corr > 0.9, f"w4a4-vs-w4a16 correlation {corr}"


def test_w4a8_correlated(rng):
    """w4a8 draft scheme (qserve path): int8 activations, same int4 weights."""
    hf, params, cfg = build()
    tokens = rng.integers(1, 256, size=12).astype(np.int32)
    ref = run_ours(params, cfg, tokens, "w4a16")
    ours = run_ours(params, cfg, tokens, "w4a8")
    corr = np.corrcoef(ref.ravel(), ours.ravel())[0, 1]
    assert corr > 0.97, f"w4a8-vs-w4a16 correlation {corr}"
    # int8 activations should track the fp path tighter than int4 does
    w4a4 = run_ours(params, cfg, tokens, "w4a4")
    corr44 = np.corrcoef(ref.ravel(), w4a4.ravel())[0, 1]
    assert corr >= corr44 - 0.02


def test_score_head_rotated_matches_float(rng):
    """A sequence-classification head in the checkpoint ("score.weight",
    cross-encoder ingestion) gets the lm_head treatment — folded final-norm
    gamma + residual rotation — so head(pooled) from the quantized model
    must track hf_final_hidden @ W_score^T from the float one."""
    hf, _, _ = build()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    torch.manual_seed(1)
    w = torch.randn(3, 128) * 0.05          # [num_labels, H]
    sd["score.weight"] = w.numpy()
    sd["score.bias"] = (torch.randn(3) * 0.01).numpy()
    cfg = ModelConfig(vocab_size=256, hidden_size=128, intermediate_size=448,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                      rope_theta=10000.0, max_position_embeddings=128)
    params, qcfg = quantize_float(sd, cfg)
    assert qcfg.num_labels == 3
    assert params["score_head"]["w"].shape == (128, 3)

    tokens = rng.integers(1, 256, size=12).tolist()
    T = len(tokens)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8,
                               page_size=16)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1, 2]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    _, hidden, _ = model_forward(params, qcfg,
                                 jnp.asarray(np.asarray(tokens)[None]),
                                 cache, batch, scheme="w4a16",
                                 return_hidden=True)
    got = (np.asarray(hidden[0, -1], np.float32)
           @ np.asarray(params["score_head"]["w"], np.float32)
           + np.asarray(params["score_head"]["b"], np.float32))

    with torch.no_grad():
        hf_h = hf.model(torch.tensor([tokens])).last_hidden_state[0, -1]
        want = (hf_h @ w.T + torch.tensor(sd["score.bias"])).numpy()
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)
