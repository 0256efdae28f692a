"""Gemma family vs HF: GeGLU (gelu_tanh), sqrt(hidden) embedding scale,
(1+w) RMSNorms folded at load, tied lm_head, decoupled head_dim
(reference vllm/model_executor/models/gemma.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402


def _tiny_hf(seed=0):
    hf_cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=64, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, hidden_act="gelu_pytorch_tanh",
        hidden_activation="gelu_pytorch_tanh", tie_word_embeddings=True,
        attention_bias=False)
    torch.manual_seed(seed)
    hf = transformers.GemmaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return hf, hf_cfg, sd


def test_registry_resolution():
    cfg = resolve({"architectures": ["GemmaForCausalLM"], "vocab_size": 1000,
                   "hidden_size": 64, "intermediate_size": 128,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "num_key_value_heads": 2, "head_dim": 32,
                   "model_type": "gemma", "tie_word_embeddings": True})
    assert cfg.arch == "gemma"
    assert cfg.hidden_act == "gelu_tanh"
    assert cfg.norm_weight_offset == 1.0
    assert cfg.embed_scale == pytest.approx(8.0)
    assert cfg.head_dim == 32 and cfg.q_size == 128 != cfg.hidden_size


def _run_ours(params, cfg, tokens, scheme):
    T = len(tokens)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8,
                               page_size=16)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    ours, _ = model_forward(params, cfg, jnp.asarray(tokens[None]), cache,
                            batch, scheme=scheme)
    return np.asarray(ours[0], np.float32)


def test_gemma_matches_hf(rng):
    from qspec_tpu.model_loader.loader import load_hf_float

    hf, hf_cfg, sd = _tiny_hf()
    cfg = resolve(hf_cfg.to_dict())
    params, cfg = load_hf_float(sd, cfg=cfg)
    assert cfg.embed_scale == pytest.approx(128 ** 0.5)

    T = 12
    tokens = rng.integers(1, 256, size=T).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(tokens[None].astype(np.int64))).logits[0].numpy()
    ours = _run_ours(params, cfg, tokens, "bf16")
    agree = (ref.argmax(-1) == ours.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"


def test_gemma_quarot_rotation_algebra(rng):
    """QuaRot rotate (unquantized, bits=None) must preserve the logits —
    the (1+w) fold and embedding scale commute with the Hadamard basis."""
    from qspec_tpu.model_loader.loader import load_hf_float, quantize_float

    _, hf_cfg, sd = _tiny_hf(seed=1)
    cfg = resolve(hf_cfg.to_dict())
    pf, cf = load_hf_float(sd, cfg=cfg)
    pr, cr = quantize_float(dict(sd), cfg=cfg, bits=None)

    T = 10
    tokens = rng.integers(1, 256, size=T).astype(np.int32)
    base = _run_ours(pf, cf, tokens, "bf16")
    rot = _run_ours(pr, cr, tokens, "w4a16")
    agree = (base.argmax(-1) == rot.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"
