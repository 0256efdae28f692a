"""GGUF ingestion: container round-trip, Q4_0 -> grouped-int4 oracle match,
F16 serve, llama.cpp q/k permutation inversion (reference:
vllm tests/models/test_gguf.py compares GGUF vs HF outputs)."""

import numpy as np
import pytest

from qspec_tpu.config import ModelConfig
from qspec_tpu.model_loader.gguf import (GGML_F16, GGML_F32, GGML_Q4_0,
                                         GGML_Q8_0, load_gguf, quantize_q4_0,
                                         quantize_q8_0, read_gguf,
                                         to_float, write_gguf)
from qspec_tpu.model_loader.loader import load_hf_float


@pytest.fixture(scope="module")
def tiny_cfg():
    # rope_theta matches the gguf metadata below (ModelConfig defaults to
    # llama3's 500000, which would give the float oracle different rope)
    return ModelConfig(vocab_size=512, hidden_size=128,
                       intermediate_size=192, num_layers=2, num_heads=2,
                       num_kv_heads=2, head_dim=64, quant="none",
                       weightless_norm=False, lm_head_quant="bf16",
                       max_position_embeddings=128, rope_theta=10000.0)


def _permute(w, n_head):
    """llama.cpp convert_hf_to_gguf permute (HF -> gguf rows)."""
    shape = w.shape
    return (w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(shape))


def _write_model(path, cfg, quant, seed=0):
    """Build a float llama, write it as a GGUF file; return the HF float
    state dict twin (dequantized where projections are quantized)."""
    rng = np.random.default_rng(seed)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def d(i, o):
        return (rng.standard_normal((o, i)) * 0.05).astype(np.float32)

    hf = {"model.embed_tokens.weight": d(H, V),
          "model.norm.weight": np.ones(H, np.float32),
          "lm_head.weight": d(H, V)}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        hf[p + "self_attn.q_proj.weight"] = d(H, cfg.q_size)
        hf[p + "self_attn.k_proj.weight"] = d(H, cfg.kv_size)
        hf[p + "self_attn.v_proj.weight"] = d(H, cfg.kv_size)
        hf[p + "self_attn.o_proj.weight"] = d(cfg.q_size, H)
        hf[p + "mlp.gate_proj.weight"] = d(H, I)
        hf[p + "mlp.up_proj.weight"] = d(H, I)
        hf[p + "mlp.down_proj.weight"] = d(I, H)
        hf[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        hf[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)

    def blk(i, n):
        return f"blk.{i}.{n}"

    def as_tensor(name, w, permute_heads=None):
        ww = _permute(w, permute_heads) if permute_heads else w
        ne = list(reversed(ww.shape))
        if quant == "q4_0" and "norm" not in name and ww.ndim == 2 \
                and name not in ("token_embd.weight", "output.weight"):
            return (GGML_Q4_0, quantize_q4_0(ww), ne)
        if quant == "q8_0" and "norm" not in name and ww.ndim == 2 \
                and name not in ("token_embd.weight", "output.weight"):
            return (GGML_Q8_0, quantize_q8_0(ww), ne)
        return (GGML_F16, ww.astype(np.float16), ne)

    tensors = {
        "token_embd.weight": as_tensor("token_embd.weight",
                                       hf["model.embed_tokens.weight"]),
        "output.weight": as_tensor("output.weight", hf["lm_head.weight"]),
        "output_norm.weight": (GGML_F32, hf["model.norm.weight"], [H]),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        tensors[blk(i, "attn_q.weight")] = as_tensor(
            "q", hf[p + "self_attn.q_proj.weight"], cfg.num_heads)
        tensors[blk(i, "attn_k.weight")] = as_tensor(
            "k", hf[p + "self_attn.k_proj.weight"], cfg.num_kv_heads)
        tensors[blk(i, "attn_v.weight")] = as_tensor(
            "v", hf[p + "self_attn.v_proj.weight"])
        tensors[blk(i, "attn_output.weight")] = as_tensor(
            "o", hf[p + "self_attn.o_proj.weight"])
        tensors[blk(i, "ffn_gate.weight")] = as_tensor(
            "g", hf[p + "mlp.gate_proj.weight"])
        tensors[blk(i, "ffn_up.weight")] = as_tensor(
            "u", hf[p + "mlp.up_proj.weight"])
        tensors[blk(i, "ffn_down.weight")] = as_tensor(
            "d", hf[p + "mlp.down_proj.weight"])
        tensors[blk(i, "attn_norm.weight")] = (
            GGML_F32, hf[p + "input_layernorm.weight"], [H])
        tensors[blk(i, "ffn_norm.weight")] = (
            GGML_F32, hf[p + "post_attention_layernorm.weight"], [H])
    meta = {
        "general.architecture": "llama",
        "llama.embedding_length": H,
        "llama.block_count": cfg.num_layers,
        "llama.attention.head_count": cfg.num_heads,
        "llama.attention.head_count_kv": cfg.num_kv_heads,
        "llama.feed_forward_length": I,
        "llama.context_length": 128,
        "llama.rope.freq_base": 10000.0,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
    }
    write_gguf(path, meta, tensors)
    return hf


def test_container_roundtrip(tmp_path):
    path = str(tmp_path / "t.gguf")
    a = np.arange(64, dtype=np.float32).reshape(8, 8)
    write_gguf(path, {"general.architecture": "llama", "x.n": 7,
                      "x.f": 1.5, "x.b": True},
               {"a": (GGML_F32, a, [8, 8]),
                "b": (GGML_F16, a.astype(np.float16), [8, 8])})
    meta, tensors = read_gguf(path)
    assert meta["general.architecture"] == "llama"
    assert meta["x.n"] == 7 and abs(meta["x.f"] - 1.5) < 1e-6
    assert meta["x.b"] is True
    np.testing.assert_array_equal(to_float(tensors["a"]), a)
    np.testing.assert_allclose(to_float(tensors["b"]), a, rtol=1e-3)


def test_q4_0_q8_0_dequant_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 64)).astype(np.float32)
    t4 = {"type": GGML_Q4_0, "ne": [64, 4], "shape": (4, 64),
          "data": quantize_q4_0(w)}
    err4 = np.abs(to_float(t4) - w).max()
    assert err4 < np.abs(w).max() / 8 + 1e-6
    t8 = {"type": GGML_Q8_0, "ne": [64, 4], "shape": (4, 64),
          "data": quantize_q8_0(w)}
    assert np.abs(to_float(t8) - w).max() < np.abs(w).max() / 100


def _logits(cfg, params, scheme):
    import jax.numpy as jnp

    from qspec_tpu.engine.model_runner import prefill_step
    from qspec_tpu.ops import kv_cache as kvc
    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                             num_pages=8, page_size=16)
    rng = np.random.default_rng(7)
    T = 20
    toks = np.zeros((1, 32), np.int32)
    toks[0, :T] = rng.integers(1, 500, size=T)
    pos = np.arange(32, dtype=np.int32)[None]
    tables = np.zeros((1, 4), np.int32)
    tables[0, :2] = [1, 2]
    ctx = np.asarray([T], np.int32)
    lg, _ = prefill_step(params, kvc.allocate(kcfg), jnp.asarray(toks),
                         jnp.asarray(pos), jnp.asarray(tables),
                         jnp.asarray(ctx), cfg=cfg, scheme=scheme)
    return np.asarray(lg, np.float32)


def test_f16_gguf_matches_hf(tmp_path, tiny_cfg):
    path = str(tmp_path / "f16.gguf")
    hf = _write_model(path, tiny_cfg, quant="f16")
    params, cfg = load_gguf(path)
    assert cfg.quant == "none"
    assert cfg.num_kv_heads == tiny_cfg.num_kv_heads
    params_f, cfg_f = load_hf_float(hf, tiny_cfg)
    a = _logits(cfg, params, "bf16")
    b = _logits(cfg_f, params_f, "bf16")
    # f16 storage vs f32: tiny rounding only; permutation bugs would
    # scramble rope pairs and blow this bound up
    assert np.abs(a - b).max() < 0.05 * max(np.abs(b).max(), 1.0)
    assert (a.argmax(-1) == b.argmax(-1)).all()


@pytest.mark.parametrize("quant", ["q4_0", "q8_0"])
def test_quant_gguf_matches_dequant_oracle(tmp_path, tiny_cfg, quant):
    path = str(tmp_path / "q.gguf")
    _write_model(path, tiny_cfg, quant=quant)
    params, cfg = load_gguf(path)
    assert cfg.quant == ("w4g" if quant == "q4_0" else "none")
    # oracle: dequantize THROUGH the reader and build the float twin
    meta, tensors = read_gguf(path)
    from qspec_tpu.model_loader.gguf import _hf_items, _unpermute
    deq = {}
    for hf_name, t, heads in _hf_items(meta, tensors, cfg):
        w = to_float(t)
        if heads is not None:
            w = _unpermute(w, heads)
        deq[hf_name] = w
    params_f, cfg_f = load_hf_float(deq, tiny_cfg)
    a = _logits(cfg, params, "w4a16" if quant == "q4_0" else "bf16")
    b = _logits(cfg_f, params_f, "bf16")
    assert np.abs(a - b).max() < 0.15 * max(np.abs(b).max(), 1.0)
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_q4_k_raises(tmp_path):
    path = str(tmp_path / "k.gguf")
    write_gguf(path, {"general.architecture": "llama"},
               {"blk.0.attn_q.weight": (12, b"\x00" * 144, [256, 2])})
    with pytest.raises(NotImplementedError, match="Q4_K"):
        read_gguf(path)
