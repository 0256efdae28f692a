"""GGUF ingestion: container round-trip, Q4_0 -> grouped-int4 oracle match,
F16 serve, llama.cpp q/k permutation inversion (reference:
vllm tests/models/test_gguf.py compares GGUF vs HF outputs)."""

import numpy as np
import pytest

from qspec_tpu.config import ModelConfig
from qspec_tpu.model_loader.gguf import (GGML_F16, GGML_F32, GGML_Q4_0,
                                         GGML_Q4_K, GGML_Q5_K, GGML_Q6_K,
                                         GGML_Q8_0, load_gguf, quantize_q4_0,
                                         quantize_q4_k, quantize_q5_k,
                                         quantize_q6_k, quantize_q8_0,
                                         read_gguf, to_float, write_gguf)
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
        if quant == "q6_k" and "norm" not in name and ww.ndim == 2 \
                and name not in ("token_embd.weight", "output.weight"):
            return (GGML_Q6_K, quantize_q6_k(ww), ne)
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


# ---------------------------------------------------------------------------
# K-quants: the vectorized dequant must agree bit-for-bit with a scalar
# implementation transcribed from the ggml spec (ggml-quants.c
# dequantize_row_q{4,5,6}_K), and K-quant models must serve through the
# bf16 path matching their dequantized float twin.
# ---------------------------------------------------------------------------


def _scale_min_k4(scales, j):
    """ggml get_scale_min_k4, scalar."""
    if j < 4:
        return scales[j] & 63, scales[j + 4] & 63
    sc = (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4)
    mn = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
    return sc, mn


def _ref_q4_k(raw, n):
    out = np.empty(n, np.float32)
    y = 0
    for i in range(n // 256):
        rec = np.frombuffer(raw[i * 144:(i + 1) * 144], np.uint8)
        d = float(rec[0:2].copy().view(np.float16)[0])
        dmin = float(rec[2:4].copy().view(np.float16)[0])
        scales, q = rec[4:16], rec[16:]
        is_, qoff = 0, 0
        for _ in range(0, 256, 64):
            sc1, m1 = _scale_min_k4(scales, is_)
            sc2, m2 = _scale_min_k4(scales, is_ + 1)
            for l in range(32):
                out[y + l] = d * sc1 * (q[qoff + l] & 0xF) - dmin * m1
            for l in range(32):
                out[y + 32 + l] = d * sc2 * (q[qoff + l] >> 4) - dmin * m2
            y += 64
            qoff += 32
            is_ += 2
    return out


def _ref_q5_k(raw, n):
    out = np.empty(n, np.float32)
    y = 0
    for i in range(n // 256):
        rec = np.frombuffer(raw[i * 176:(i + 1) * 176], np.uint8)
        d = float(rec[0:2].copy().view(np.float16)[0])
        dmin = float(rec[2:4].copy().view(np.float16)[0])
        scales, qh, ql = rec[4:16], rec[16:48], rec[48:]
        is_, qoff, u1, u2 = 0, 0, 1, 2
        for _ in range(0, 256, 64):
            sc1, m1 = _scale_min_k4(scales, is_)
            sc2, m2 = _scale_min_k4(scales, is_ + 1)
            for l in range(32):
                out[y + l] = d * sc1 * ((ql[qoff + l] & 0xF)
                                        + (16 if qh[l] & u1 else 0)) \
                    - dmin * m1
            for l in range(32):
                out[y + 32 + l] = d * sc2 * ((ql[qoff + l] >> 4)
                                             + (16 if qh[l] & u2 else 0)) \
                    - dmin * m2
            y += 64
            qoff += 32
            is_ += 2
            u1 <<= 2
            u2 <<= 2
    return out


def _ref_q6_k(raw, n):
    out = np.empty(n, np.float32)
    y = 0
    for i in range(n // 256):
        rec = np.frombuffer(raw[i * 210:(i + 1) * 210], np.uint8)
        ql, qh = rec[:128], rec[128:192]
        sc = rec[192:208].copy().view(np.int8)
        d = float(rec[208:210].copy().view(np.float16)[0])
        for half in range(2):
            lo, ho, so = half * 64, half * 32, half * 8
            for l in range(32):
                is_ = l // 16
                q1 = (int(ql[lo + l] & 0xF)
                      | (int((qh[ho + l] >> 0) & 3) << 4)) - 32
                q2 = (int(ql[lo + l + 32] & 0xF)
                      | (int((qh[ho + l] >> 2) & 3) << 4)) - 32
                q3 = (int(ql[lo + l] >> 4)
                      | (int((qh[ho + l] >> 4) & 3) << 4)) - 32
                q4 = (int(ql[lo + l + 32] >> 4)
                      | (int((qh[ho + l] >> 6) & 3) << 4)) - 32
                out[y + l] = d * sc[so + is_] * q1
                out[y + l + 32] = d * sc[so + is_ + 2] * q2
                out[y + l + 64] = d * sc[so + is_ + 4] * q3
                out[y + l + 96] = d * sc[so + is_ + 6] * q4
            y += 128
    return out


@pytest.mark.parametrize("ggml_type,quantize,ref,tol", [
    (GGML_Q4_K, quantize_q4_k, _ref_q4_k, 1 / 7.5),
    (GGML_Q5_K, quantize_q5_k, _ref_q5_k, 1 / 15.0),
    (GGML_Q6_K, quantize_q6_k, _ref_q6_k, 1 / 31.0),
])
def test_k_quant_dequant_matches_spec(ggml_type, quantize, ref, tol):
    rng = np.random.default_rng(3)
    w = rng.standard_normal((4, 512)).astype(np.float32)
    raw = quantize(w)
    t = {"type": ggml_type, "ne": [512, 4], "shape": (4, 512), "data": raw}
    got = to_float(t)
    # vectorized dequant == scalar from-spec dequant, bit for bit
    np.testing.assert_array_equal(got.reshape(-1),
                                  ref(raw, w.size).astype(got.dtype))
    # and the encoder round-trips within a quant step of the source
    assert np.abs(got - w).max() < np.abs(w).max() * tol + 0.05


def test_q6_k_model_serves_as_bf16(tmp_path, tiny_cfg):
    path = str(tmp_path / "k.gguf")
    _write_model(path, tiny_cfg, quant="q6_k")
    params, cfg = load_gguf(path)
    assert cfg.quant == "none"    # K-quants serve dequantized (bf16)
    meta, tensors = read_gguf(path)
    from qspec_tpu.model_loader.gguf import _hf_items, _unpermute
    deq = {}
    for hf_name, t, heads in _hf_items(meta, tensors, cfg):
        w = to_float(t)
        if heads is not None:
            w = _unpermute(w, heads)
        deq[hf_name] = w
    params_f, cfg_f = load_hf_float(deq, tiny_cfg)
    a = _logits(cfg, params, "bf16")
    b = _logits(cfg_f, params_f, "bf16")
    assert np.abs(a - b).max() < 0.05 * max(np.abs(b).max(), 1.0)
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_q4_0_file_with_q6_k_output_head(tmp_path, tiny_cfg):
    """llama.cpp Q4_0 files keep output.weight in Q6_K; the trunk must
    still take the grouped-int4 path."""
    path = str(tmp_path / "mix.gguf")
    hf = _write_model(path, tiny_cfg, quant="q4_0")
    meta, tensors = read_gguf(path)
    from qspec_tpu.model_loader.gguf import quantize_q6_k
    out_w = hf["lm_head.weight"]
    tensors["output.weight"] = {
        "type": 14, "ne": [out_w.shape[1], out_w.shape[0]],
        "shape": out_w.shape, "data": quantize_q6_k(out_w)}
    rewrap = {n: (t["type"], t["data"], t["ne"]) for n, t in tensors.items()}
    write_gguf(path, meta, rewrap)
    params, cfg = load_gguf(path)
    assert cfg.quant == "w4g"
