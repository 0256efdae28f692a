"""compressed-tensors ingestion: pack-quantized int4 -> w4g grouped path,
int-quantized int8 -> w8 path. Oracle: logits must match a bf16 model built
from the exactly-dequantized weights (the same pattern the reference uses,
tests/quantization/test_compressed_tensors.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.model_loader.ct import (load_compressed_tensors,
                                       make_ct_fp8_tensors,
                                       make_ct_int8_tensors,
                                       make_ct_packed_tensors)
from qspec_tpu.model_loader.loader import load_hf_float


def _float_sd(cfg: ModelConfig, seed=0):
    rng = np.random.default_rng(seed)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def d(i, o):
        return (rng.standard_normal((o, i)) * 0.05).astype(np.float32)

    sd = {"model.embed_tokens.weight": d(H, V),
          "model.norm.weight": np.ones(H, np.float32),
          "lm_head.weight": d(H, V)}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = d(H, cfg.q_size)
        sd[p + "self_attn.k_proj.weight"] = d(H, cfg.kv_size)
        sd[p + "self_attn.v_proj.weight"] = d(H, cfg.kv_size)
        sd[p + "self_attn.o_proj.weight"] = d(cfg.q_size, H)
        sd[p + "mlp.gate_proj.weight"] = d(H, I)
        sd[p + "mlp.up_proj.weight"] = d(H, I)
        sd[p + "mlp.down_proj.weight"] = d(I, H)
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
    return sd


def _quantize_sd(sd, fmt, **kw):
    """Replace projections with compressed-tensors tensors + build the
    dequantized float twin."""
    qsd, deq_sd = {}, {}
    for k, v in sd.items():
        if k.endswith(".weight") and "proj" in k:
            w = v.T.astype(np.float32)                  # [K, N]
            base = k[:-len(".weight")]
            if fmt == "packed":
                t, deq = make_ct_packed_tensors(w, **kw)
            elif fmt == "fp8":
                t, deq = make_ct_fp8_tensors(w, **kw)
            else:
                t, deq = make_ct_int8_tensors(w, **kw)
            for name, val in t.items():
                qsd[base + "." + name] = val
            deq_sd[k] = deq.T.astype(np.float32)
        else:
            qsd[k] = v
            deq_sd[k] = v
    return qsd, deq_sd


@pytest.fixture(scope="module")
def tiny_cfg():
    return ModelConfig(vocab_size=512, hidden_size=128,
                       intermediate_size=192, num_layers=2, num_heads=2,
                       num_kv_heads=2, head_dim=64, quant="none",
                       weightless_norm=False, lm_head_quant="bf16",
                       max_position_embeddings=128)


def _logits(cfg, params, scheme):
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


@pytest.mark.parametrize("kw", [
    dict(group_size=64, symmetric=True),
    dict(group_size=64, symmetric=False),
    dict(group_size=64, symmetric=False, pack_zp=True),
    dict(group_size=0, symmetric=True),      # channel strategy
])
def test_packed_matches_dequant_oracle(tiny_cfg, kw):
    sd = _float_sd(tiny_cfg)
    qsd, deq_sd = _quantize_sd(sd, "packed", **kw)
    params_q, cfg_q = load_compressed_tensors(qsd, tiny_cfg)
    assert cfg_q.quant == "w4g"
    params_f, cfg_f = load_hf_float(deq_sd, tiny_cfg)
    a = _logits(cfg_q, params_q, "w4a16")
    b = _logits(cfg_f, params_f, "bf16")
    assert np.abs(a - b).max() < 0.15 * max(np.abs(b).max(), 1.0)
    assert (a.argmax(-1) == b.argmax(-1)).all()


@pytest.mark.parametrize("per_tensor", [False, True])
def test_int8_matches_dequant_oracle(tiny_cfg, per_tensor):
    sd = _float_sd(tiny_cfg, seed=2)
    qsd, deq_sd = _quantize_sd(sd, "int8", per_tensor=per_tensor)
    params_q, cfg_q = load_compressed_tensors(qsd, tiny_cfg)
    assert cfg_q.quant == "w8"
    params_f, cfg_f = load_hf_float(deq_sd, tiny_cfg)
    a = _logits(cfg_q, params_q, "w4a16")
    b = _logits(cfg_f, params_f, "bf16")
    assert np.abs(a - b).max() < 0.15 * max(np.abs(b).max(), 1.0)
    assert (a.argmax(-1) == b.argmax(-1)).all()


@pytest.mark.parametrize("per_tensor", [False, True])
def test_fp8_matches_dequant_oracle(tiny_cfg, per_tensor):
    """float-quantized (fp8 e4m3) -> w8 path with fp8-typed leaves; logits
    must match the bf16 model built from the exactly-dequantized weights."""
    sd = _float_sd(tiny_cfg, seed=5)
    qsd, deq_sd = _quantize_sd(sd, "fp8", per_tensor=per_tensor)
    params_q, cfg_q = load_compressed_tensors(qsd, tiny_cfg)
    assert cfg_q.quant == "w8"
    assert params_q["layers"]["qkv"]["w8"].dtype == jnp.float8_e4m3fn
    params_f, cfg_f = load_hf_float(deq_sd, tiny_cfg)
    a = _logits(cfg_q, params_q, "w4a16")
    b = _logits(cfg_f, params_f, "bf16")
    assert np.abs(a - b).max() < 0.15 * max(np.abs(b).max(), 1.0)
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_fp8_explicit_format_dispatch(tiny_cfg):
    sd = _float_sd(tiny_cfg, seed=6)
    qsd, _ = _quantize_sd(sd, "fp8")
    params, cfg = load_compressed_tensors(qsd, tiny_cfg,
                                          qconfig={"format":
                                                   "float-quantized"})
    assert cfg.quant == "w8"


def _run_engine(cfg, params, prompts, max_tokens=8, spec=None):
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams
    ec = EngineConfig(
        model=cfg, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128,
                                  prefill_chunk_size=32,
                                  decode_batch_buckets=(2,),
                                  prefill_token_buckets=(32,)),
        speculative=spec)
    eng = LLMEngine(ec, params)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0,
                                          max_tokens=max_tokens))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    return outs


@pytest.mark.parametrize("fmt", ["packed", "int8", "fp8"])
def test_ct_engine_e2e_greedy(tiny_cfg, fmt):
    """The ingested engine generates; ngram speculation preserves greedy."""
    sd = _float_sd(tiny_cfg, seed=3)
    qsd, _ = _quantize_sd(sd, fmt, **({"group_size": 64} if fmt == "packed"
                                      else {}))
    params, cfg = load_compressed_tensors(qsd, tiny_cfg)
    rng = np.random.default_rng(11)
    prompts = [list(map(int, rng.integers(1, 500, size=12)))
               for _ in range(2)]
    ar = _run_engine(cfg, params, prompts)
    sp = _run_engine(cfg, params, prompts,
                     spec=SpeculativeConfig(num_speculative_tokens=3,
                                            method="ngram"))
    assert ar == sp
    assert all(len(v) > 0 for v in ar.values())


def test_w8_windowed_w4a16_draft_allowed(tiny_cfg):
    """w8 checkpoints may run the shared-weights draft at w4a16 (weight-only
    dequant draft, e.g. with a MagicDec KV window) — only quantized-act
    schemes are rejected."""
    sd = _float_sd(tiny_cfg, seed=4)
    qsd, _ = _quantize_sd(sd, "int8")
    params, cfg = load_compressed_tensors(qsd, tiny_cfg)
    prompts = [[1, 2, 3, 4, 5, 6, 7, 8]]
    ar = _run_engine(cfg, params, prompts)
    sp = _run_engine(cfg, params, prompts,
                     spec=SpeculativeConfig(num_speculative_tokens=3,
                                            draft_scheme="w4a16",
                                            draft_kv_window=32))
    assert ar == sp
    with pytest.raises(ValueError, match="w4g/w8"):
        _run_engine(cfg, params, prompts,
                    spec=SpeculativeConfig(num_speculative_tokens=3,
                                           draft_scheme="w4a8"))


def test_unsupported_format_raises(tiny_cfg):
    sd = _float_sd(tiny_cfg, seed=5)
    qsd, _ = _quantize_sd(sd, "int8")
    with pytest.raises(NotImplementedError, match="marlin-24"):
        load_compressed_tensors(qsd, tiny_cfg,
                                qconfig={"format": "marlin-24"})
    # float-quantized on an int8 checkpoint: dtype check rejects it
    with pytest.raises(ValueError, match="fp8"):
        load_compressed_tensors(qsd, tiny_cfg,
                                qconfig={"format": "float-quantized"})
