"""AWQ/GPTQ model ingestion: the grouped-int4 model's logits must match a
bf16 model built from the exactly-dequantized weights (the same oracle the
reference uses for its quantized-model tests, tests/quantization/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.model_loader.grouped import (load_awq, load_gptq,
                                            make_awq_tensors,
                                            make_gptq_tensors, unpack_awq,
                                            unpack_gptq)
from qspec_tpu.model_loader.loader import load_hf_float


def _float_sd(cfg: ModelConfig, seed=0):
    """HF-named float state dict for a tiny llama."""
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


def _quantize_sd(sd, cfg, fmt, g=64):
    """Replace every projection with fmt-format quant tensors, and return a
    dequantized float twin for the oracle model."""
    make = make_awq_tensors if fmt == "awq" else make_gptq_tensors
    unpack = unpack_awq if fmt == "gptq_never" else None
    qsd, deq_sd = {}, {}
    for k, v in sd.items():
        if k.endswith(".weight") and ("proj" in k):
            w = v.T.astype(np.float32)            # [in, out]
            t = make(w, g)
            base = k[:-len(".weight")]
            for name, val in t.items():
                qsd[base + "." + name] = val
            if fmt == "awq":
                q, zp, s = unpack_awq(t["qweight"], t["qzeros"], t["scales"])
            else:
                q, zp, s = unpack_gptq(t["qweight"], t["qzeros"],
                                       t["scales"], t.get("g_idx"))
            wd = (q.astype(np.float32) - np.repeat(zp, g, 0)) \
                * np.repeat(s, g, 0)
            deq_sd[k] = wd.T.astype(np.float32)
        else:
            qsd[k] = v
            deq_sd[k] = v
    return qsd, deq_sd


@pytest.fixture(scope="module")
def tiny_cfg():
    # dims chosen so K % 256 == 0 paths aren't required (ref path on CPU)
    return ModelConfig(vocab_size=512, hidden_size=128,
                       intermediate_size=192, num_layers=2, num_heads=2,
                       num_kv_heads=2, head_dim=64, quant="none",
                       weightless_norm=False, lm_head_quant="bf16",
                       max_position_embeddings=128)


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


@pytest.mark.parametrize("fmt", ["awq", "gptq"])
def test_grouped_model_matches_dequant_oracle(fmt, tiny_cfg):
    sd = _float_sd(tiny_cfg)
    qsd, deq_sd = _quantize_sd(sd, tiny_cfg, fmt)
    load = load_awq if fmt == "awq" else load_gptq
    params_q, cfg_q = load(qsd, tiny_cfg)
    assert cfg_q.quant == "w4g"
    params_f, cfg_f = load_hf_float(deq_sd, tiny_cfg)

    from qspec_tpu.engine.model_runner import prefill_step
    from qspec_tpu.ops import kv_cache as kvc

    kcfg = kvc.KVCacheConfig(tiny_cfg.num_layers, tiny_cfg.num_kv_heads,
                             tiny_cfg.head_dim, num_pages=8, page_size=16)
    rng = np.random.default_rng(7)
    T = 20
    toks = np.zeros((1, 32), np.int32)
    toks[0, :T] = rng.integers(1, 500, size=T)
    pos = np.arange(32, dtype=np.int32)[None]
    tables = np.zeros((1, 4), np.int32)
    tables[0, :2] = [1, 2]
    ctx = np.asarray([T], np.int32)

    lg_q, _ = prefill_step(params_q, kvc.allocate(kcfg), jnp.asarray(toks),
                           jnp.asarray(pos), jnp.asarray(tables),
                           jnp.asarray(ctx), cfg=cfg_q, scheme="w4a16")
    lg_f, _ = prefill_step(params_f, kvc.allocate(kcfg), jnp.asarray(toks),
                           jnp.asarray(pos), jnp.asarray(tables),
                           jnp.asarray(ctx), cfg=cfg_f, scheme="bf16")
    a, b = np.asarray(lg_q, np.float32), np.asarray(lg_f, np.float32)
    # same dequant values, same bf16 compute path: near-identical logits
    assert np.abs(a - b).max() < 0.15 * max(np.abs(b).max(), 1.0)
    assert (a.argmax(-1) == b.argmax(-1)).all()


@pytest.mark.parametrize("fmt", ["awq", "gptq"])
def test_grouped_engine_e2e_greedy(fmt, tiny_cfg):
    """The w4g engine generates, and ngram speculation on it preserves the
    greedy invariant (AWQ/GPTQ models speculate via ngram/medusa)."""
    sd = _float_sd(tiny_cfg, seed=3)
    qsd, _ = _quantize_sd(sd, tiny_cfg, fmt)
    load = load_awq if fmt == "awq" else load_gptq
    params, cfg = load(qsd, tiny_cfg)
    rng = np.random.default_rng(11)
    prompts = [list(map(int, rng.integers(1, 500, size=12))) for _ in range(2)]
    ar = _run_engine(cfg, params, prompts)
    sp = _run_engine(cfg, params, prompts,
                     spec=SpeculativeConfig(num_speculative_tokens=3,
                                            method="ngram"))
    assert ar == sp
    assert all(len(v) > 0 for v in ar.values())


def test_qspec_draft_rejected_on_w4g(tiny_cfg):
    sd = _float_sd(tiny_cfg, seed=4)
    qsd, _ = _quantize_sd(sd, tiny_cfg, "awq")
    params, cfg = load_awq(qsd, tiny_cfg)
    with pytest.raises(ValueError, match="w4g"):
        _run_engine(cfg, params, [[1, 2, 3]],
                    spec=SpeculativeConfig(num_speculative_tokens=3,
                                           method="qspec"))
