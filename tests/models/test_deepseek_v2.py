"""DeepSeek-V2 MLA family vs the HF transformers implementation
(reference vllm/model_executor/models/deepseek_v2.py; transformers>=4.46
ships DeepseekV2ForCausalLM, so HF IS the oracle here — unlike V1 whose
upstream is remote-code only).

Covers: the weight-absorbed MQA-over-latent decode form vs HF's
materialized per-head K/V (they must agree — the absorption is an exact
algebraic identity), the decoupled-rope interleave, q low-rank (q_a/q_b)
vs direct q projections, the latent KV cache geometry, and the V2 MoE
(routed_scaling_factor over the V1-style shared-expert layout)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
pytest.importorskip("transformers.models.deepseek_v2")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.model_loader.families import load_family_float  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402

TOKENS = list(range(2, 14))

BASE = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, max_position_embeddings=64,
            rope_theta=10000.0, rms_norm_eps=1e-6,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16, attention_bias=False, tie_word_embeddings=False,
            first_k_dense_replace=99, n_routed_experts=None,
            q_lora_rank=None)


def hf_golden(hf_kwargs, seed=0):
    cfg = transformers.DeepseekV2Config(**hf_kwargs)
    torch.manual_seed(seed)
    hf = transformers.DeepseekV2ForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    with torch.no_grad():
        want = hf(torch.tensor([TOKENS])).logits[0].numpy()
    return sd, want


def run_ours(hf_kwargs, sd):
    cfg = resolve({"architectures": ["DeepseekV2ForCausalLM"], **hf_kwargs})
    assert cfg.attention_type == "mla"
    params, cfg = load_family_float(sd, cfg)
    T = len(TOKENS)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.cache_kv_heads,
                               head_dim=cfg.cache_head_dim, num_pages=8,
                               page_size=16)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    logits, _ = model_forward(params, cfg,
                              jnp.asarray(np.asarray(TOKENS)[None]),
                              cache, batch, scheme="bf16")
    return np.asarray(logits[0], np.float32), cfg


def check(hf_kwargs, seed=0, tol=0.12):
    sd, want = hf_golden(hf_kwargs, seed)
    got, cfg = run_ours(hf_kwargs, sd)
    scale = max(np.abs(want).max(), 1.0)
    assert np.abs(got - want).max() < tol * scale, \
        (np.abs(got - want).max(), scale)
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.9
    return cfg


def test_mla_dense_direct_q():
    cfg = check(BASE)
    # latent cache geometry: ONE kv "head" of (r + dr) padded to 128 lanes
    assert cfg.cache_kv_heads == 1
    assert cfg.cache_head_dim == 128


def test_mla_dense_q_lora():
    check({**BASE, "q_lora_rank": 48}, seed=1)


def test_mla_moe_routed_scaling():
    cfg = check({**BASE, "n_routed_experts": 4, "num_experts_per_tok": 2,
                 "moe_intermediate_size": 64, "n_shared_experts": 1,
                 "first_k_dense_replace": 1, "norm_topk_prob": True,
                 "routed_scaling_factor": 1.5}, seed=2)
    assert cfg.num_experts == 4
    assert cfg.routed_scaling_factor == 1.5
    assert cfg.shared_expert_intermediate_size == 64


def test_mla_engine_e2e_greedy_with_spec():
    """MLA through the full engine: generation works and device-side ngram
    speculation preserves the greedy transcript over the latent cache."""
    from qspec_tpu.config import (CacheConfig, EngineConfig, SchedulerConfig,
                                  SpeculativeConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    sd, _ = hf_golden(BASE, seed=3)
    cfg = resolve({"architectures": ["DeepseekV2ForCausalLM"], **BASE})
    params, cfg = load_family_float(sd, cfg)

    def run(spec):
        ec = EngineConfig(
            model=cfg, cache=CacheConfig(page_size=16),
            scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=64,
                                      prefill_chunk_size=32,
                                      decode_batch_buckets=(2,),
                                      prefill_token_buckets=(32,)),
            speculative=spec)
        eng = LLMEngine(ec, params)
        rng = np.random.default_rng(5)
        for p in [list(map(int, rng.integers(2, 250, size=9)))
                  for _ in range(2)]:
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=10,
                                              ignore_eos=True))
        outs = {}
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o.output_token_ids
        return outs

    ar = run(None)
    sp = run(SpeculativeConfig(num_speculative_tokens=3, method="ngram"))
    assert ar == sp
    assert all(len(v) == 10 for v in ar.values())
