"""Qwen2-MoE family: softmax-before-topk router + sigmoid-gated shared
expert (reference: vllm/model_executor/models/qwen2_moe.py). HF golden +
loader + QSpec invariant + EP mesh."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402


def build_hf(seed=0, E=4, k=2):
    hf_cfg = transformers.Qwen2MoeConfig(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        moe_intermediate_size=96, shared_expert_intermediate_size=160,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        num_experts=E, num_experts_per_tok=k, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        tie_word_embeddings=False, sliding_window=None,
        use_sliding_window=False)
    torch.manual_seed(seed)
    hf = transformers.Qwen2MoeForCausalLM(hf_cfg).eval()
    sd = {kk: v.detach().numpy() for kk, v in hf.state_dict().items()}
    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict())
    return hf, cfg, sd


def test_registry_resolves():
    from qspec_tpu.models.registry import resolve
    cfg = resolve({"architectures": ["Qwen2MoeForCausalLM"],
                   "vocab_size": 256, "hidden_size": 128,
                   "intermediate_size": 224, "num_hidden_layers": 2,
                   "num_attention_heads": 4,
                   "shared_expert_intermediate_size": 160,
                   "num_experts": 4, "norm_topk_prob": True})
    assert cfg.arch == "qwen2moe"
    assert cfg.moe_softmax_before_topk
    assert cfg.moe_norm_topk_prob
    assert cfg.shared_expert_intermediate_size == 160
    assert cfg.qkv_bias


def test_qwen2_moe_prefill_logits_match_hf(rng):
    hf, cfg, sd = build_hf()
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
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    ours, _ = model_forward(params, cfg_f, jnp.asarray(tokens[None]), cache,
                            batch, scheme="bf16")
    ours = np.asarray(ours[0], np.float32)

    agree = (hf_logits.argmax(-1) == ours.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"
    hf_lp = hf_logits - hf_logits.max(-1, keepdims=True)
    our_lp = ours - ours.max(-1, keepdims=True)
    np.testing.assert_allclose(our_lp, hf_lp, atol=0.35)


def _engine_outputs(cfg, params, prompts, spec, mesh=None):
    from qspec_tpu.config import (CacheConfig, EngineConfig, SchedulerConfig,
                                  SpeculativeConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    ec = EngineConfig(
        model=cfg, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=256,
                                  prefill_chunk_size=64,
                                  decode_batch_buckets=(4,),
                                  prefill_token_buckets=(64,)),
        speculative=SpeculativeConfig(num_speculative_tokens=3)
        if spec else None)
    eng = LLMEngine(ec, params, mesh=mesh)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12,
                                          ignore_eos=True))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    return outs


@pytest.fixture(scope="module")
def moe_w4():
    from qspec_tpu.models.llama import init_params
    cfg = ModelConfig.tiny(quant="w4", num_experts=4, num_experts_per_tok=2,
                           moe_intermediate_size=128,
                           shared_expert_intermediate_size=256,
                           moe_softmax_before_topk=True,
                           moe_norm_topk_prob=True)
    return cfg, init_params(cfg, seed=0)


def test_shared_expert_quarot_spec_invariant(moe_w4):
    """Greedy QSpec == greedy AR through the shared-expert MoE block."""
    cfg, params = moe_w4
    rng = np.random.default_rng(17)
    prompts = [list(map(int, rng.integers(1, 500,
                                          size=int(rng.integers(8, 30)))))
               for _ in range(3)]
    ar = _engine_outputs(cfg, params, prompts, spec=False)
    sp = _engine_outputs(cfg, params, prompts, spec=True)
    assert ar == sp


def test_quantize_float_qwen2_moe_runs(rng):
    """The offline QuaRot pipeline ingests qwen2-moe checkpoints (per-width
    Hadamards for experts and the shared expert) and the quantized model
    tracks the float one."""
    _, cfg, sd = build_hf(seed=3)
    from qspec_tpu.model_loader.loader import load_hf_float, quantize_float
    params_q, cfg_q = quantize_float(sd, cfg)
    params_f, cfg_f = load_hf_float(sd, cfg)
    assert "shared_K" in params_q["hadamards"]

    T = 12
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
    lg_q, _ = model_forward(params_q, cfg_q, jnp.asarray(tokens[None]),
                            kvc.allocate(kv_cfg), batch, scheme="w4a16")
    lg_f, _ = model_forward(params_f, cfg_f, jnp.asarray(tokens[None]),
                            kvc.allocate(kv_cfg), batch, scheme="bf16")
    a = np.asarray(lg_q[0], np.float32)
    b = np.asarray(lg_f[0], np.float32)
    # int4 quantization error: demand strong argmax agreement only
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree >= 0.7, f"argmax agreement {agree}"


def test_shared_expert_ep_matches_single(moe_w4):
    """EP mesh with the replicated shared expert must reproduce the
    single-chip transcripts (the /ntp correction makes the psum exact)."""
    from qspec_tpu.models.llama import init_params
    from qspec_tpu.parallel.tp import make_mesh

    cfg, params = moe_w4
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual device mesh")
    rng = np.random.default_rng(21)
    prompts = [list(map(int, rng.integers(1, 500, size=16)))
               for _ in range(2)]
    mesh = make_mesh(tp_size=2)
    params_tp = init_params(cfg, seed=0, tp_size=2)
    ar_mesh = _engine_outputs(cfg, params_tp, prompts, spec=False, mesh=mesh)
    ar_single = _engine_outputs(cfg, params, prompts, spec=False)
    agree = np.mean([t1 == t2
                     for r in ar_single
                     for t1, t2 in zip(ar_single[r], ar_mesh[r])])
    assert agree >= 0.8, f"token agreement {agree}"
