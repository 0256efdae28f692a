"""Qwen3 family: per-head q/k RMSNorm before rope (qk_norm), no attention
bias, explicit head_dim; Qwen3-MoE adds qwen2-moe-style routing without the
shared expert (reference: vllm/model_executor/models/qwen3.py,
qwen3_moe.py). HF golden + QuaRot pipeline + QSpec invariant."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402


def build_hf(seed=0):
    hf_cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False, attention_bias=False,
        sliding_window=None, use_sliding_window=False)
    torch.manual_seed(seed)
    hf = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    sd = {kk: v.detach().numpy() for kk, v in hf.state_dict().items()}
    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict())
    return hf, cfg, sd


def build_hf_moe(seed=0, E=4, k=2):
    hf_cfg = transformers.Qwen3MoeConfig(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        moe_intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        num_experts=E, num_experts_per_tok=k, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[], tie_word_embeddings=False,
        attention_bias=False, sliding_window=None, use_sliding_window=False)
    torch.manual_seed(seed)
    hf = transformers.Qwen3MoeForCausalLM(hf_cfg).eval()
    sd = {kk: v.detach().numpy() for kk, v in hf.state_dict().items()}
    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict())
    return hf, cfg, sd


def test_registry_resolves():
    from qspec_tpu.models.registry import resolve
    cfg = resolve({"architectures": ["Qwen3ForCausalLM"],
                   "vocab_size": 256, "hidden_size": 128,
                   "intermediate_size": 224, "num_hidden_layers": 2,
                   "num_attention_heads": 4, "head_dim": 32})
    assert cfg.arch == "qwen3"
    assert cfg.qk_norm
    assert not cfg.qkv_bias
    assert cfg.head_dim == 32
    cfg = resolve({"architectures": ["Qwen3MoeForCausalLM"],
                   "vocab_size": 256, "hidden_size": 128,
                   "intermediate_size": 224, "num_hidden_layers": 2,
                   "num_attention_heads": 4, "head_dim": 32,
                   "num_experts": 4, "moe_intermediate_size": 96,
                   "norm_topk_prob": True})
    assert cfg.arch == "qwen3moe"
    assert cfg.qk_norm
    assert cfg.num_experts == 4
    assert cfg.moe_softmax_before_topk
    assert cfg.moe_norm_topk_prob
    assert cfg.shared_expert_intermediate_size == 0


def _prefill_batch(T):
    return AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))


@pytest.mark.parametrize("moe", [False, True])
def test_qwen3_prefill_logits_match_hf(rng, moe):
    hf, cfg, sd = (build_hf_moe if moe else build_hf)()
    from qspec_tpu.model_loader.loader import load_hf_float
    params, cfg_f = load_hf_float(sd, cfg)
    assert "q_norm" in params["layers"]

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


def test_quantize_float_qwen3_runs(rng):
    """The offline QuaRot pipeline carries the post-projection q/k norm
    gammas through unrotated (the per-head basis is untouched by the
    residual rotation) and the quantized model tracks the float one."""
    _, cfg, sd = build_hf(seed=3)
    from qspec_tpu.model_loader.loader import load_hf_float, quantize_float
    params_q, cfg_q = quantize_float(sd, cfg)
    params_f, cfg_f = load_hf_float(sd, cfg)
    assert "q_norm" in params_q["layers"]

    T = 12
    tokens = rng.integers(1, 256, size=T).astype(np.int32)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8,
                               page_size=16)
    lg_q, _ = model_forward(params_q, cfg_q, jnp.asarray(tokens[None]),
                            kvc.allocate(kv_cfg), _prefill_batch(T),
                            scheme="w4a16")
    lg_f, _ = model_forward(params_f, cfg_f, jnp.asarray(tokens[None]),
                            kvc.allocate(kv_cfg), _prefill_batch(T),
                            scheme="bf16")
    a = np.asarray(lg_q[0], np.float32)
    b = np.asarray(lg_f[0], np.float32)
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree >= 0.7, f"argmax agreement {agree}"


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


def test_qk_norm_quarot_spec_invariant():
    """Greedy QSpec == greedy AR through the qk-norm attention block."""
    from qspec_tpu.models.llama import init_params
    cfg = ModelConfig.tiny(quant="w4", qk_norm=True)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(11)
    prompts = [list(map(int, rng.integers(1, 500,
                                          size=int(rng.integers(8, 30)))))
               for _ in range(3)]
    ar = _engine_outputs(cfg, params, prompts, spec=False)
    sp = _engine_outputs(cfg, params, prompts, spec=True)
    assert ar == sp


def test_qk_norm_tp_matches_single():
    """qk-norm under a TP mesh (replicated gammas, whole heads per shard)
    must reproduce the single-chip transcripts."""
    from qspec_tpu.models.llama import init_params
    from qspec_tpu.parallel.tp import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs virtual device mesh")
    cfg = ModelConfig.tiny(quant="w4", qk_norm=True, num_kv_heads=4)
    rng = np.random.default_rng(13)
    prompts = [list(map(int, rng.integers(1, 500, size=16)))
               for _ in range(2)]
    mesh = make_mesh(tp_size=2)
    ar_single = _engine_outputs(cfg, init_params(cfg, seed=0), prompts,
                                spec=False)
    ar_mesh = _engine_outputs(cfg, init_params(cfg, seed=0, tp_size=2),
                              prompts, spec=False, mesh=mesh)
    agree = np.mean([t1 == t2
                     for r in ar_single
                     for t1, t2 in zip(ar_single[r], ar_mesh[r])])
    assert agree >= 0.8, f"token agreement {agree}"
