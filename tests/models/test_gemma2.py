"""Gemma-2 family: alternating sliding/global attention, softcapping,
post-block norms (reference: vllm/model_executor/models/gemma2.py).
HF golden + engine run + window/softcap unit checks."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402


def build_hf(seed=0, sliding_window=16):
    hf_cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, sliding_window=sliding_window,
        query_pre_attn_scalar=24, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, tie_word_embeddings=True,
        hidden_activation="gelu_pytorch_tanh", attention_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(seed)
    hf = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    sd = {kk: v.detach().numpy() for kk, v in hf.state_dict().items()}
    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict())
    return hf, cfg, sd


def test_registry_and_config():
    from qspec_tpu.models.registry import resolve
    cfg = resolve({"architectures": ["Gemma2ForCausalLM"], "vocab_size": 256,
                   "hidden_size": 128, "intermediate_size": 224,
                   "num_hidden_layers": 4, "num_attention_heads": 4,
                   "head_dim": 32, "attn_logit_softcapping": 50.0,
                   "final_logit_softcapping": 30.0,
                   "query_pre_attn_scalar": 24, "sliding_window": 16})
    assert cfg.arch == "gemma2"
    assert cfg.post_norms
    assert cfg.sliding_window_pattern == 2
    assert cfg.attn_logit_softcap == 50.0
    assert cfg.final_logit_softcap == 30.0
    assert cfg.query_pre_attn_scalar == 24
    assert cfg.embed_scale is not None
    assert cfg.norm_weight_offset == 1.0


def test_gemma2_prefill_logits_match_hf(rng):
    hf, cfg, sd = build_hf()
    from qspec_tpu.model_loader.loader import load_hf_float
    params, cfg_f = load_hf_float(sd, cfg)
    assert cfg_f.post_norms

    T = 48  # > sliding_window so the alternation matters
    tokens = rng.integers(3, 256, size=T).astype(np.int32)
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


def test_gemma2_engine_generates(rng):
    """Decode path (incremental, paged) with the alternating window: engine
    greedy transcript matches HF greedy generation."""
    hf, cfg, sd = build_hf(seed=5)
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.model_loader.loader import load_hf_float
    from qspec_tpu.sampling_params import SamplingParams

    params, cfg_f = load_hf_float(sd, cfg)
    prompt = [int(t) for t in rng.integers(3, 256, size=24)]
    N = 10
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor([prompt]), max_new_tokens=N,
                             do_sample=False)[0, len(prompt):].tolist()

    ec = EngineConfig(
        model=cfg_f, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128,
                                  prefill_chunk_size=32,
                                  decode_batch_buckets=(2,),
                                  prefill_token_buckets=(32,)))
    eng = LLMEngine(ec, params)
    rid = eng.add_request(prompt, SamplingParams(temperature=0.0,
                                                 max_tokens=N,
                                                 ignore_eos=True))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    assert outs[rid] == hf_out


def test_quarot_rejected_for_gemma2():
    _, cfg, sd = build_hf(seed=1)
    from qspec_tpu.model_loader.loader import quantize_float
    with pytest.raises(ValueError, match="gemma2"):
        quantize_float(sd, cfg)


def test_gemma3_vs_hf():
    """gemma3: dual rope (local theta on sliding layers, global every
    6th... here every 2nd), per-head (1+w) q/k RMSNorm, pre+post norms
    (reference models/gemma3.py)."""
    from tests.models.test_gpt_family import run_ours

    hf_cfg = transformers.Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        sliding_window=8, sliding_window_pattern=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, pad_token_id=1)
    torch.manual_seed(0)
    hf = transformers.Gemma3ForCausalLM(hf_cfg).eval()
    assert hf_cfg.layer_types[:2] == ["sliding_attention", "full_attention"]

    from qspec_tpu.model_loader.loader import load_hf_float
    from qspec_tpu.models.registry import resolve
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["Gemma3ForCausalLM"]})
    assert cfg.sliding_global_every and cfg.rope_local_theta == 10_000.0
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, cfg = load_hf_float(sd, cfg)
    assert "rope_cache_local" in params

    toks = list(range(2, 22))     # > sliding window: both masks exercised
    got = run_ours(params, cfg, toks)
    with torch.no_grad():
        want = hf(torch.tensor([toks])).logits[0].numpy()
    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.9, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.4, rtol=0.05)
