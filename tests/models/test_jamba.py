"""Jamba hybrid (attention + mamba + MoE) golden tests vs transformers
JambaForCausalLM (reference vllm/model_executor/models/jamba.py +
mamba_cache.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.models.jamba import convert_jamba, is_attn_layer  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402


def tiny_jamba():
    hf_cfg = transformers.JambaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=0,
        num_experts=4, num_experts_per_tok=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        mamba_dt_rank=8, use_mamba_kernels=False,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        max_position_embeddings=128)
    torch.manual_seed(0)
    hf = transformers.JambaForCausalLM(hf_cfg).eval()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["JambaForCausalLM"]})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_jamba(sd, cfg)
    return hf, cfg, params


def _setup_cache(cfg, page_size=32, n_pages=8):
    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.cache_kv_heads,
                             cfg.cache_head_dim, num_pages=n_pages,
                             page_size=page_size)
    return kvc.allocate(kcfg)


def _batch(T, start=0, ctx=None, page_size=32):
    positions = jnp.asarray((start + np.arange(T))[None])
    tables = jnp.asarray([[1, 2]], jnp.int32)
    slot = tables[0][positions // page_size] * page_size \
        + positions % page_size
    return AttentionBatch(positions=positions, slot_mapping=slot,
                          block_tables=tables,
                          ctx_lens=jnp.asarray([ctx or (start + T)]))


def test_jamba_layer_pattern():
    _, cfg, params = tiny_jamba()
    assert cfg.arch == "jamba"
    kinds = [is_attn_layer(cfg, i) for i in range(4)]
    assert kinds == [False, True, False, True]
    assert "router" in params["layers"][0]       # expert_offset 0
    assert "gate_up" in params["layers"][1]


def test_jamba_prefill_vs_hf():
    hf, cfg, params = tiny_jamba()
    T = 16
    rng = np.random.default_rng(0)
    toks = rng.integers(2, 250, size=(1, T)).astype(np.int32)
    cache = _setup_cache(cfg)
    logits, cache = model_forward(params, cfg, jnp.asarray(toks), cache,
                                  _batch(T), scheme="bf16")
    got = np.asarray(logits[0], np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(toks.astype(np.int64))).logits[0].numpy()
    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.9, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.35, rtol=0.05)


def test_jamba_stepwise_equals_full():
    """Hybrid cache consistency: paged KV (attention planes) + state-in-
    page (mamba planes) stepwise == full forward."""
    _, cfg, params = tiny_jamba()
    T = 10
    rng = np.random.default_rng(1)
    toks = rng.integers(2, 250, size=(1, T)).astype(np.int32)
    cache = _setup_cache(cfg)
    full, _ = model_forward(params, cfg, jnp.asarray(toks), cache,
                            _batch(T), scheme="bf16")
    full = np.asarray(full[0], np.float32)

    cache = _setup_cache(cfg)
    steps = []
    for t in range(T):
        lg, cache = model_forward(params, cfg, jnp.asarray(toks[:, t:t + 1]),
                                  cache, _batch(1, start=t), scheme="bf16")
        steps.append(np.asarray(lg[0, 0], np.float32))
    np.testing.assert_allclose(np.stack(steps), full, atol=0.2, rtol=0.05)


def test_jamba_engine_matches_hf_generate():
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    hf, cfg, params = tiny_jamba()
    rng = np.random.default_rng(3)
    prompts = [list(map(int, rng.integers(2, 250, size=n)))
               for n in (8, 17)]
    N_NEW = 10
    sched = SchedulerConfig(max_num_seqs=2, max_model_len=96,
                            prefill_chunk_size=32,
                            decode_batch_buckets=(2,),
                            prefill_token_buckets=(32,),
                            steps_per_decode_call=4)
    eng = LLMEngine(EngineConfig(model=cfg, cache=CacheConfig(page_size=32),
                                 scheduler=sched), params)
    rids = [eng.add_request(p, SamplingParams(temperature=0.0,
                                              max_tokens=N_NEW,
                                              ignore_eos=True))
            for p in prompts]
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    for rid, p in zip(rids, prompts):
        with torch.no_grad():
            want = hf.generate(torch.tensor([p]), max_new_tokens=N_NEW,
                               do_sample=False)[0, len(p):].tolist()
        assert outs[rid] == want, (rid, outs[rid], want)


def test_jamba_page_size_guard():
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine

    _, cfg, params = tiny_jamba()
    sched = SchedulerConfig(max_num_seqs=2, max_model_len=64,
                            prefill_chunk_size=16,
                            decode_batch_buckets=(2,),
                            prefill_token_buckets=(16,))
    with pytest.raises(ValueError, match="state-in-page"):
        LLMEngine(EngineConfig(model=cfg, cache=CacheConfig(page_size=2),
                               scheduler=sched), params)
