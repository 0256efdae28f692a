"""Mamba family golden tests: our associative-scan forward + state-in-page
step path vs transformers MambaForCausalLM (reference model file
vllm/model_executor/models/mamba.py, CUDA scan csrc/mamba/)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.models.mamba import (convert_mamba,  # noqa: E402
                                    mamba_forward, state_page_geometry)
from qspec_tpu.models.registry import resolve  # noqa: E402


def tiny_mamba():
    hf_cfg = transformers.MambaConfig(
        vocab_size=256, hidden_size=64, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank="auto",
        use_conv_bias=True, use_bias=False)
    torch.manual_seed(0)
    hf = transformers.MambaForCausalLM(hf_cfg).eval()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["MambaForCausalLM"]})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_mamba(sd, cfg)
    return hf, cfg, params


def _pages(cfg, n_seqs):
    H, S, D = state_page_geometry(cfg)
    # page 0 = reserved null page, pages 1..n = per-seq state
    return jnp.zeros((cfg.num_layers, n_seqs + 1, 2, H, S, D), jnp.bfloat16)


def test_mamba_prefill_vs_hf():
    hf, cfg, params = tiny_mamba()
    assert cfg.arch == "mamba" and cfg.mamba_d_state == 8
    T = 16
    rng = np.random.default_rng(0)
    toks = rng.integers(2, 250, size=(1, T)).astype(np.int32)

    kv = _pages(cfg, 1)
    logits, kv = mamba_forward(
        params, cfg, jnp.asarray(toks), kv, jnp.asarray([1]),
        jnp.asarray([T]), jnp.asarray(np.arange(T)[None]))
    got = np.asarray(logits[0], np.float32)

    with torch.no_grad():
        want = hf(torch.tensor(toks.astype(np.int64))).logits[0].numpy()
    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.9, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.35, rtol=0.05)


def test_mamba_stepwise_equals_full():
    """Decoding one token at a time through the state pages must match the
    full-sequence forward (the recurrent-state analogue of the KV-cache
    consistency tests)."""
    _, cfg, params = tiny_mamba()
    T = 12
    rng = np.random.default_rng(1)
    toks = rng.integers(2, 250, size=(1, T)).astype(np.int32)

    kv = _pages(cfg, 1)
    full, _ = mamba_forward(
        params, cfg, jnp.asarray(toks), kv, jnp.asarray([1]),
        jnp.asarray([T]), jnp.asarray(np.arange(T)[None]))
    full = np.asarray(full[0], np.float32)

    kv = _pages(cfg, 1)
    step_logits = []
    for t in range(T):
        lg, kv = mamba_forward(
            params, cfg, jnp.asarray(toks[:, t:t + 1]), kv,
            jnp.asarray([1]), jnp.asarray([t + 1]),
            jnp.asarray([[t]]))
        step_logits.append(np.asarray(lg[0, 0], np.float32))
    step = np.stack(step_logits)
    np.testing.assert_allclose(step, full, atol=0.15, rtol=0.05)


def test_mamba_chunked_prefill_with_padding():
    """Chunked + end-padded prefill must not let padded positions advance
    the state."""
    _, cfg, params = tiny_mamba()
    T, C = 14, 8          # two chunks: 8 + 6 (padded to 8)
    rng = np.random.default_rng(2)
    toks = rng.integers(2, 250, size=(1, T)).astype(np.int32)

    kv = _pages(cfg, 1)
    full, _ = mamba_forward(
        params, cfg, jnp.asarray(toks), kv, jnp.asarray([1]),
        jnp.asarray([T]), jnp.asarray(np.arange(T)[None]))
    want_last = np.asarray(full[0, -1], np.float32)

    kv = _pages(cfg, 1)
    chunk1 = toks[:, :C]
    _, kv = mamba_forward(params, cfg, jnp.asarray(chunk1), kv,
                          jnp.asarray([1]), jnp.asarray([C]),
                          jnp.asarray(np.arange(C)[None]))
    chunk2 = np.zeros((1, C), np.int32)
    chunk2[0, :T - C] = toks[0, C:]
    lg, kv = mamba_forward(params, cfg, jnp.asarray(chunk2), kv,
                           jnp.asarray([1]), jnp.asarray([T]),
                           jnp.asarray((C + np.arange(C))[None]),
                           logits_indices=jnp.asarray([T - C - 1]))
    got_last = np.asarray(lg[0, 0], np.float32)
    np.testing.assert_allclose(got_last, want_last, atol=0.15, rtol=0.05)


def test_mamba_engine_matches_hf_generate():
    """Greedy engine serving (chunked prefill + fused multi-step decode,
    state-in-page) == HF greedy generate."""
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    hf, cfg, params = tiny_mamba()
    rng = np.random.default_rng(3)
    prompts = [list(map(int, rng.integers(2, 250, size=n)))
               for n in (9, 21, 14)]
    N_NEW = 12

    sched = SchedulerConfig(max_num_seqs=4, max_model_len=128,
                            prefill_chunk_size=16,
                            decode_batch_buckets=(4,),
                            prefill_token_buckets=(16,),
                            steps_per_decode_call=4)
    eng = LLMEngine(EngineConfig(model=cfg, cache=CacheConfig(page_size=16),
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


def test_mamba_spec_rejected():
    from qspec_tpu.config import (CacheConfig, EngineConfig,
                                  SchedulerConfig, SpeculativeConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine

    _, cfg, params = tiny_mamba()
    sched = SchedulerConfig(max_num_seqs=2, max_model_len=64,
                            prefill_chunk_size=16,
                            decode_batch_buckets=(2,),
                            prefill_token_buckets=(16,))
    with pytest.raises(ValueError, match="unsupported for"):
        LLMEngine(EngineConfig(model=cfg, cache=CacheConfig(page_size=16),
                               scheduler=sched,
                               speculative=SpeculativeConfig(
                                   num_speculative_tokens=2,
                                   method="ngram")), params)


def test_falcon_mamba_vs_hf():
    """FalconMamba = Mamba-1 + weightless RMS on (dt, B, C)."""
    hf_cfg = transformers.FalconMambaConfig(
        vocab_size=256, hidden_size=64, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank="auto",
        use_conv_bias=True, use_bias=False, mixer_rms_eps=1e-6)
    torch.manual_seed(1)
    hf = transformers.FalconMambaForCausalLM(hf_cfg).eval()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["FalconMambaForCausalLM"]})
    assert cfg.mamba_mixer_rms_eps == 1e-6
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_mamba(sd, cfg)

    T = 14
    rng = np.random.default_rng(5)
    toks = rng.integers(2, 250, size=(1, T)).astype(np.int32)
    kv = _pages(cfg, 1)
    logits, _ = mamba_forward(
        params, cfg, jnp.asarray(toks), kv, jnp.asarray([1]),
        jnp.asarray([T]), jnp.asarray(np.arange(T)[None]))
    got = np.asarray(logits[0], np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(toks.astype(np.int64))).logits[0].numpy()
    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.9, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.35, rtol=0.05)


# ---- Mamba2 (SSD) ------------------------------------------------------

def tiny_mamba2():
    hf_cfg = transformers.Mamba2Config(
        vocab_size=256, hidden_size=64, state_size=16, num_hidden_layers=2,
        conv_kernel=4, expand=2, num_heads=4, head_dim=32, n_groups=2,
        chunk_size=8, use_conv_bias=True, use_bias=False,
        time_step_limit=(0.0, 100.0))
    torch.manual_seed(0)
    hf = transformers.Mamba2ForCausalLM(hf_cfg).eval()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["Mamba2ForCausalLM"]})
    from qspec_tpu.models.mamba2 import convert_mamba2
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_mamba2(sd, cfg)
    return hf, cfg, params


def _pages2(cfg, n_seqs):
    from qspec_tpu.models.mamba2 import state_page_geometry2
    H, S, D = state_page_geometry2(cfg)
    return jnp.zeros((cfg.num_layers, n_seqs + 1, 2, H, S, D), jnp.bfloat16)


def test_mamba2_prefill_vs_hf():
    from qspec_tpu.models.mamba2 import mamba2_forward
    hf, cfg, params = tiny_mamba2()
    assert cfg.mamba_heads == 4 and cfg.mamba_n_groups == 2
    T = 16
    rng = np.random.default_rng(0)
    toks = rng.integers(2, 250, size=(1, T)).astype(np.int32)
    kv = _pages2(cfg, 1)
    logits, kv = mamba2_forward(
        params, cfg, jnp.asarray(toks), kv, jnp.asarray([1]),
        jnp.asarray([T]), jnp.asarray(np.arange(T)[None]))
    got = np.asarray(logits[0], np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(toks.astype(np.int64))).logits[0].numpy()
    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.9, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.35, rtol=0.05)


def test_mamba2_stepwise_equals_full():
    from qspec_tpu.models.mamba2 import mamba2_forward
    _, cfg, params = tiny_mamba2()
    T = 12
    rng = np.random.default_rng(1)
    toks = rng.integers(2, 250, size=(1, T)).astype(np.int32)
    kv = _pages2(cfg, 1)
    full, _ = mamba2_forward(
        params, cfg, jnp.asarray(toks), kv, jnp.asarray([1]),
        jnp.asarray([T]), jnp.asarray(np.arange(T)[None]))
    full = np.asarray(full[0], np.float32)
    kv = _pages2(cfg, 1)
    steps = []
    for t in range(T):
        lg, kv = mamba2_forward(
            params, cfg, jnp.asarray(toks[:, t:t + 1]), kv,
            jnp.asarray([1]), jnp.asarray([t + 1]), jnp.asarray([[t]]))
        steps.append(np.asarray(lg[0, 0], np.float32))
    np.testing.assert_allclose(np.stack(steps), full, atol=0.15, rtol=0.05)


def test_mamba2_engine_matches_hf_generate():
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    hf, cfg, params = tiny_mamba2()
    rng = np.random.default_rng(3)
    prompts = [list(map(int, rng.integers(2, 250, size=n)))
               for n in (9, 18)]
    N_NEW = 10
    sched = SchedulerConfig(max_num_seqs=2, max_model_len=96,
                            prefill_chunk_size=16,
                            decode_batch_buckets=(2,),
                            prefill_token_buckets=(16,),
                            steps_per_decode_call=4)
    eng = LLMEngine(EngineConfig(model=cfg, cache=CacheConfig(page_size=16),
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
        # HF stops at its default eos (2); ours runs ignore_eos —
        # compare the common prefix
        assert outs[rid][:len(want)] == want, (rid, outs[rid], want)
