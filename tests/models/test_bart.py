"""BART encoder-decoder golden tests vs transformers
BartForConditionalGeneration (reference model file
vllm/model_executor/models/bart.py + enc_dec_model_runner.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.models.bart import (build_cross_kv,  # noqa: E402
                                   convert_bart, decoder_forward,
                                   encoder_forward)
from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402


def tiny_bart():
    hf_cfg = transformers.BartConfig(
        vocab_size=256, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_position_embeddings=128, scale_embedding=False,
        activation_function="gelu", decoder_start_token_id=2,
        bos_token_id=0, eos_token_id=2, pad_token_id=1,
        forced_bos_token_id=None, forced_eos_token_id=None)
    torch.manual_seed(0)
    hf = transformers.BartForConditionalGeneration(hf_cfg).eval()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["BartForConditionalGeneration"]})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_bart(sd, cfg)
    return hf, cfg, params


def _caches(cfg, n_pages=8, page_size=32):
    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads,
                             cfg.cache_head_dim, num_pages=n_pages,
                             page_size=page_size)
    return kvc.allocate(kcfg), kvc.allocate(kcfg).kv_pages


def test_bart_encoder_vs_hf():
    hf, cfg, params = tiny_bart()
    assert cfg.arch == "bart" and cfg.encoder_layers == 2
    T = 10
    rng = np.random.default_rng(0)
    toks = rng.integers(3, 250, size=(1, T)).astype(np.int32)
    got = np.asarray(
        encoder_forward(params, cfg, jnp.asarray(toks),
                        jnp.ones((1, T), bool)), np.float32)
    with torch.no_grad():
        want = hf.model.encoder(
            torch.tensor(toks.astype(np.int64))).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_bart_full_model_vs_hf():
    """Encoder -> cross-KV pages -> multi-token decoder chunk == HF."""
    hf, cfg, params = tiny_bart()
    T, Qd = 10, 6
    rng = np.random.default_rng(1)
    enc_toks = rng.integers(3, 250, size=(1, T)).astype(np.int32)
    dec_toks = np.concatenate(
        [[[cfg.decoder_start_token_id]],
         rng.integers(3, 250, size=(1, Qd - 1))], axis=1).astype(np.int32)

    cache, cross = _caches(cfg)
    tables = jnp.asarray([[1, 2]], jnp.int32)
    enc_valid = jnp.ones((1, T), bool)
    enc_pos = jnp.arange(T)[None]
    enc_hidden = encoder_forward(params, cfg, jnp.asarray(enc_toks),
                                 enc_valid)
    cross = build_cross_kv(params, cfg, enc_hidden, cross, tables,
                           enc_valid, enc_pos)
    logits, cache = decoder_forward(
        params, cfg, jnp.asarray(dec_toks), jnp.arange(Qd)[None],
        jnp.asarray([Qd]), cache, cross, tables, jnp.asarray([T]))
    got = np.asarray(logits[0], np.float32)

    with torch.no_grad():
        want = hf(input_ids=torch.tensor(enc_toks.astype(np.int64)),
                  decoder_input_ids=torch.tensor(
                      dec_toks.astype(np.int64))).logits[0].numpy()
    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.9, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.35, rtol=0.05)


def test_bart_stepwise_equals_chunk():
    """One-token-at-a-time decoding through the paged self-KV must match
    the multi-token decoder chunk."""
    _, cfg, params = tiny_bart()
    T, Qd = 8, 5
    rng = np.random.default_rng(2)
    enc_toks = rng.integers(3, 250, size=(1, T)).astype(np.int32)
    dec_toks = np.concatenate(
        [[[cfg.decoder_start_token_id]],
         rng.integers(3, 250, size=(1, Qd - 1))], axis=1).astype(np.int32)
    tables = jnp.asarray([[1, 2]], jnp.int32)
    enc_valid = jnp.ones((1, T), bool)
    enc_hidden = encoder_forward(params, cfg, jnp.asarray(enc_toks),
                                 enc_valid)

    cache, cross = _caches(cfg)
    cross = build_cross_kv(params, cfg, enc_hidden, cross, tables,
                           enc_valid, jnp.arange(T)[None])
    full, _ = decoder_forward(
        params, cfg, jnp.asarray(dec_toks), jnp.arange(Qd)[None],
        jnp.asarray([Qd]), cache, cross, tables, jnp.asarray([T]))
    full = np.asarray(full[0], np.float32)

    cache, _ = _caches(cfg)
    steps = []
    for t in range(Qd):
        lg, cache = decoder_forward(
            params, cfg, jnp.asarray(dec_toks[:, t:t + 1]),
            jnp.asarray([[t]]), jnp.asarray([t + 1]), cache, cross,
            tables, jnp.asarray([T]))
        steps.append(np.asarray(lg[0, 0], np.float32))
    np.testing.assert_allclose(np.stack(steps), full, atol=0.15, rtol=0.05)


def test_bart_engine_matches_hf_generate():
    """Greedy engine serving (encoder prefill + fused decoder steps) ==
    HF greedy generate."""
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    hf, cfg, params = tiny_bart()
    rng = np.random.default_rng(3)
    prompts = [list(map(int, rng.integers(3, 250, size=n)))
               for n in (7, 15, 11)]
    N_NEW = 10

    sched = SchedulerConfig(max_num_seqs=4, max_model_len=96,
                            prefill_chunk_size=32,
                            decode_batch_buckets=(4,),
                            prefill_token_buckets=(32,),
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
            want = hf.generate(
                torch.tensor([p]), max_new_tokens=N_NEW, do_sample=False,
                num_beams=1, early_stopping=False,
                decoder_start_token_id=cfg.decoder_start_token_id,
            )[0].tolist()
        # HF puts decoder_start first; forced/eos semantics are disabled
        want = want[1:1 + N_NEW]
        got = outs[rid][:len(want)]
        assert got == want, (rid, got, want)


def test_bart_single_chunk_guard():
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    _, cfg, params = tiny_bart()
    sched = SchedulerConfig(max_num_seqs=2, max_model_len=96,
                            prefill_chunk_size=16,
                            decode_batch_buckets=(2,),
                            prefill_token_buckets=(16,))
    eng = LLMEngine(EngineConfig(model=cfg, cache=CacheConfig(page_size=16),
                                 scheduler=sched), params)
    with pytest.raises(ValueError, match="single-chunk"):
        eng.add_request(list(range(3, 30)), SamplingParams(max_tokens=4))
