"""Whisper audio enc-dec golden tests vs transformers
WhisperForConditionalGeneration (reference model file
vllm/model_executor/models/whisper.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.models.whisper import (build_cross_bank,  # noqa: E402
                                      convert_whisper, enc_out_len,
                                      whisper_decoder, whisper_encode)
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402

MEL, T_MEL = 16, 64                # max_source_positions = 32


def tiny_whisper():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=256, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=MEL,
        max_source_positions=T_MEL // 2, max_target_positions=64,
        decoder_start_token_id=2, pad_token_id=1, bos_token_id=0,
        eos_token_id=3, suppress_tokens=None, begin_suppress_tokens=None,
        forced_decoder_ids=None)
    torch.manual_seed(0)
    hf = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["WhisperForConditionalGeneration"]})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_whisper(sd, cfg)
    return hf, cfg, params


def test_whisper_encoder_vs_hf():
    hf, cfg, params = tiny_whisper()
    assert cfg.arch == "whisper" and cfg.whisper_num_mel == MEL
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, T_MEL, MEL)).astype(np.float32)
    got = np.asarray(
        whisper_encode(params, cfg, jnp.asarray(mel),
                       jnp.ones((1, T_MEL), bool)), np.float32)
    with torch.no_grad():
        want = hf.model.encoder(torch.tensor(
            mel.transpose(0, 2, 1))).last_hidden_state.numpy()
    assert got.shape == want.shape == (1, T_MEL // 2, 64)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_whisper_full_model_vs_hf():
    hf, cfg, params = tiny_whisper()
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, T_MEL, MEL)).astype(np.float32)
    Qd = 6
    dec_toks = np.concatenate(
        [[[cfg.decoder_start_token_id]],
         rng.integers(4, 250, size=(1, Qd - 1))], axis=1).astype(np.int32)

    T_enc = enc_out_len(T_MEL)
    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads,
                             cfg.cache_head_dim, num_pages=4, page_size=16)
    cache = kvc.allocate(kcfg)
    ccfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads,
                             cfg.cache_head_dim, num_pages=3,
                             page_size=cfg.whisper_max_source_positions)
    cross = kvc.allocate(ccfg).kv_pages

    enc_valid = jnp.ones((1, T_MEL), bool)
    enc_hidden = whisper_encode(params, cfg, jnp.asarray(mel), enc_valid)
    cross = build_cross_bank(params, cfg, enc_hidden, cross,
                             jnp.asarray([1], jnp.int32),
                             jnp.ones((1, T_enc), bool))
    logits, cache = whisper_decoder(
        params, cfg, jnp.asarray(dec_toks), jnp.arange(Qd)[None],
        jnp.asarray([Qd]), cache, kvc.PagedKVCache(kv_pages=cross),
        jnp.asarray([[1, 2]], jnp.int32), jnp.asarray([[1]], jnp.int32),
        jnp.asarray([T_enc]))
    got = np.asarray(logits[0], np.float32)

    with torch.no_grad():
        want = hf(input_features=torch.tensor(mel.transpose(0, 2, 1)),
                  decoder_input_ids=torch.tensor(
                      dec_toks.astype(np.int64))).logits[0].numpy()
    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.9, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.35, rtol=0.05)


def test_whisper_stepwise_equals_chunk():
    _, cfg, params = tiny_whisper()
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, T_MEL, MEL)).astype(np.float32)
    Qd = 5
    dec_toks = np.concatenate(
        [[[cfg.decoder_start_token_id]],
         rng.integers(4, 250, size=(1, Qd - 1))], axis=1).astype(np.int32)
    T_enc = enc_out_len(T_MEL)

    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads,
                             cfg.cache_head_dim, num_pages=4, page_size=16)
    ccfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads,
                             cfg.cache_head_dim, num_pages=3,
                             page_size=cfg.whisper_max_source_positions)
    enc_hidden = whisper_encode(params, cfg, jnp.asarray(mel),
                                jnp.ones((1, T_MEL), bool))
    cross = build_cross_bank(params, cfg, enc_hidden,
                             kvc.allocate(ccfg).kv_pages,
                             jnp.asarray([1], jnp.int32),
                             jnp.ones((1, T_enc), bool))
    cross = kvc.PagedKVCache(kv_pages=cross)
    tables = jnp.asarray([[1, 2]], jnp.int32)
    ctab = jnp.asarray([[1]], jnp.int32)

    cache = kvc.allocate(kcfg)
    full, _ = whisper_decoder(
        params, cfg, jnp.asarray(dec_toks), jnp.arange(Qd)[None],
        jnp.asarray([Qd]), cache, cross, tables, ctab, jnp.asarray([T_enc]))
    full = np.asarray(full[0], np.float32)

    cache = kvc.allocate(kcfg)
    steps = []
    for t in range(Qd):
        lg, cache = whisper_decoder(
            params, cfg, jnp.asarray(dec_toks[:, t:t + 1]),
            jnp.asarray([[t]]), jnp.asarray([t + 1]), cache, cross,
            tables, ctab, jnp.asarray([T_enc]))
        steps.append(np.asarray(lg[0, 0], np.float32))
    np.testing.assert_allclose(np.stack(steps), full, atol=0.15, rtol=0.05)


def test_whisper_engine_matches_hf_generate():
    """Engine serving (audio prefill + fused decoder steps, row-bank
    cross cache) == HF greedy generate on the same mel features."""
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    hf, cfg, params = tiny_whisper()
    rng = np.random.default_rng(3)
    N_NEW = 10
    sched = SchedulerConfig(max_num_seqs=2, max_model_len=64,
                            prefill_chunk_size=16,
                            decode_batch_buckets=(2,),
                            prefill_token_buckets=(16,),
                            steps_per_decode_call=4)
    eng = LLMEngine(EngineConfig(model=cfg, cache=CacheConfig(page_size=16),
                                 scheduler=sched), params)
    reqs = []
    for n_frames in (T_MEL, T_MEL - 20):
        mel = rng.standard_normal((n_frames, MEL)).astype(np.float32)
        prompt = [cfg.decoder_start_token_id] \
            + list(map(int, rng.integers(4, 250, size=2)))
        rid = eng.add_request(prompt,
                              SamplingParams(temperature=0.0,
                                             max_tokens=N_NEW,
                                             ignore_eos=True),
                              mm_audio=mel)
        reqs.append((rid, mel, prompt))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids

    for rid, mel, prompt in reqs:
        mel_pad = np.zeros((T_MEL, MEL), np.float32)
        mel_pad[:mel.shape[0]] = mel
        got = outs[rid]
        # teacher-forced margin check: random tiny weights put argmax
        # near-ties below the bf16-vs-fp32 noise floor, so exact generate
        # comparison is flaky — instead every emitted token must be HF's
        # argmax or within a small logit margin of it at that position
        seq = prompt + got
        with torch.no_grad():
            logits = hf(input_features=torch.tensor(mel_pad.T[None]),
                        decoder_input_ids=torch.tensor([seq])
                        ).logits[0].numpy()
        for j, tok in enumerate(got):
            row = logits[len(prompt) - 1 + j]
            assert row[tok] >= row.max() - 0.1, (rid, j, tok,
                                                 int(row.argmax()))


def test_whisper_requires_audio():
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    _, cfg, params = tiny_whisper()
    sched = SchedulerConfig(max_num_seqs=2, max_model_len=64,
                            prefill_chunk_size=16,
                            decode_batch_buckets=(2,),
                            prefill_token_buckets=(16,))
    eng = LLMEngine(EngineConfig(model=cfg, cache=CacheConfig(page_size=16),
                                 scheduler=sched), params)
    with pytest.raises(ValueError, match="mm_audio"):
        eng.add_request([2, 5], SamplingParams(max_tokens=4))
