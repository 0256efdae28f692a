"""Incremental detokenizer (reference detokenize_incrementally,
vllm/transformers_utils/detokenizer.py): streamed text must equal the full
decode, never emit U+FFFD for multi-byte sequences split across tokens, and
decode only O(window) tokens per update."""

import numpy as np

from qspec_tpu.detokenizer import DetokState, detokenize_incrementally


class ByteTokenizer:
    """Each token id maps to one UTF-8 byte — the worst case for naive
    per-delta decoding (every multi-byte char splits across tokens)."""

    calls = []  # window lengths of each decode call

    def decode(self, ids):
        ByteTokenizer.calls.append(len(ids))
        return bytes(int(i) % 256 for i in ids).decode("utf-8",
                                                       errors="replace")


def test_multibyte_across_updates():
    text = "héllo € wörld 你好"
    ids = list(text.encode("utf-8"))
    tok = ByteTokenizer()
    st = DetokState()
    emitted = ""
    rng = np.random.default_rng(0)
    i = 0
    while i < len(ids):
        step = int(rng.integers(1, 4))
        i = min(len(ids), i + step)
        full = detokenize_incrementally(tok, ids[:i], st)
        delta = full[len(emitted):]
        assert "�" not in delta
        emitted = full
    assert emitted == text


def test_window_stays_bounded():
    # decode cost per update must not grow with the sequence length
    ids = list(("abcdefgh" * 200).encode("utf-8"))
    tok = ByteTokenizer()
    st = DetokState()
    ByteTokenizer.calls = []
    for i in range(1, len(ids) + 1):
        detokenize_incrementally(tok, ids[:i], st)
    assert max(ByteTokenizer.calls) < 16, \
        "incremental decode re-read a long window"


def test_stop_string_scan_is_incremental():
    """Engine stop-string path: correctness with stops landing mid-stream."""
    from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.models.llama import init_params
    from qspec_tpu.sampling_params import SamplingParams

    class LetterTok:
        def decode(self, ids):
            return "".join(chr(ord("a") + t % 26) for t in ids)

    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16, num_pages=96),
                       scheduler=SchedulerConfig(
                           max_num_seqs=2, max_model_len=256,
                           prefill_chunk_size=64, decode_batch_buckets=(2,),
                           prefill_token_buckets=(64,)))
    tok = LetterTok()
    eng = LLMEngine(cfg, params, tokenizer=tok)
    r = np.random.default_rng(3)
    prompt = list(map(int, r.integers(1, 500, size=12)))
    rid = eng.add_request(prompt, SamplingParams(temperature=0.0,
                                                 max_tokens=40,
                                                 ignore_eos=True))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    free_text = tok.decode(outs[rid].output_token_ids)
    stop = free_text[5:8]  # a substring the greedy run provably produces

    eng2 = LLMEngine(cfg, params, tokenizer=tok)
    rid2 = eng2.add_request(prompt, SamplingParams(
        temperature=0.0, max_tokens=40, ignore_eos=True, stop=[stop]))
    outs2 = {}
    while eng2.has_unfinished_requests():
        for o in eng2.step():
            if o.finished:
                outs2[o.request_id] = o
    assert outs2[rid2].finish_reason == "stop"
    assert stop not in outs2[rid2].text
    assert free_text.startswith(outs2[rid2].text)
