"""BERT-family embedding model golden tests vs transformers BertModel
(reference: vllm/model_executor/models/bert.py BertEmbeddingModel)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.models.bert import (bert_forward, bert_pool,  # noqa: E402
                                   convert_bert)
from qspec_tpu.models.registry import resolve  # noqa: E402


def tiny_bert():
    hf_cfg = transformers.BertConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", layer_norm_eps=1e-12)
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg).eval()
    cfg = resolve({**hf_cfg.to_dict(), "architectures": ["BertModel"]})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_bert(sd, cfg)
    return hf, cfg, params


def test_bert_hidden_vs_hf():
    hf, cfg, params = tiny_bert()
    T = 12
    rng = np.random.default_rng(0)
    toks = rng.integers(2, 250, size=(1, T)).astype(np.int32)
    got = np.asarray(bert_forward(params, cfg, jnp.asarray(toks),
                                  jnp.ones((1, T), bool)), np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(toks.astype(np.int64))
                  ).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_bert_padding_mask():
    """Padded positions must not leak into attention or mean pooling."""
    _, cfg, params = tiny_bert()
    rng = np.random.default_rng(1)
    toks = rng.integers(2, 250, size=(1, 8)).astype(np.int32)
    h1 = bert_forward(params, cfg, jnp.asarray(toks),
                      jnp.ones((1, 8), bool))
    padded = np.concatenate([toks, rng.integers(2, 250, size=(1, 4))],
                            axis=1).astype(np.int32)
    valid = np.concatenate([np.ones((1, 8), bool), np.zeros((1, 4), bool)],
                           axis=1)
    h2 = bert_forward(params, cfg, jnp.asarray(padded), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(h1[0], np.float32),
                               np.asarray(h2[0, :8], np.float32),
                               atol=2e-2, rtol=2e-2)
    m1 = bert_pool(h1, jnp.ones((1, 8), bool), "mean")
    m2 = bert_pool(h2, jnp.asarray(valid), "mean")
    np.testing.assert_allclose(np.asarray(m1, np.float32),
                               np.asarray(m2, np.float32), atol=2e-2,
                               rtol=2e-2)


def test_bert_engine_embed():
    """task='embed' requests finish at prefill with pooled vectors;
    generate is rejected."""
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    hf, cfg, params = tiny_bert()
    sched = SchedulerConfig(max_num_seqs=4, max_model_len=64,
                            prefill_chunk_size=32,
                            decode_batch_buckets=(4,),
                            prefill_token_buckets=(32,))
    eng = LLMEngine(EngineConfig(model=cfg, cache=CacheConfig(page_size=16),
                                 scheduler=sched), params)
    rng = np.random.default_rng(2)
    prompts = [list(map(int, rng.integers(2, 250, size=n)))
               for n in (6, 11, 9)]
    rids = [eng.add_request(p, SamplingParams(max_tokens=1), task="embed")
            for p in prompts]
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.embedding
    for rid, p in zip(rids, prompts):
        with torch.no_grad():
            want = hf(torch.tensor([p])).last_hidden_state[0, 0].numpy()
        np.testing.assert_allclose(np.asarray(outs[rid], np.float32), want,
                                   atol=0.05, rtol=0.05)

    with pytest.raises(ValueError, match="embed"):
        eng.add_request(prompts[0], SamplingParams(max_tokens=4))
