"""Embedding (pooling) task through the engine (reference pooling-model
path: vllm/model_executor/layers/pooler.py LAST pooling + LLM.encode)."""

import numpy as np

from qspec_tpu.config import ModelConfig
from qspec_tpu.entrypoints.llm import LLM
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams


def _llm():
    cfg = ModelConfig.tiny(quant="w4")
    return LLM(model="tiny", params=init_params(cfg, seed=0),
               max_model_len=128, max_num_seqs=4)


def test_embed_deterministic_and_distinct():
    llm = _llm()
    p1 = list(range(1, 20))
    p2 = list(range(40, 70))
    e = llm.embed([p1, p1, p2])
    assert e[0].shape == e[2].shape and e[0].dtype == np.float32
    np.testing.assert_allclose(e[0], e[1], atol=1e-5)
    assert np.abs(e[0] - e[2]).max() > 1e-3


def test_embed_interleaved_with_generate():
    """Embed and generate requests coexist in the same engine."""
    llm = _llm()
    eng = llm.llm_engine
    g = eng.add_request(list(range(1, 12)),
                        SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True))
    e = eng.add_request(list(range(1, 12)), SamplingParams(max_tokens=1),
                        task="embed")
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    assert len(outs[g].output_token_ids) == 4
    assert outs[e].embedding is not None and outs[e].embedding.size > 0
    # the pooled vector equals the single-task result for the same prompt
    solo = _llm().embed([list(range(1, 12))])[0]
    np.testing.assert_allclose(outs[e].embedding, solo, atol=1e-4)
