"""MQ engine tests (reference: tests/mq_llm_engine/): happy path, abort,
engine-death propagation over real ZMQ + process boundary."""

import time

import pytest

zmq = pytest.importorskip("zmq")

from qspec_tpu.engine.multiprocessing import (MQEngineDeadError,  # noqa: E402
                                              MQLLMEngineClient, start_mq_engine)
from qspec_tpu.sampling_params import SamplingParams  # noqa: E402


def _tiny_engine():
    # runs in the child process (spawn): force CPU before jax init
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.models.llama import init_params
    mc = ModelConfig.tiny(quant="w4")
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                       scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128,
                                                 prefill_chunk_size=32,
                                                 decode_batch_buckets=(2,),
                                                 prefill_token_buckets=(32,)))
    return LLMEngine(cfg, init_params(mc, seed=0))


def _broken_engine():
    raise RuntimeError("boom: engine failed to build")


def test_mq_generate_roundtrip():
    client, proc = start_mq_engine(_tiny_engine)
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if client.check_health(timeout_ms=2000):
                break
            time.sleep(0.5)
        outs = list(client.generate([5, 6, 7, 8],
                                    SamplingParams(temperature=0.0, max_tokens=6),
                                    timeout_s=120))
        assert outs[-1].finished
        assert len(outs[-1].output_token_ids) == 6
    finally:
        client.shutdown_engine()
        proc.join(timeout=10)
        client.close()
        if proc.is_alive():
            proc.kill()


def test_mq_engine_death_reported():
    client, proc = start_mq_engine(_broken_engine)
    try:
        with pytest.raises(MQEngineDeadError):
            deadline = time.monotonic() + 30
            while time.monotonic() < deadline:
                client.check_health(timeout_ms=1000)
                time.sleep(0.2)
            raise AssertionError("engine death never reported")
        assert "boom" in (client._dead_reason or "")
    finally:
        proc.kill()
        client.close()


def test_mq_embed_task():
    """task="embed" rides the MQ protocol: the reply carries the pooled
    embedding instead of generated tokens."""
    client, proc = start_mq_engine(_tiny_engine)
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if client.check_health(timeout_ms=2000):
                break
            time.sleep(0.5)
        outs = list(client.generate(list(range(1, 9)),
                                    SamplingParams(max_tokens=1),
                                    task="embed"))
        final = outs[-1]
        assert final.finished and final.embedding is not None
        assert len(final.embedding) > 0 and not final.output_token_ids
    finally:
        client.shutdown_engine()
        client.close()
        proc.join(timeout=30)
