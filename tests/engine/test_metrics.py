"""Engine metrics tests (reference: tests/metrics/, spec_decode/test_metrics)."""

import numpy as np

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.engine.metrics import LoggingStatLogger, Stats
from qspec_tpu.models.llama import init_params
from qspec_tpu.sampling_params import SamplingParams
from qspec_tpu.spec_decode.metrics import SpecDecodeMetrics


def test_spec_metrics_counters():
    m = SpecDecodeMetrics()
    m.record(num_seqs=4, k=3, draft_accepted=6, emitted=10, wall_s=0.1)
    m.record(num_seqs=4, k=3, draft_accepted=12, emitted=16, wall_s=0.1)
    assert m.num_draft_tokens == 24
    assert m.draft_acceptance_rate == 18 / 24
    # emitted - accepted = seq-rounds = 8; efficiency = 26 / (24 + 8)
    assert abs(m.system_efficiency - 26 / 32) < 1e-9
    s = m.summary()
    assert s["num_emitted_tokens"] == 26


def test_logging_stat_logger_emits():
    lines = []
    logger = LoggingStatLogger(interval_s=0.0, log_fn=lines.append)
    logger.record(Stats(num_running=2, num_waiting=1, num_free_pages=10,
                        num_total_pages=20, generation_tokens=4))
    assert lines and "running 2" in lines[0] and "kv 50.0%" in lines[0]


def test_engine_stats_pipeline():
    mc = ModelConfig.tiny(quant="w4")
    params = init_params(mc, seed=0)
    cfg = EngineConfig(model=mc, cache=CacheConfig(page_size=16),
                       scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128,
                                                 prefill_chunk_size=32,
                                                 decode_batch_buckets=(2,),
                                                 prefill_token_buckets=(32,)),
                       speculative=SpeculativeConfig(num_speculative_tokens=2))
    eng = LLMEngine(cfg, params)
    lines = []
    eng.stat_loggers.append(LoggingStatLogger(interval_s=0.0, log_fn=lines.append))
    eng.add_request(list(np.arange(1, 10)), SamplingParams(temperature=0.0,
                                                           max_tokens=6))
    while eng.has_unfinished_requests():
        eng.step()
    assert lines
    assert any("accept" in ln for ln in lines)  # spec metrics surfaced


def test_prometheus_metrics():
    import prometheus_client
    registry = prometheus_client.CollectorRegistry()
    from qspec_tpu.engine.metrics import PrometheusMetrics
    pm = PrometheusMetrics("m", registry=registry)
    pm.record(Stats(num_running=3, num_waiting=2, num_free_pages=5,
                    num_total_pages=10, prompt_tokens=7, generation_tokens=4,
                    spec_draft_acceptance_rate=0.5, spec_system_efficiency=0.7))
    val = registry.get_sample_value("qspec_num_requests_running",
                                    {"model_name": "m"})
    assert val == 3
    assert registry.get_sample_value("qspec_generation_tokens_total",
                                     {"model_name": "m"}) == 4


def test_profile_steps(tmp_path):
    """profile_steps captures an xprof trace around N engine steps."""
    import os

    import numpy as np

    from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.models.llama import init_params
    from qspec_tpu.sampling_params import SamplingParams

    mc = ModelConfig.tiny(quant="w4")
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=64,
                                  prefill_chunk_size=32,
                                  decode_batch_buckets=(2,),
                                  prefill_token_buckets=(32,)))
    eng = LLMEngine(cfg, init_params(mc, seed=0))
    eng.add_request(list(range(1, 9)), SamplingParams(max_tokens=4,
                                                      temperature=0.0,
                                                      ignore_eos=True))
    out = eng.profile_steps(3, str(tmp_path / "trace"))
    assert out["steps"] >= 1 and out["wall_s"] > 0
    found = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path) for f in fs]
    assert found, "no trace files written"
