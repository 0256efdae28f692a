"""DP router over MQ engine replicas: concurrent dispatch, balance,
failover (reference pattern: N replicas behind a router,
docs/source/serving/distributed_serving.md; death semantics from
tests/mq_llm_engine/)."""

import threading
import time

import pytest

zmq = pytest.importorskip("zmq")

from qspec_tpu.engine.dp_router import start_dp_router  # noqa: E402
from qspec_tpu.engine.multiprocessing import MQEngineDeadError  # noqa: E402
from qspec_tpu.sampling_params import SamplingParams  # noqa: E402


def _tiny_engine():
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


def _wait_healthy(router, n, timeout=180):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if sum(router.check_health().values()) >= n:
            return True
        time.sleep(0.5)
    return False


def test_dp_router_concurrent_and_balanced():
    router, procs = start_dp_router(_tiny_engine, num_replicas=2)
    try:
        assert _wait_healthy(router, 2)
        results = {}
        used = set()

        def run(i):
            outs = list(router.generate(
                [5 + i, 6, 7], SamplingParams(temperature=0.0, max_tokens=5),
                timeout_s=180))
            results[i] = outs[-1]

        # pre-pick assertion hook: watch replica outstanding counts
        threads = [threading.Thread(target=run, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
            time.sleep(0.05)
            used |= {r.name for r in router.replicas if r.outstanding > 0}
        for t in threads:
            t.join(timeout=200)
        assert len(results) == 6
        assert all(o.finished and len(o.output_token_ids) == 5
                   for o in results.values())
        assert len(used) == 2, f"load not spread: {used}"
    finally:
        router.shutdown()
        for p in procs:
            p.join(timeout=10)
            if p.is_alive():
                p.kill()


def test_dp_router_failover():
    router, procs = start_dp_router(_tiny_engine, num_replicas=2)
    try:
        assert _wait_healthy(router, 2)
        # kill replica 0's process outright; router must detect and reroute
        procs[0].kill()
        procs[0].join(timeout=10)
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and not any(
                r.suspect or r.dead_reason for r in router.replicas):
            router.check_health()
            time.sleep(0.2)
        assert any(r.suspect or r.dead_reason for r in router.replicas)
        # either health probe flagged it or it stays unreachable; each new
        # request must land on a live replica and complete
        for _ in range(3):
            outs = list(router.generate(
                [9, 8, 7], SamplingParams(temperature=0.0, max_tokens=4),
                timeout_s=120))
            assert outs[-1].finished
    finally:
        router.shutdown()
        for p in procs:
            p.join(timeout=10)
            if p.is_alive():
                p.kill()
