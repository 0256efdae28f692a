"""One process of the multi-process engine run for test_multihost.py.

Usage: python mh_worker.py <process_id> <num_processes> <coordinator_port>

Every process builds the identical tiny engine over the global mesh
(TP spanning all processes' devices); process 0 drives requests, the rest
mirror via MultiHostEngine.serve(). Prints one JSON line with the outputs.
"""

import json
import os
import sys

import numpy as np


def tiny_cfg():
    from qspec_tpu.config import ModelConfig

    return ModelConfig.tiny(quant="w4", num_layers=2, num_heads=8,
                            num_kv_heads=8, head_dim=64, hidden_size=512,
                            intermediate_size=896)


def make_prompts():
    rng = np.random.default_rng(7)
    return [list(map(int, rng.integers(1, 500, size=n))) for n in (12, 9, 15)]


def build_engine(mesh):
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.models.llama import init_params

    cfg = tiny_cfg()
    tp = int(np.prod(mesh.devices.shape))
    params = init_params(cfg, seed=0, tp_size=tp)
    ec = EngineConfig(
        model=cfg, cache=CacheConfig(page_size=16, num_pages=64),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=64,
                                  prefill_token_buckets=(32,),
                                  decode_batch_buckets=(4,)))
    # num_pages explicit: multi-host engines must not derive pool size from
    # local HBM stats (processes could disagree)
    return LLMEngine(ec, params, num_pages=64, mesh=mesh)


def main():
    # env must be set before the first jax backend init (the axon
    # sitecustomize pre-imports jax, so also force the config override)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from qspec_tpu.parallel import multihost as mh
    from qspec_tpu.sampling_params import SamplingParams

    mh.initialize(f"127.0.0.1:{port}", nproc, pid)
    mesh = mh.global_mesh(("data", "model"), (1, len(jax.devices())))

    eng = mh.MultiHostEngine(build_engine(mesh))
    if not eng.is_head:
        eng.serve()
        return

    for p in make_prompts():
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=8,
                                          ignore_eos=True))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    eng.shutdown()
    print(json.dumps({"outputs": {str(k): v for k, v in outs.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
