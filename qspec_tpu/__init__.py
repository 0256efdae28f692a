"""qspec_tpu: TPU-native LLM inference engine with complementary-quantization
speculative decoding (QSpec).

Public API mirrors the reference vLLM surface (vllm/__init__.py): `LLM`,
`SamplingParams`, `EngineArgs`, `LLMEngine`, `AsyncLLMEngine`,
`RequestOutput`.
"""

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ParallelConfig, SchedulerConfig, SpeculativeConfig)
from qspec_tpu.sampling_params import SamplingParams

__version__ = "0.1.0"

__all__ = [
    "LLM", "LLMEngine", "AsyncLLMEngine", "EngineArgs", "RequestOutput",
    "SamplingParams", "ModelConfig", "CacheConfig", "SchedulerConfig",
    "ParallelConfig", "SpeculativeConfig", "EngineConfig",
]


def __getattr__(name):
    # heavyweight imports (jax) stay lazy so `import qspec_tpu` is cheap
    if name == "LLM":
        from qspec_tpu.entrypoints.llm import LLM
        return LLM
    if name == "LLMEngine":
        from qspec_tpu.engine.llm_engine import LLMEngine
        return LLMEngine
    if name == "RequestOutput":
        from qspec_tpu.engine.llm_engine import RequestOutput
        return RequestOutput
    if name == "AsyncLLMEngine":
        from qspec_tpu.engine.async_engine import AsyncLLMEngine
        return AsyncLLMEngine
    if name == "EngineArgs":
        from qspec_tpu.engine.arg_utils import EngineArgs
        return EngineArgs
    raise AttributeError(name)
