"""EngineArgs: flat CLI-style arguments -> composed EngineConfig.

TPU-native analogue of the reference's EngineArgs / AsyncEngineArgs
(vllm/engine/arg_utils.py) with the flags that matter here; names are kept
compatible with the reference's CLI where the concept carries over
(--num-speculative-tokens, --max-num-seqs, --enforce-eager has no meaning
under XLA and is accepted-but-ignored).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional

from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ParallelConfig, SchedulerConfig, SpeculativeConfig)


@dataclasses.dataclass
class EngineArgs:
    model: str = ""                      # HF dir / qspec checkpoint dir / preset name
    tokenizer: Optional[str] = None
    quantization: Optional[str] = "qspec"  # "qspec" | None (bf16)
    max_model_len: int = 4096
    max_num_seqs: int = 8
    max_num_batched_tokens: int = 2048
    block_size: int = 128
    kv_cache_dtype: str = "bfloat16"    # bfloat16|int8|fp8_e4m3|fp8_e5m2
    num_pages: Optional[int] = None      # None -> derive from free HBM
    gpu_memory_utilization: float = 0.9
    # vocab-projection dtype (ModelConfig.lm_head_quant)
    lm_head_quant: str = "auto"          # auto|bf16|int8|int4
    # reference --swap-space / --preemption-mode: swap parks preempted KV
    # in host RAM instead of recomputing it
    swap_space: float = 4.0              # GiB
    preemption_mode: str = "recompute"   # "recompute" | "swap"
    enable_chunked_prefill: bool = True
    prefill_chunk_size: int = 512
    enable_prefix_caching: bool = True
    # co-schedule running decodes with prefill chunks (admissions stop
    # stalling the running batch; core/scheduler.py mixed batches)
    mix_decode_with_prefill: bool = True
    # fused decode steps per host dispatch (reference multi-step runner)
    steps_per_decode_call: int = 1
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    num_speculative_tokens: Optional[int] = None
    speculative_draft_scheme: str = "w4a4"
    speculative_disable_by_batch_size: Optional[int] = None
    # "rejection_sampler" (lossless) | "typical_acceptance_sampler" (lossy)
    spec_acceptance_method: str = "rejection_sampler"
    # fused speculative rounds per host dispatch
    spec_rounds_per_step: int = 1
    # MagicDec-style sliding window on the shared-weights draft KV reads
    spec_draft_kv_window: Optional[int] = None
    # Medusa candidate tree: "default" for spec_decode/medusa_tree
    # .DEFAULT_TREE (depth-capped to num_speculative_tokens), or a literal
    # choices tuple like "((0,),(1,),(0,0))"; None = single top-1 chain
    spec_medusa_tree: Optional[str] = None
    # reference --speculative-model: "[ngram]" selects prompt-lookup
    # proposals; "[medusa]" selects trained Medusa heads (params must carry
    # a "medusa" subtree, spec_decode/medusa.load_medusa); a directory path
    # selects a separate draft checkpoint (loaded by the LLM entrypoint);
    # None = QSpec shared-weights drafting
    speculative_model: Optional[str] = None
    ngram_prompt_lookup_max: int = 4
    ngram_prompt_lookup_min: int = 1
    seed: int = 0
    enforce_eager: bool = False          # accepted for reference CLI compat; no-op on XLA
    trust_remote_code: bool = False      # idem

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        for f in dataclasses.fields(EngineArgs):
            name = "--" + f.name.replace("_", "-")
            if f.type == "bool" or isinstance(f.default, bool):
                # BooleanOptionalAction: default-True flags get a working
                # --no-* form (store_true could never turn them off)
                parser.add_argument(name,
                                    action=argparse.BooleanOptionalAction,
                                    default=f.default)
            else:
                typ = int if isinstance(f.default, int) and f.default is not None else \
                    float if isinstance(f.default, float) else str
                parser.add_argument(name, type=typ, default=f.default)
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in vars(args).items() if k in names})

    def model_config(self) -> ModelConfig:
        presets = {
            "llama3-8b": ModelConfig.llama3_8b,
            "llama3-70b": ModelConfig.llama3_70b,
            "qwen2-7b": ModelConfig.qwen2_7b,
            "tiny": ModelConfig.tiny,
        }
        quant = "w4" if self.quantization in ("qspec", "w4", "int4") else "none"
        if self.model in presets:
            return presets[self.model](quant=quant)
        if self.model:
            from qspec_tpu.model_loader.loader import config_from_hf_dir
            cfg = config_from_hf_dir(self.model)
            return ModelConfig(**{**cfg.__dict__, "quant": quant})
        return ModelConfig.tiny(quant=quant)

    def create_engine_config(self) -> EngineConfig:
        spec = None
        if self.num_speculative_tokens:
            method = "qspec"
            if self.speculative_model and \
                    self.speculative_model.strip("[]").lower() in (
                        "ngram", "medusa", "eagle", "mlp_speculator"):
                method = self.speculative_model.strip("[]").lower()
            tree = None
            if self.spec_medusa_tree:
                if self.spec_medusa_tree.strip().lower() == "default":
                    from qspec_tpu.spec_decode.medusa_tree import DEFAULT_TREE
                    tree = tuple(p for p in DEFAULT_TREE
                                 if len(p) <= self.num_speculative_tokens)
                else:
                    import ast
                    tree = tuple(tuple(p) for p in
                                 ast.literal_eval(self.spec_medusa_tree))
            spec = SpeculativeConfig(
                num_speculative_tokens=self.num_speculative_tokens,
                draft_scheme=self.speculative_draft_scheme,
                disable_by_batch_size=self.speculative_disable_by_batch_size,
                method=method,
                acceptance_method=self.spec_acceptance_method,
                rounds_per_step=self.spec_rounds_per_step,
                draft_kv_window=self.spec_draft_kv_window,
                medusa_tree=tree,
                ngram_prompt_lookup_max=self.ngram_prompt_lookup_max,
                ngram_prompt_lookup_min=self.ngram_prompt_lookup_min)
        return EngineConfig(
            model=self.model_config(),
            cache=CacheConfig(page_size=self.block_size,
                              num_pages=self.num_pages,
                              kv_cache_dtype=self.kv_cache_dtype,
                              enable_prefix_caching=self.enable_prefix_caching,
                              gpu_memory_utilization=self.gpu_memory_utilization,
                              swap_space_gb=self.swap_space),
            scheduler=SchedulerConfig(
                max_num_seqs=self.max_num_seqs,
                max_num_batched_tokens=self.max_num_batched_tokens,
                max_model_len=self.max_model_len,
                enable_chunked_prefill=self.enable_chunked_prefill,
                prefill_chunk_size=self.prefill_chunk_size,
                mix_decode_with_prefill=self.mix_decode_with_prefill,
                steps_per_decode_call=self.steps_per_decode_call,
                preemption_mode=self.preemption_mode),
            parallel=ParallelConfig(
                tensor_parallel_size=self.tensor_parallel_size,
                data_parallel_size=self.data_parallel_size),
            speculative=spec,
        )
