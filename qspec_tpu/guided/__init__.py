"""Grammar-guided decoding: regex / JSON-schema -> token-level FSMs whose
transition tables live on device and advance inside the jitted decode and
speculative-verification loops (reference: vllm/model_executor/
guided_decoding/)."""

from qspec_tpu.guided.json_schema import schema_to_regex
from qspec_tpu.guided.regex_dfa import ByteDFA, compile_regex
from qspec_tpu.guided.tokenfsm import (GrammarCompiler, TokenFSM,
                                       build_token_fsm, hf_vocab_bytes)

__all__ = ["schema_to_regex", "ByteDFA", "compile_regex", "GrammarCompiler",
           "TokenFSM", "build_token_fsm", "hf_vocab_bytes"]
