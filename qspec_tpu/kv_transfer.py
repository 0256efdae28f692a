"""KV transfer / disaggregated prefill (reference: vllm/distributed/
kv_transfer/ — prefill instances ship computed KV + the first sampled token
to decode instances).

TPU-native shape of the idea: the paged cache already stores one sequence's
KV as whole pages, so a handoff is (prompt, first token, the seq's pages
gathered to host). Between co-located engines the arrays move as numpy;
across hosts the same struct would ride the DCN (the pages are exactly the
bytes a jax.device_put to the remote mesh needs — no re-layout).

Protocol:
    prefill engine:  rid = eng_p.prefill_for_transfer(prompt)
                     ... step() until finished ...
                     handoff = eng_p.extract_kv(rid)
    decode engine:   rid = eng_d.inject_kv(handoff, sampling_params)
                     ... step() as usual — decode continues from token 1.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class KVHandoff:
    prompt_token_ids: List[int]
    first_token: int
    first_logprob: float
    page_size: int
    kv_dtype: str                       # CacheConfig.kv_cache_dtype string
    pages: np.ndarray                   # [L, n_pages, 2, Hkv, S, D]
    scales: Optional[np.ndarray] = None  # [L, n_pages, 2, Hkv, S] (int8)

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_token_ids) + 1
