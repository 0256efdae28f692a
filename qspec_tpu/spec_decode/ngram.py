"""N-gram (prompt-lookup) proposer.

TPU-native analogue of the reference's NGramWorker
(vllm/spec_decode/ngram_worker.py): propose the k tokens that followed the
most recent occurrence of the current tail n-gram in the sequence's history.
Proposals are deterministic, so verification treats the draft distribution
as one-hot (built on device; see model_runner.verify_step_onehot) and
rejection sampling stays lossless.

The matcher itself is pure host CPU (token lists live host-side anyway);
scanning happens over at most the last `max_history` tokens.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class NgramProposer:
    def __init__(self, prompt_lookup_min: int = 1, prompt_lookup_max: int = 4,
                 max_history: int = 4096):
        assert prompt_lookup_min >= 1 and prompt_lookup_max >= prompt_lookup_min
        self.nmin = prompt_lookup_min
        self.nmax = prompt_lookup_max
        self.max_history = max_history

    def propose(self, token_ids: List[int], k: int) -> Optional[np.ndarray]:
        """Return k proposed tokens or None when no n-gram match exists."""
        from qspec_tpu import _native
        if _native.AVAILABLE:
            out = _native.ngram_propose(token_ids[-self.max_history:],
                                        self.nmin, self.nmax, k)
            return None if out is None else np.asarray(out, np.int32)
        hist = np.asarray(token_ids[-self.max_history:], dtype=np.int32)
        L = len(hist)
        for n in range(min(self.nmax, L - 1), self.nmin - 1, -1):
            tail = hist[L - n:]
            # most recent earlier occurrence of the tail n-gram
            windows = np.lib.stride_tricks.sliding_window_view(hist[:-1], n)
            matches = np.nonzero((windows == tail).all(axis=1))[0]
            if len(matches) == 0:
                continue
            start = matches[-1] + n
            cont = hist[start:start + k]
            if len(cont) == 0:
                continue
            if len(cont) < k:
                cont = np.concatenate([cont, np.full(k - len(cont), cont[-1],
                                                     np.int32)])
            return cont.astype(np.int32)
        return None

    def propose_batch(self, seqs, k: int) -> np.ndarray:
        """[B, k] proposals; sequences with no match get -1 (the rejection
        sampler always rejects -1 slots)."""
        out = np.full((len(seqs), k), -1, np.int32)
        for i, s in enumerate(seqs):
            p = self.propose(s.token_ids, k)
            if p is not None:
                out[i] = p
        return out
