"""Beam search over the engine (reference: vllm/beam_search.py +
LLM.beam_search, vllm/entrypoints/llm.py:507).

Like the reference's v1 design, beam search lives OUTSIDE the engine core:
each iteration asks the engine for one token with top-(2W) logprob dicts for
every live beam, then expands/prunes host-side. Prefix caching makes the
repeated prompt+beam prefills incremental (only the tail page of each beam
is recomputed), which is exactly the reference's stated strategy.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

from qspec_tpu.sampling_params import SamplingParams


@dataclasses.dataclass
class BeamSearchParams:
    beam_width: int = 4
    max_tokens: int = 16
    ignore_eos: bool = False
    length_penalty: float = 1.0   # GNMT-style: score = logp / len**alpha
    temperature: float = 0.0      # 0 = classic deterministic beam search


@dataclasses.dataclass
class BeamSearchSequence:
    tokens: List[int]             # generated tokens (prompt excluded)
    cum_logprob: float
    finished: bool = False

    def score(self, length_penalty: float) -> float:
        n = max(len(self.tokens), 1)
        return self.cum_logprob / (n ** length_penalty)


@dataclasses.dataclass
class BeamSearchOutput:
    sequences: List[BeamSearchSequence]  # best-first


def beam_search(engine, prompt_token_ids: List[List[int]],
                params: BeamSearchParams,
                eos_token_id: Optional[int] = None) -> List[BeamSearchOutput]:
    """Run beam search for each prompt; returns beam_width sequences per
    prompt, best-first by length-penalized cumulative logprob."""
    W = params.beam_width
    eos = eos_token_id if eos_token_id is not None else engine.eos_token_id
    sp = SamplingParams(temperature=params.temperature, max_tokens=1,
                        logprobs=2 * W, ignore_eos=True)

    states = [[BeamSearchSequence([], 0.0)] for _ in prompt_token_ids]
    completed: List[List[BeamSearchSequence]] = [[] for _ in prompt_token_ids]

    for _ in range(params.max_tokens):
        live = [(pi, b) for pi, beams in enumerate(states)
                for b in beams if not b.finished]
        if not live:
            break
        rids = {}
        for pi, b in live:
            rid = engine.add_request(prompt_token_ids[pi] + b.tokens, sp)
            rids[rid] = (pi, b)
        tops = {}
        while engine.has_unfinished_requests():
            for out in engine.step():
                if out.finished and out.request_id in rids:
                    top = (out.top_logprobs or [None])[0]
                    tops[out.request_id] = top or {}
        nxt: List[List[BeamSearchSequence]] = [[] for _ in prompt_token_ids]
        for rid, (pi, b) in rids.items():
            for tok, lp in tops.get(rid, {}).items():
                cand = BeamSearchSequence(b.tokens + [int(tok)],
                                          b.cum_logprob + float(lp))
                if (not params.ignore_eos and eos is not None
                        and int(tok) == eos):
                    cand.finished = True
                    completed[pi].append(cand)
                else:
                    nxt[pi].append(cand)
        for pi in range(len(prompt_token_ids)):
            nxt[pi].sort(key=lambda s: s.score(params.length_penalty),
                         reverse=True)
            states[pi] = nxt[pi][:W]
            # prune completed pools too (keep the best W)
            completed[pi].sort(key=lambda s: s.score(params.length_penalty),
                               reverse=True)
            completed[pi] = completed[pi][:W]

    outs = []
    for pi in range(len(prompt_token_ids)):
        pool = completed[pi] + states[pi]
        pool.sort(key=lambda s: s.score(params.length_penalty), reverse=True)
        outs.append(BeamSearchOutput(sequences=pool[:W]))
    return outs
