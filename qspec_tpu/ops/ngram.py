"""Device-side n-gram (prompt-lookup) proposal matching.

TPU-native redesign of the reference's host NGramWorker
(vllm/spec_decode/ngram_worker.py): instead of proposing on the host every
round (one device round-trip per round — ~tens of ms on a remote-tunnel
TPU), the token history lives in a device array and matching is a few
shifted vector compares inside the same executable as verification, so R
speculation rounds run per host call (see model_runner.ngram_rounds_step).

Semantics match NgramProposer.propose (spec_decode/ngram.py) and the native
matcher (csrc/host_ops.cpp): longest n in [nmin, nmax] whose tail n-gram
has an earlier occurrence; proposal = the k tokens following the MOST
RECENT such occurrence, truncated at the history end and padded with the
last in-range token.
"""

from __future__ import annotations

import jax.numpy as jnp


def ngram_match_device(history: jnp.ndarray, hist_len: jnp.ndarray, *,
                       k: int, nmin: int = 1, nmax: int = 4) -> jnp.ndarray:
    """history [B, H] int32 (tokens 0..hist_len-1 valid), hist_len [B]
    -> proposals [B, k] int32, -1-filled where no n-gram matches.

    For each static n in nmax..nmin: matched[b, w] says the window of n
    tokens starting at w equals the current tail n-gram, for window starts
    w <= hist_len-1-n (the tail itself, at w = hist_len-n, is excluded —
    same exclusion as the host matcher's scan over hist[:-1]).
    """
    B, H = history.shape
    k_ar = jnp.arange(k, dtype=jnp.int32)
    props = jnp.full((B, k), -1, jnp.int32)
    found = jnp.zeros((B,), bool)

    for n in range(nmax, nmin - 1, -1):
        if n + 1 > H:
            continue
        usable = hist_len >= n + 1  # need the tail plus >=1 earlier token
        tail_idx = jnp.maximum(hist_len[:, None] - n, 0) + jnp.arange(n)[None, :]
        tail = jnp.take_along_axis(history, jnp.minimum(tail_idx, H - 1), axis=1)

        W = H - n + 1  # candidate window starts
        matched = jnp.ones((B, W), bool)
        for j in range(n):
            matched &= history[:, j:j + W] == tail[:, j:j + 1]
        w_ar = jnp.arange(W, dtype=jnp.int32)[None, :]
        valid = w_ar <= (hist_len[:, None] - 1 - n)
        w_best = jnp.max(jnp.where(matched & valid, w_ar, -1), axis=1)  # [B]

        hit = usable & (w_best >= 0)
        start = w_best + n
        gather = jnp.minimum(start[:, None] + k_ar[None, :],
                             jnp.maximum(hist_len[:, None] - 1, 0))
        cand = jnp.take_along_axis(history, gather, axis=1).astype(jnp.int32)
        use = hit & ~found
        props = jnp.where(use[:, None], cand, props)
        found = found | hit
    return props
