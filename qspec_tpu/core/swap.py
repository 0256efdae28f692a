"""Host-RAM parking lot for swap-mode preemption.

TPU-native analogue of the reference's CacheEngine swap_in/swap_out tier
(vllm/worker/cache_engine.py, csrc/cache_kernels.cu swap_blocks): preempted
sequences' KV pages are gathered device->host (one jitted page gather, see
model_runner.gather_pages) and parked here; on resume they are scattered
back into freshly allocated device pages. Capacity is bounded by
CacheConfig.swap_space_gb — when the pool is full the scheduler falls back
to recompute preemption, exactly as the reference falls back when CPU
blocks run out (vllm/core/scheduler.py _preempt).
"""

from __future__ import annotations

from typing import Dict, Optional


class HostSwapPool:
    """seq_id -> parked KV payload, with a byte budget.

    A payload is whatever the engine hands in (host numpy page stacks for
    the target cache, plus the draft cache and int8 scales when present);
    the pool only accounts bytes by page count.
    """

    def __init__(self, max_bytes: int, page_bytes: int):
        self.max_bytes = int(max_bytes)
        self.page_bytes = max(1, int(page_bytes))
        self._entries: Dict[int, tuple] = {}   # seq_id -> (n_pages, payload)
        self.used_pages = 0
        # counters surfaced into engine stats
        self.num_swap_outs = 0
        self.num_swap_ins = 0

    @property
    def used_bytes(self) -> int:
        return self.used_pages * self.page_bytes

    def can_reserve(self, n_pages: int) -> bool:
        return (self.used_pages + n_pages) * self.page_bytes <= self.max_bytes

    def put(self, seq_id: int, n_pages: int, payload) -> None:
        assert seq_id not in self._entries, f"seq {seq_id} already swapped"
        self._entries[seq_id] = (n_pages, payload)
        self.used_pages += n_pages
        self.num_swap_outs += 1

    def has(self, seq_id: int) -> bool:
        return seq_id in self._entries

    def pop(self, seq_id: int):
        n_pages, payload = self._entries.pop(seq_id)
        self.used_pages -= n_pages
        self.num_swap_ins += 1
        return payload

    def discard(self, seq_id: int) -> None:
        if seq_id in self._entries:
            n_pages, _ = self._entries.pop(seq_id)
            self.used_pages -= n_pages
