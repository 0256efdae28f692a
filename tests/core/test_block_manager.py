"""Page allocator + prefix caching tests (mirrors tests/core/block/ in the
reference)."""

from qspec_tpu.core.block_manager import BlockManager
from qspec_tpu.core.sequence import Sequence
from qspec_tpu.sampling_params import SamplingParams


def mkseq(sid, prompt):
    return Sequence(seq_id=sid, prompt_token_ids=list(prompt),
                    sampling_params=SamplingParams())


def test_allocate_and_free():
    bm = BlockManager(num_pages=16, page_size=4)
    s = mkseq(0, range(10))
    assert bm.can_allocate(s)
    cached = bm.allocate_prompt(s)
    assert cached == 0
    assert len(s.page_ids) == 3  # ceil(10/4)
    free_before = bm.num_free_pages
    bm.free(s)
    assert bm.num_free_pages == free_before + 3


def test_append_slots_and_exhaustion():
    bm = BlockManager(num_pages=4, page_size=4, enable_prefix_caching=False)
    s = mkseq(0, range(4))
    bm.allocate_prompt(s)
    assert len(s.page_ids) == 1
    s.output_token_ids = list(range(4))  # now 8 tokens
    assert bm.append_slots(s, lookahead=1)
    assert len(s.page_ids) == 3
    assert bm.num_free_pages == 0
    s2 = mkseq(1, range(4))
    assert not bm.can_allocate(s2)
    s.output_token_ids = list(range(9))
    assert not bm.append_slots(s, lookahead=4)  # exhausted


def prefill(bm, seq):
    """Simulate a completed prefill: KV written for the whole prompt."""
    seq.num_computed_tokens = seq.prompt_len
    bm.mark_computed(seq)


def test_prefix_cache_reuse():
    bm = BlockManager(num_pages=32, page_size=4)
    prompt = list(range(100, 116))  # 4 full pages
    a = mkseq(0, prompt)
    assert bm.allocate_prompt(a) == 0
    prefill(bm, a)
    b = mkseq(1, prompt)
    cached = bm.allocate_prompt(b)
    # full-prompt hit capped so the last token is recomputed
    assert cached == 12
    assert b.page_ids[:3] == a.page_ids[:3]
    # shared pages survive one free
    bm.free(a)
    c = mkseq(2, prompt + [1, 2])
    assert bm.allocate_prompt(c) >= 12


def test_prefix_cache_divergent_tail():
    bm = BlockManager(num_pages=32, page_size=4)
    a = mkseq(0, list(range(16)))
    bm.allocate_prompt(a)
    prefill(bm, a)
    b = mkseq(1, list(range(8)) + [99] * 8)
    cached = bm.allocate_prompt(b)
    assert cached == 8  # only the common 2 pages
    assert b.page_ids[:2] == a.page_ids[:2]
    assert b.page_ids[2] != a.page_ids[2]


def test_no_hit_on_unwritten_pages():
    """A page's content hash must not be served before its KV is computed:
    a concurrent same-prefix request mid-prefill of the first would attend
    over garbage (regression for the register-at-allocation bug)."""
    bm = BlockManager(num_pages=32, page_size=4)
    prompt = list(range(100, 116))
    a = mkseq(0, prompt)
    bm.allocate_prompt(a)           # allocated, but KV not yet written
    b = mkseq(1, prompt)
    assert bm.allocate_prompt(b) == 0   # no cache hit on unwritten pages
    assert not set(b.page_ids) & set(a.page_ids)
    # partial prefill publishes only the covered pages
    a.num_computed_tokens = 8        # 2 of 3 hashable pages written
    bm.mark_computed(a)
    c = mkseq(2, prompt)
    assert bm.allocate_prompt(c) == 8
    assert c.page_ids[:2] == a.page_ids[:2]


def test_eviction_recycles_cached_pages():
    bm = BlockManager(num_pages=5, page_size=4)  # 4 usable
    a = mkseq(0, list(range(16)))
    bm.allocate_prompt(a)
    prefill(bm, a)
    bm.free(a)  # pages now evictable but cached
    b = mkseq(1, list(range(200, 216)))
    bm.allocate_prompt(b)  # must evict a's pages
    assert len(b.page_ids) == 4
