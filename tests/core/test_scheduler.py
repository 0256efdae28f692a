"""Scheduler tests (mirrors reference tests/core/test_scheduler.py patterns:
admission, chunked prefill, decode batching, preemption)."""

from qspec_tpu.config import SchedulerConfig
from qspec_tpu.core.block_manager import BlockManager
from qspec_tpu.core.scheduler import Scheduler
from qspec_tpu.core.sequence import Sequence, SequenceStatus
from qspec_tpu.sampling_params import SamplingParams


def mkseq(sid, n_prompt, max_tokens=8):
    return Sequence(seq_id=sid, prompt_token_ids=list(range(1, n_prompt + 1)),
                    sampling_params=SamplingParams(max_tokens=max_tokens))


def mksched(num_pages=64, page_size=4, **over):
    cfg = SchedulerConfig(max_num_seqs=over.pop("max_num_seqs", 4),
                          max_model_len=over.pop("max_model_len", 64),
                          prefill_chunk_size=over.pop("prefill_chunk_size", 8),
                          **over)
    bm = BlockManager(num_pages, page_size, enable_prefix_caching=False)
    return Scheduler(cfg, bm, lookahead=over.get("lookahead", 1)), bm


def test_prefill_then_decode():
    sched, _ = mksched()
    s = mkseq(0, 12)
    sched.add_seq(s)
    b1 = sched.schedule()
    assert b1.kind == "prefill" and b1.chunk.start == 0 and b1.chunk.end == 8
    s.num_computed_tokens = 8
    b2 = sched.schedule()
    assert b2.kind == "prefill" and b2.chunk.start == 8 and b2.chunk.end == 12
    s.num_computed_tokens = 12
    s.output_token_ids = [5]
    b3 = sched.schedule()
    assert b3.kind == "decode" and b3.seqs == [s]


def test_decode_batches_all_running():
    sched, _ = mksched()
    seqs = [mkseq(i, 4) for i in range(3)]
    for s in seqs:
        sched.add_seq(s)
    for _ in range(3):
        b = sched.schedule()
        assert b.kind == "prefill"
        b.chunk.seq.num_computed_tokens = b.chunk.end
        b.chunk.seq.output_token_ids = [1]
    b = sched.schedule()
    assert b.kind == "decode" and len(b.seqs) == 3


def test_admission_respects_max_num_seqs():
    sched, _ = mksched(max_num_seqs=2)
    for i in range(5):
        sched.add_seq(mkseq(i, 4))
    b = sched.schedule()
    assert len(sched.running) == 2 and len(sched.waiting) == 3


def test_prompt_too_long_rejected():
    sched, _ = mksched(max_model_len=16)
    s = mkseq(0, 100)
    sched.add_seq(s)
    b = sched.schedule()
    assert b.is_empty
    assert sched.rejected == [s]
    assert s.finish_reason == "prompt_too_long"


def test_preemption_on_page_exhaustion():
    # 7 usable pages, two seqs needing growth
    sched, bm = mksched(num_pages=8, page_size=4, max_num_seqs=2)
    a, b = mkseq(0, 8, max_tokens=32), mkseq(1, 8, max_tokens=32)
    sched.add_seq(a)
    sched.add_seq(b)
    for _ in range(2):
        batch = sched.schedule()
        batch.chunk.seq.num_computed_tokens = batch.chunk.end
        batch.chunk.seq.output_token_ids = [1]
    # grow both until pages run out
    for step in range(10):
        batch = sched.schedule()
        if batch.kind == "prefill":
            batch.chunk.seq.num_computed_tokens = batch.chunk.end
            batch.chunk.seq.output_token_ids = [1]
            continue
        if len(batch.seqs) < 2:
            break  # someone got preempted
        for s in batch.seqs:
            s.append_token(7)
            s.num_computed_tokens = s.num_tokens
    assert any(s.status == SequenceStatus.WAITING for s in (a, b)) or \
        len(sched.waiting) > 0


def test_finished_freed():
    sched, bm = mksched()
    s = mkseq(0, 4, max_tokens=1)
    sched.add_seq(s)
    b = sched.schedule()
    s.num_computed_tokens = 4
    s.append_token(3)
    s.status = SequenceStatus.FINISHED_LENGTH
    done = sched.free_finished()
    assert done == [s] and not sched.running
    assert s.page_ids == []
