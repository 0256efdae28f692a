"""LLMEngine: request lifecycle + continuous-batching event loop.

TPU-native analogue of the reference LLMEngine (vllm/engine/llm_engine.py:120
— add_request:638, step:1239, _process_model_outputs:975) with the
SpecDecodeWorker's speculative round (spec_decode_worker.py:757) folded into
`step` as the decode phase when speculation is configured. One engine serves
both modes: `speculative=None` gives plain W4A16 (or bf16) autoregressive
continuous batching; a SpeculativeConfig turns every decode step into a
draft(w4a4)+verify(w4a16) round over shared weights and per-phase caches.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from qspec_tpu.config import EngineConfig
from qspec_tpu.core.block_manager import BlockManager
from qspec_tpu.core.scheduler import ScheduledBatch, Scheduler
from qspec_tpu.core.sequence import Sequence, SequenceStatus
from qspec_tpu.engine.model_runner import (ModelRunner, make_sampling_tensors)
from qspec_tpu.sampling_params import SamplingParams
from qspec_tpu.spec_decode.metrics import SpecDecodeMetrics


@dataclass
class RequestOutput:
    request_id: int
    prompt_token_ids: List[int]
    output_token_ids: List[int]
    finished: bool
    finish_reason: Optional[str] = None
    text: str = ""
    logprobs: Optional[List[float]] = None
    # per-position {token_id: logprob} dicts when logprobs > 1 was requested
    top_logprobs: Optional[List[Optional[dict]]] = None
    metrics: dict = field(default_factory=dict)
    # pooled hidden-state vector for task="embed" requests
    embedding: Optional[object] = None


class LLMEngine:
    def __init__(self, config: EngineConfig, params, num_pages: Optional[int] = None,
                 eos_token_id: Optional[int] = None, tokenizer=None, mesh=None,
                 grammar_vocab=None, draft_params=None):
        from qspec_tpu.utils import enable_persistent_compile_cache
        enable_persistent_compile_cache()
        from qspec_tpu.plugins import load_general_plugins
        load_general_plugins()   # entry-point extensions (model archs etc.)
        self.config = config
        self.eos_token_id = eos_token_id
        self.tokenizer = tokenizer
        # token-id -> emitted bytes, for grammar-guided decoding; derived
        # lazily from the tokenizer if not provided
        self._grammar_vocab = grammar_vocab
        self._grammar_compiler = None
        self.spec = config.speculative
        lookahead = ((self.spec.num_speculative_tokens + 1)
                     * self.spec.rounds_per_step) if self.spec \
            else config.scheduler.steps_per_decode_call
        if self.spec is not None and self.spec.medusa_tree is not None:
            # tree verify writes T node slots past the current position
            # every round while advancing at most D+1; the block tables
            # must address the extra (T - D) reach
            lookahead += len(self.spec.medusa_tree) + 1

        # "ngram"/"null" run the device-side fused proposer rounds (no draft
        # model, no draft cache); "null" is the bit-exact AR oracle mode.
        # "medusa" proposes from trained heads riding the verify pass's
        # hidden state — also draft-cache-free (spec_decode/medusa.py)
        self._ngram = (self.spec is not None
                       and self.spec.method in ("ngram", "null"))
        # "mlp_speculator" is the same serving shape as medusa (trained
        # net, proposals ride the verify hidden, no draft cache) with a
        # recurrent head chain (spec_decode/mlp_speculator.py)
        # "medusa_null" = medusa's same-executable AR oracle (nulled props)
        self._medusa = (self.spec is not None
                        and self.spec.method in ("medusa", "mlp_speculator",
                                                 "medusa_null"))
        # "eagle": one-layer draft net over (embed, hidden) features with
        # its OWN draft KV cache; its prompt pass is fused into prefill
        # (spec_decode/eagle.py)
        self._eagle = (self.spec is not None
                       and self.spec.method == "eagle")
        if num_pages is None:
            num_pages = self._derive_num_pages()
        self.runner = ModelRunner(config, params, num_pages,
                                  need_draft_cache=self.spec is not None
                                  and not (self._ngram or self._medusa),
                                  mesh=mesh, draft_params=draft_params)
        self._encdec = config.model.arch == "bart"
        self._whisper = config.model.arch == "whisper"
        if (self._encdec or self._whisper) and self.spec is not None:
            raise ValueError("speculative decoding is unsupported for "
                             "encoder-decoder models")
        if config.model.mrope_section is not None and self.spec is not None:
            raise ValueError("speculative decoding is unsupported for "
                             "M-RoPE (qwen2vl) models")
        prefix_caching = config.cache.enable_prefix_caching
        if self._encdec or self._whisper:
            # cross-KV pages are request-private, and decoder self-KV
            # depends on the per-request audio/encoder content through
            # cross attention — prefix sharing is invalid
            prefix_caching = False
        if config.model.arch in ("mamba", "mamba2", "jamba"):
            # recurrent-state pages are per-sequence mutable state, not
            # content-addressable KV: prefix sharing is meaningless and
            # spec decode needs an attention verify pass (the reference
            # likewise serves Mamba AR-only, models/mamba.py)
            if self.spec is not None:
                raise ValueError("speculative decoding is unsupported for "
                                 "the mamba family")
            prefix_caching = False
        if config.model.arch == "jamba":
            from qspec_tpu.models.jamba import check_state_fits
            check_state_fits(config.model, config.cache.page_size)
        self.block_manager = BlockManager(
            num_pages, config.cache.page_size,
            enable_prefix_caching=prefix_caching)
        self._lora_manager = None   # built lazily (see .lora)
        self._prompt_adapter_manager = None   # lazily (.prompt_adapters)
        self.scheduler = Scheduler(config.scheduler, self.block_manager,
                                   lookahead=lookahead)
        # swap-mode preemption: host parking lot sized by swap_space_gb
        # (reference CacheEngine CPU cache, vllm/worker/cache_engine.py)
        self._swap_pool = None
        if config.scheduler.preemption_mode == "swap":
            from qspec_tpu.core.swap import HostSwapPool
            from qspec_tpu.ops.kv_cache import (kv_entry_bytes,
                                                kv_has_scales)
            mc, cc = config.model, config.cache
            page_bytes = (2 * mc.num_layers * cc.page_size * mc.cache_kv_heads
                          * mc.cache_head_dim
                          * kv_entry_bytes(cc.kv_cache_dtype))
            if kv_has_scales(cc.kv_cache_dtype):  # per-(head, token) f32
                page_bytes += 2 * mc.num_layers * cc.page_size * mc.num_kv_heads * 4
            if self.runner.draft_cache is not None:
                page_bytes *= 2
            self._swap_pool = HostSwapPool(
                max_bytes=int(cc.swap_space_gb * (1 << 30)),
                page_bytes=page_bytes)
            self.scheduler.swap_ok = self._swap_pool.can_reserve
        self._next_id = 0
        self._outputs: Dict[int, RequestOutput] = {}
        self.spec_metrics = SpecDecodeMetrics()
        self._pending_first_logits = {}
        self.stat_loggers = []
        self._num_total_pages = num_pages
        self.tracer = None            # set via enable_tracing()
        self._traces = {}
        # disaggregated prefill (kv_transfer.py): rids whose pages must be
        # held at finish for extraction, and the finished held sequences
        self._kv_pending: set = set()
        self._kv_held: Dict[int, Sequence] = {}

    def profile_steps(self, num_steps: int, trace_dir: str) -> dict:
        """Capture an xprof/TensorBoard device trace of `num_steps` engine
        steps (reference: torch-profiler start/stop endpoints,
        vllm worker.profile). Under jit the per-layer breakdown lives in the
        device trace itself — the stage_range annotations (tracing.py) name
        the engine phases inside it."""
        import time as _time

        import jax.profiler

        t0 = _time.perf_counter()
        done = 0
        with jax.profiler.trace(trace_dir):
            for _ in range(num_steps):
                if not self.has_unfinished_requests():
                    break
                self.step()
                done += 1
        return {"trace_dir": trace_dir, "steps": done,
                "wall_s": _time.perf_counter() - t0}

    def enable_tracing(self, otlp_endpoint: Optional[str] = None,
                       service_name: str = "qspec_tpu") -> bool:
        from qspec_tpu.tracing import init_tracer
        self.tracer = init_tracer(service_name, otlp_endpoint)
        return self.tracer is not None

    def _derive_num_pages(self) -> int:
        """Size the cache from the HBM budget (reference
        determine_num_available_blocks, worker/worker.py:176): pages fill
        gpu_memory_utilization of free device memory, capped by what the
        scheduler can actually address."""
        cc = self.config.cache
        if cc.num_pages is not None:
            return cc.num_pages
        sched = self.config.scheduler
        mc = self.config.model
        need = sched.max_num_seqs * (-(-sched.max_model_len // cc.page_size)) + 8
        try:
            import jax
            stats = jax.local_devices()[0].memory_stats()
            free = (stats["bytes_limit"] * cc.gpu_memory_utilization
                    - stats["bytes_in_use"])
            from qspec_tpu.ops.kv_cache import kv_entry_bytes
            page_bytes = (2 * mc.num_layers * cc.page_size * mc.cache_kv_heads
                          * mc.cache_head_dim
                          * kv_entry_bytes(cc.kv_cache_dtype))
            need_draft = (self.spec is not None
                          and not (self._ngram or self._medusa))
            n_caches = 1
            if need_draft:
                windowed = (self.spec.draft_model is None and not self._eagle
                            and self.spec.draft_kv_window is not None)
                if windowed:
                    # ring-buffer draft pool (ModelRunner ring layout): a
                    # small FIXED pool — subtract it from the budget instead
                    # of doubling every page (the old 2x sizing halved the
                    # target cache and OOM'd long-context bf16-KV points)
                    w = self.spec.draft_kv_window
                    if mc.sliding_window is not None:
                        w = min(w, mc.sliding_window)
                    k = self.spec.num_speculative_tokens
                    ring_pages = -(-(w + k + 1) // cc.page_size) + 2
                    rows = max(sched.decode_batch_buckets) + 1
                    free -= (rows * ring_pages + 1) * page_bytes
                elif self.spec.draft_model is not None:
                    # separate draft model: its pool has its OWN (typically
                    # much smaller) geometry but the same page count
                    dm = self.spec.draft_model
                    d_page = (2 * dm.num_layers * cc.page_size
                              * dm.cache_kv_heads * dm.cache_head_dim
                              * kv_entry_bytes(cc.kv_cache_dtype))
                    n_caches = 1 + d_page / page_bytes
                else:
                    n_caches = 2
            fit = int(free // (page_bytes * n_caches))
            if fit <= 8:
                return need
            return min(need, fit)
        except Exception:
            return need

    # ------------------------------------------------------------------
    @property
    def prompt_adapters(self):
        """Soft-prompt adapter registry (prompt_adapter.py): named
        prompt-tuning matrices prepended via the prompt-embeds path."""
        if self._prompt_adapter_manager is None:
            from qspec_tpu.prompt_adapter import PromptAdapterManager
            self._prompt_adapter_manager = PromptAdapterManager(self)
        return self._prompt_adapter_manager

    @property
    def lora(self):
        """Dynamic adapter lifecycle (lora/manager.LoRAManager): load /
        unload / list named adapters over the slot bank at runtime.
        Raises if the engine was built without params['lora']."""
        if self._lora_manager is None:
            from qspec_tpu.lora.manager import LoRAManager
            self._lora_manager = LoRAManager(self)
        return self._lora_manager

    def add_request(self, prompt_token_ids: List[int],
                    sampling_params: Optional[SamplingParams] = None,
                    request_id: Optional[int] = None, lora_id: int = 0,
                    task: str = "generate", prompt_embeds=None,
                    mm_images=None, image_token_id: Optional[int] = None,
                    lora_name: Optional[str] = None,
                    prompt_adapter: Optional[str] = None,
                    mm_audio=None) -> int:
        if sampling_params is None:
            sampling_params = SamplingParams()
        if lora_name:
            # dynamic adapters (lora/manager.py): resolve the name to its
            # current slot at admission time
            lora_id = self.lora.slot_of(lora_name)
        if self._encdec and \
                len(prompt_token_ids) > self.config.scheduler.prefill_chunk_size:
            # the encoder is bidirectional: the whole prompt must fit one
            # prefill rectangle (raise prefill_chunk_size to serve longer
            # encoder inputs)
            raise ValueError(
                f"encoder prompt ({len(prompt_token_ids)} tokens) exceeds "
                f"prefill_chunk_size "
                f"({self.config.scheduler.prefill_chunk_size}) — "
                "encoder-decoder prompts are single-chunk")
        rid = request_id if request_id is not None else self._next_id
        self._next_id = max(self._next_id, rid + 1)
        if prompt_adapter:
            # soft prompt: adapter rows prepended through the prompt-embeds
            # path (prompt_adapter.py; reference vllm/prompt_adapter/)
            if mm_images:
                raise ValueError("prompt_adapter with images is unsupported")
            prompt_token_ids, prompt_embeds = self.prompt_adapters.splice(
                prompt_adapter, list(prompt_token_ids), self.runner.params)
        mrope_table, mrope_delta = None, 0
        if mm_images:
            # multimodal: expand image placeholders into projected embedding
            # rows (multimodal.py); the result rides the prompt-embeds path
            from qspec_tpu.multimodal import splice_image_embeds
            assert image_token_id is not None, \
                "mm_images needs image_token_id"
            if self.config.model.arch == "qwen2vl":
                from qspec_tpu.multimodal import splice_image_embeds_qwen2vl
                (prompt_token_ids, prompt_embeds, mrope_table,
                 mrope_delta) = splice_image_embeds_qwen2vl(
                    self.runner.params, self.config.model,
                    list(prompt_token_ids), mm_images, image_token_id)
            else:
                prompt_token_ids, prompt_embeds = splice_image_embeds(
                    self.runner.params, self.config.model,
                    list(prompt_token_ids), mm_images, image_token_id)
        if prompt_embeds is not None:
            if (self.spec is not None
                    and self.spec.draft_model is not None):
                # a separate draft model has its own hidden size/embed
                # table; prompt embeds for it cannot be derived
                raise ValueError("prompt_embeds are unsupported with a "
                                 "separate draft model")
            prompt_embeds = np.asarray(prompt_embeds, np.float32)
            if prompt_token_ids is None or not len(prompt_token_ids):
                prompt_token_ids = [0] * prompt_embeds.shape[0]
            assert len(prompt_token_ids) == prompt_embeds.shape[0], \
                "prompt_embeds rows must match prompt length"
        seq = Sequence(seq_id=rid, prompt_token_ids=list(prompt_token_ids),
                       sampling_params=sampling_params, lora_id=lora_id,
                       task=task, prompt_embeds=prompt_embeds,
                       audio_features=mm_audio)
        if self.config.model.mrope_section is not None:
            # Qwen2-VL M-RoPE state (qwen2vl_vit.mrope_positions): prefill
            # rope reads the 3-channel table; decode advances all channels
            # at pos + delta (text-only requests: no table, delta 0)
            seq.mrope_table = mrope_table
            seq.mrope_delta = mrope_delta
        if self._whisper and mm_audio is None:
            raise ValueError("whisper requests need mm_audio "
                             "(mel features [T, num_mel])")
        if self.config.model.arch == "bert" and task != "embed":
            raise ValueError("BERT-family models serve task='embed' only")
        sp = sampling_params
        if (sp.guided_regex or sp.guided_json is not None or sp.guided_choice) \
                and self.spec is not None \
                and self.spec.medusa_tree is not None:
            raise ValueError("guided decoding does not compose with the "
                             "medusa candidate tree (medusa_tree); use the "
                             "single-chain medusa rounds")
        if sp.guided_regex or sp.guided_json is not None or sp.guided_choice:
            gc = self._get_grammar_compiler()
            if sp.guided_regex:
                seq.grammar_fsm = gc.from_regex(sp.guided_regex)
            elif sp.guided_json is not None:
                seq.grammar_fsm = gc.from_json_schema(sp.guided_json)
            else:
                seq.grammar_fsm = gc.from_choice(sp.guided_choice)
        self.scheduler.add_seq(seq)
        from qspec_tpu.tracing import RequestTrace
        self._traces[rid] = RequestTrace()
        return rid

    def _get_grammar_compiler(self):
        if self._grammar_compiler is None:
            if self._grammar_vocab is None:
                if self.tokenizer is None:
                    raise ValueError(
                        "guided decoding needs a tokenizer or grammar_vocab "
                        "(token-id -> bytes) at engine construction")
                from qspec_tpu.guided import hf_vocab_bytes
                self._grammar_vocab = hf_vocab_bytes(self.tokenizer)
            from qspec_tpu.guided import GrammarCompiler
            self._grammar_compiler = GrammarCompiler(self._grammar_vocab,
                                                     self.eos_token_id)
        return self._grammar_compiler

    # -- disaggregated prefill (kv_transfer.py) ------------------------
    def prefill_for_transfer(self, prompt_token_ids: List[int],
                             request_id: Optional[int] = None) -> int:
        """Submit a prompt whose KV pages will be extracted after prefill
        (reference kv_transfer: the prefill instance's side)."""
        rid = self.add_request(prompt_token_ids,
                               SamplingParams(temperature=0.0, max_tokens=1,
                                              ignore_eos=True),
                               request_id=request_id)
        self._kv_pending.add(rid)
        return rid

    def extract_kv(self, request_id: int):
        """Gather the finished prefill's pages to host and free them.
        Returns a KVHandoff (the decode instance feeds it to inject_kv)."""
        from qspec_tpu.kv_transfer import KVHandoff
        seq = self._kv_held.pop(request_id)
        n_pages = self.block_manager.pages_needed(seq.prompt_len)
        pages, scales = self.runner.gather_pages(seq.page_ids[:n_pages])
        self.block_manager.free(seq)
        return KVHandoff(
            prompt_token_ids=list(seq.prompt_token_ids),
            first_token=seq.output_token_ids[0],
            first_logprob=seq.output_logprobs[0],
            page_size=self.config.cache.page_size,
            kv_dtype=self.config.cache.kv_cache_dtype,
            pages=pages, scales=scales)

    def inject_kv(self, handoff, sampling_params: Optional[SamplingParams] = None,
                  request_id: Optional[int] = None) -> int:
        """Adopt a transferred prefill: allocate pages, scatter the KV in,
        and enter decode directly (reference kv_transfer: the decode
        instance's side). The request continues from token 1."""
        assert handoff.page_size == self.config.cache.page_size, \
            "page_size mismatch between prefill and decode engines"
        assert handoff.kv_dtype == self.config.cache.kv_cache_dtype, \
            "kv cache dtype mismatch between prefill and decode engines"
        sp = sampling_params or SamplingParams()
        rid = request_id if request_id is not None else self._next_id
        self._next_id = max(self._next_id, rid + 1)
        seq = Sequence(seq_id=rid,
                       prompt_token_ids=list(handoff.prompt_token_ids),
                       sampling_params=sp)
        lookahead = self.scheduler.lookahead
        if not self.block_manager.can_allocate(seq, lookahead=lookahead):
            raise RuntimeError("no free pages for injected KV")
        self.block_manager.allocate_prompt(seq, lookahead=lookahead)
        n_pages = self.block_manager.pages_needed(seq.prompt_len)
        self.runner.write_pages(seq.page_ids[:n_pages], handoff.pages,
                                handoff.scales)
        seq.append_token(handoff.first_token, handoff.first_logprob)
        seq.num_computed_tokens = seq.prompt_len
        self.block_manager.mark_computed(seq)
        seq.status = SequenceStatus.RUNNING
        seq.check_stop(self.eos_token_id)
        self.scheduler.running.append(seq)
        from qspec_tpu.tracing import RequestTrace
        self._traces[rid] = RequestTrace()
        return rid

    def abort_request(self, request_id: int) -> None:
        self.scheduler.abort_seq(request_id)
        if self._swap_pool is not None:
            self._swap_pool.discard(request_id)
        self._traces.pop(request_id, None)

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished()

    # ------------------------------------------------------------------
    def step(self) -> List[RequestOutput]:
        batch = self.scheduler.schedule()
        if batch.swap_out or batch.swap_in:
            self._process_swaps(batch)
        rejected = [self._to_output(s) for s in self.scheduler.rejected]
        self.scheduler.rejected = []
        if batch.is_empty:
            return rejected
        if batch.kind == "prefill":
            self._run_prefill(batch)
            if batch.decode_seqs:
                # mixed chunked-prefill iteration (reference
                # core/scheduler.py:1151): the running decodes advance in
                # the same engine step so admissions don't stall them
                if self.spec is not None \
                        and not self._spec_disabled(len(batch.decode_seqs)):
                    self._run_spec_decode(batch.decode_seqs, mixed=True)
                else:
                    self._run_decode(batch.decode_seqs, mixed=True)
        else:
            if self.spec is not None and not self._spec_disabled(len(batch.seqs)):
                self._run_spec_decode(batch.seqs)
            else:
                self._run_decode(batch.seqs)

        outputs = rejected
        # every sequence that gained tokens this step (decode: the whole
        # batch; prefill: rows whose chunk completed the prompt, plus any
        # co-scheduled decodes) — ALL batched chunks, not just the first (a
        # co-scheduled sequence must stream its first token the step it
        # appears)
        touched = (batch.seqs if batch.kind == "decode" else
                   [c.seq for c in batch.chunks
                    if c.seq.num_computed_tokens >= c.seq.prefill_len
                    and c.seq.output_token_ids] + batch.decode_seqs)
        for s in list(self.scheduler.running):
            if s.num_computed_tokens >= s.prefill_len:
                s.check_stop(self.eos_token_id)
                self._check_stop_strings(s)
        for s in (batch.seqs if batch.kind == "decode"
                  else [c.seq for c in batch.chunks] + batch.decode_seqs):
            tr = self._traces.get(s.seq_id)
            if tr is not None:
                tr.mark_scheduled()
                if s.output_token_ids:
                    tr.mark_first_token()
        finished = self.scheduler.free_finished(
            hold=(lambda s: s.seq_id in self._kv_pending)
            if self._kv_pending else None)
        for s in finished:
            if s.seq_id in self._kv_pending:
                self._kv_pending.discard(s.seq_id)
                self._kv_held[s.seq_id] = s
        for s in finished:
            if self.runner._ring_pages:
                self.runner.free_ring_row(s)
            tr = self._traces.pop(s.seq_id, None)
            if tr is not None:
                tr.mark_finished()
                tr.emit(self.tracer, s.seq_id, s.prompt_len,
                        len(s.output_token_ids), s.sampling_params)
            outputs.append(self._to_output(s))
        for s in touched:
            if not s.is_finished:
                outputs.append(self._to_output(s, finished=False))
        if self.stat_loggers:
            self._log_stats(batch)
        return outputs

    def _process_swaps(self, batch: ScheduledBatch) -> None:
        """Execute the scheduler's swap decisions BEFORE the batch runs
        (reference: Worker executes blocks_to_swap_out/in ahead of the
        forward pass). Order matters: all device->host gathers first —
        a victim's pages may have been reallocated to a swapped-in
        sequence in the same step, and the gather must read the old
        contents before the swap-in scatter overwrites them."""
        swapped_in_ids = {s.seq_id for s in batch.swap_in}
        for seq, page_ids in batch.swap_out:
            if seq.seq_id in swapped_in_ids:
                # swapped in and re-preempted within one schedule(): its
                # parked payload never reached the device, so the pool
                # entry is still the valid copy — nothing to gather
                continue
            pages, scales = self.runner.gather_pages(page_ids)
            payload = {"n_pages": len(page_ids), "pages": pages,
                       "scales": scales}
            if self.runner.draft_cache is not None:
                if self.runner._ring_pages:
                    # ring layout: park the R ring pages (position mapping
                    # lp % R is row-independent, so they can be restored
                    # into a different row on swap-in)
                    ring_ids = self.runner.ring_page_ids_for(seq)
                    if ring_ids is not None:
                        dp, ds = self.runner.gather_pages(ring_ids,
                                                          draft=True)
                        payload.update(draft_ring=dp, draft_ring_scales=ds)
                    self.runner.free_ring_row(seq)
                else:
                    dp, ds = self.runner.gather_pages(page_ids, draft=True)
                    payload.update(draft_pages=dp, draft_scales=ds)
            self._swap_pool.put(seq.seq_id, len(page_ids), payload)
        for seq in batch.swap_in:
            if seq.status != SequenceStatus.RUNNING:
                # re-preempted in the same schedule(): SWAPPED keeps its
                # pool entry; recompute (WAITING) restarts from scratch
                if seq.status == SequenceStatus.WAITING:
                    self._swap_pool.discard(seq.seq_id)
                continue
            payload = self._swap_pool.pop(seq.seq_id)
            ids = seq.page_ids[:payload["n_pages"]]
            self.runner.write_pages(ids, payload["pages"], payload["scales"])
            if "draft_pages" in payload:
                self.runner.write_pages(ids, payload["draft_pages"],
                                        payload["draft_scales"], draft=True)
            elif "draft_ring" in payload:
                # restore the parked ring into a (possibly different) row
                row = self.runner._ring_row_for(seq, {seq.seq_id})
                start = 1 + row * self.runner._ring_pages
                ring_ids = list(range(start,
                                      start + self.runner._ring_pages))
                self.runner.write_pages(ring_ids, payload["draft_ring"],
                                        payload["draft_ring_scales"],
                                        draft=True)

    def _log_stats(self, batch) -> None:
        from qspec_tpu.engine.metrics import Stats
        m = self.spec_metrics
        stats = Stats(
            num_running=len(self.scheduler.running),
            num_waiting=len(self.scheduler.waiting),
            num_free_pages=self.block_manager.num_free_pages,
            num_total_pages=self._num_total_pages,
            prompt_tokens=sum(c.end - c.start for c in batch.chunks)
            if batch.kind == "prefill" else 0,
            generation_tokens=len(batch.seqs) if batch.kind == "decode" else 0,
            spec_draft_acceptance_rate=m.draft_acceptance_rate
            if m.num_spec_rounds else None,
            spec_system_efficiency=m.system_efficiency
            if m.num_spec_rounds else None,
        )
        for logger in self.stat_loggers:
            logger.record(stats)

    def _check_stop_strings(self, seq: Sequence) -> None:
        """Enforce SamplingParams.stop (stop *strings*): detokenize
        INCREMENTALLY (detokenizer.py — the reference's
        detokenize_incrementally) and finish at the earliest occurrence
        (reference llm_engine.py:975 stop-check in _process_model_outputs).
        The hot path costs O(new tokens) per step: only freshly decoded text
        (plus a stop-length overlap) is searched. The emitted text excludes
        the stop string unless include_stop_str_in_output."""
        sp = seq.sampling_params
        if not sp.stop or self.tokenizer is None or seq.is_finished:
            return
        from qspec_tpu.detokenizer import DetokState, detokenize_incrementally
        st = seq.detok
        if st is None:
            st = seq.detok = DetokState()
        old_len = len(st.text)
        try:
            text = detokenize_incrementally(self.tokenizer,
                                            seq.output_token_ids, st)
        except Exception:
            return
        # a stop string can only appear in the new text or straddling the
        # boundary by at most len(stop)-1 chars of old text
        search_from = max(0, old_len - max(len(s) for s in sp.stop) + 1)
        tail = text[search_from:]
        first = min(((search_from + tail.find(stop), stop)
                     for stop in sp.stop if tail.find(stop) != -1),
                    default=None)
        if first is None:
            return
        # minimal token prefix whose decode already contains the stop string
        n = len(seq.output_token_ids)
        for m in range(1, n + 1):
            t = self.tokenizer.decode(seq.output_token_ids[:m])
            hit = min(((t.find(stop), stop) for stop in sp.stop
                       if t.find(stop) != -1), default=None)
            if hit is None:
                continue
            idx, stop = hit
            seq.output_token_ids = seq.output_token_ids[:m]
            seq.output_logprobs = seq.output_logprobs[:m]
            seq.output_top_logprobs = seq.output_top_logprobs[:m]
            seq.stop_text = t[:idx + len(stop)] if sp.include_stop_str_in_output \
                else t[:idx]
            seq.status = SequenceStatus.FINISHED_STOPPED
            seq.finish_reason = "stop"
            return

    def _spec_disabled(self, batch_size: int) -> bool:
        dbs = self.spec.disable_by_batch_size
        return dbs is not None and batch_size >= dbs

    # ------------------------------------------------------------------
    def _run_prefill(self, batch: ScheduledBatch) -> None:
        chunks = [(c.seq, c.start, c.end) for c in (batch.chunks or [batch.chunk])]
        if self.config.model.arch == "bert":
            # encoder-only embedding models: one bidirectional pass,
            # request finishes at prefill (models/bert.py)
            pooled = self.runner.run_embed_bert(chunks)
            for i, (s, _, end) in enumerate(chunks):
                s.num_computed_tokens = end
                self.block_manager.mark_computed(s)
                if end == s.prefill_len:
                    s.embedding = pooled[i]
                    s.status = SequenceStatus.FINISHED_STOPPED
                    s.finish_reason = "stop"
            return
        embed_rows = [i for i, (s, _, end) in enumerate(chunks)
                      if s.task == "embed" and end == s.prefill_len]
        eagle_h = None
        if embed_rows:
            logits, hidden = self.runner.run_prefill_chunks(chunks,
                                                            want_hidden=True)
            hidden = np.asarray(hidden)
            for i in embed_rows:
                s = chunks[i][0]
                s.embedding = hidden[i].astype(np.float32)
                s.status = SequenceStatus.FINISHED_STOPPED
                s.finish_reason = "stop"
        elif self._whisper:
            logits = self.runner.run_prefill_whisper(chunks)
        elif self._encdec:
            logits = self.runner.run_prefill_encdec(chunks)
        elif self._eagle:
            # fused target-prefill + draft-KV build; the returned hidden
            # (each row's final computed position) seeds the decode span
            logits, eagle_h = self.runner.run_prefill_chunks_eagle(chunks)
        else:
            logits = self.runner.run_prefill_chunks(chunks)
        if self.spec is not None and not (self._ngram or self._medusa
                                          or self._eagle):
            # the draft path keeps its own (w4a4-computed) KV of the prompt,
            # exactly as the reference proposer worker prefills separately
            self.runner.run_prefill_chunks(chunks, draft=True)
        # rows that completed a FRESH prompt sample their first token; a
        # resumed preempted sequence (preserved outputs) just finishes
        # recomputing KV — its last token is the next decode step's input
        completing = [i for i, (s, _, end) in enumerate(chunks)
                      if end == s.prefill_len and not s.output_token_ids
                      and s.task != "embed"]
        for s, _, end in chunks:
            s.num_computed_tokens = end
            self.block_manager.mark_computed(s)
        if completing:
            # sample over the full (already bucketed) rectangle so the jitted
            # sampler sees one stable shape; non-completing rows discarded
            from qspec_tpu.engine.model_runner import _pad_sampling
            st = _pad_sampling(
                make_sampling_tensors([c[0] for c in chunks],
                                      self.config.model.vocab_size,
                                      self.eos_token_id),
                len(chunks), logits.shape[0])
            want_top = self._wants_top([chunks[i][0] for i in completing])
            out = self.runner.sample_tokens(logits, st, want_top=want_top)
            toks, lps = out[0], out[1]
            top = out[2] if want_top else None
            for i in completing:
                s = chunks[i][0]
                s.append_token(int(toks[i]), float(lps[i]),
                               top=self._top_dict(s, top[0][i], top[1][i])
                               if top is not None else None)
        if eagle_h is not None:
            # span seed: the hidden at each row's final computed position
            # pairs with the NEXT token — the freshly sampled first token
            # (completing) or the preserved last token (resumed)
            for i, (s, _, end) in enumerate(chunks):
                if end == s.prefill_len:
                    s.eagle_span = (eagle_h[i][None].astype(np.float32),
                                    np.asarray([s.last_token()], np.int32),
                                    end - 1, 1)

    @staticmethod
    def _wants_top(seqs) -> bool:
        return any((s.sampling_params.logprobs or 0) > 1 for s in seqs)

    @staticmethod
    def _top_dict(s, topv, topi):
        n = min(int(s.sampling_params.logprobs or 0), topi.shape[-1])
        return {int(topi[j]): float(topv[j]) for j in range(n)}

    def _run_decode(self, seqs: List[Sequence], mixed: bool = False) -> None:
        if not seqs:
            return
        st = make_sampling_tensors(seqs, self.config.model.vocab_size,
                                   self.eos_token_id)
        # mixed (co-scheduled with a prefill chunk): exactly one decode step,
        # so prompt chunks and the running batch alternate at chunk cadence
        steps = 1 if mixed else self.config.scheduler.steps_per_decode_call
        chain = self._chain_for(seqs, steps) if steps > 1 else 1
        if self._whisper:
            tokens, lps, top = self.runner.run_decode_whisper(
                seqs, st, num_steps=steps, chain=chain)
        elif self._encdec:
            tokens, lps, top = self.runner.run_decode_encdec(
                seqs, st, num_steps=steps, chain=chain)
        else:
            tokens, lps, top = self.runner.run_decode(
                seqs, st, num_steps=steps, want_top=self._wants_top(seqs),
                chain=chain)
        for i, s in enumerate(seqs):
            if top is None and s.grammar_fsm is None:
                # bulk-append fast path (the multi-step fused calls emit up
                # to steps*chain tokens per sequence per host call)
                col = tokens[:, i]
                valid = col >= 0
                toks_list = col[valid].tolist()
                s.output_token_ids.extend(toks_list)
                s.output_logprobs.extend(lps[:, i][valid].tolist())
                s.output_top_logprobs.extend([None] * len(toks_list))
            else:
                for r in range(tokens.shape[0]):
                    t = int(tokens[r, i])
                    if t >= 0:
                        s.append_token(t, float(lps[r, i]),
                                       top=self._top_dict(s, top[0][r, i],
                                                          top[1][r, i])
                                       if top is not None else None)
            s.num_computed_tokens = s.num_tokens - 1
            if steps > 1:
                s.truncate_stop_overshoot(self.eos_token_id)

    def _chain_for(self, seqs: List[Sequence], per_call: int) -> int:
        """How many fused device calls to dispatch back-to-back without
        reading tokens back in between (run_*_rounds `chain`). Hiding the
        host round-trip this way is only safe when no host-side control
        depends on mid-chain tokens: EOS/stop handling, stop strings, and
        grammar FSMs all read tokens between calls, so any of them forces
        chain=1. Overshoot past max_tokens is already budget-masked on
        device. Pages for the whole chain must be reservable up front."""
        MAXCHAIN = 8
        rem = 0
        for s in seqs:
            sp = s.sampling_params
            if ((not sp.ignore_eos and self.eos_token_id is not None)
                    or sp.stop or sp.stop_token_ids
                    or s.grammar_fsm is not None
                    # penalties rebuild the logit bias from emitted tokens
                    # on the host between calls
                    or sp.presence_penalty or sp.frequency_penalty
                    or sp.repetition_penalty != 1.0):
                return 1
            rem = max(rem, sp.max_tokens - len(s.output_token_ids))
        chain = min(MAXCHAIN, max(1, -(-rem // max(per_call, 1))))
        look = self.scheduler.lookahead
        while chain > 1:
            if all(self.block_manager.append_slots(s, lookahead=chain * look)
                   for s in seqs):
                break
            chain -= 1
        return chain

    def _run_spec_decode(self, seqs: List[Sequence],
                         mixed: bool = False) -> None:
        if not seqs:
            return
        k = self.spec.num_speculative_tokens
        st = make_sampling_tensors(seqs, self.config.model.vocab_size,
                                   self.eos_token_id)
        per_call = (k + 1) * self.spec.rounds_per_step
        # mixed with a prefill chunk: one fused call only (no chaining), so
        # the next chunk isn't delayed behind a long decode chain
        chain = 1 if mixed else self._chain_for(seqs, per_call)
        t0 = time.perf_counter()
        if self._eagle:
            tokens, accepted, lps = self.runner.run_eagle_rounds(
                seqs, st, k, chain=chain)
        elif self._medusa:
            tokens, accepted, lps = self.runner.run_medusa_rounds(
                seqs, st, chain=chain,
                enable=self.spec.method != "medusa_null")
        elif self._ngram:
            tokens, accepted, lps = self.runner.run_ngram_rounds(
                seqs, st, enable=self.spec.method == "ngram", chain=chain)
        else:
            # "qspec_null" runs the SAME spec_rounds executable with nulled
            # proposals — the bit-exact AR oracle for the model-draft path
            tokens, accepted, lps = self.runner.run_spec_rounds(
                seqs, st, k, num_rounds=self.spec.rounds_per_step,
                chain=chain, enable=self.spec.method != "qspec_null")
        dt = time.perf_counter() - t0
        for i, s in enumerate(seqs):
            # bulk-append: the emitted rectangle is already -1-masked past
            # each round's accepted length, so one vectorized mask replaces
            # the per-token python loop (hundreds of appends per fused call)
            col_t = tokens[:, i, :].reshape(-1)
            valid = col_t >= 0
            toks_list = col_t[valid].tolist()
            s.output_token_ids.extend(toks_list)
            s.output_logprobs.extend(lps[:, i, :].reshape(-1)[valid].tolist())
            s.output_top_logprobs.extend([None] * len(toks_list))
            if s.grammar_fsm is not None and s.grammar_state >= 0:
                ns = s.grammar_fsm.next_state
                for t in toks_list:
                    if s.grammar_state < 0:
                        break
                    if 0 <= t < ns.shape[1]:
                        s.grammar_state = int(ns[s.grammar_state, t])
            s.num_computed_tokens = s.num_tokens - 1
            s.truncate_stop_overshoot(self.eos_token_id)
        emitted = int(accepted.sum())
        active_rounds = int((accepted > 0).sum())
        # draft-accepted = emitted - one bonus/recovery per live (round, seq)
        self.spec_metrics.record(
            num_draft_tokens=active_rounds * k, k=k,
            draft_accepted=emitted - active_rounds,
            emitted=emitted, wall_s=dt)

    # ------------------------------------------------------------------
    def _to_output(self, seq: Sequence, finished: bool = True) -> RequestOutput:
        text = ""
        if seq.stop_text is not None and finished:
            text = seq.stop_text
        elif self.tokenizer is not None and finished:
            try:
                text = self.tokenizer.decode(seq.output_token_ids)
            except Exception:
                text = ""
        return RequestOutput(
            request_id=seq.seq_id,
            prompt_token_ids=seq.prompt_token_ids,
            output_token_ids=list(seq.output_token_ids),
            finished=finished,
            finish_reason=seq.finish_reason,
            text=text,
            logprobs=list(seq.output_logprobs)
            if seq.sampling_params.logprobs else None,
            top_logprobs=list(seq.output_top_logprobs)
            if (seq.sampling_params.logprobs or 0) > 1 else None,
            embedding=seq.embedding,
        )


def _to_device_st(st):
    import jax.numpy as jnp
    from qspec_tpu.ops.sampling import SamplingTensors
    return SamplingTensors(*(jnp.asarray(t) for t in st))
