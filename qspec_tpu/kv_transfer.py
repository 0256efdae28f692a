"""KV transfer / disaggregated prefill (reference: vllm/distributed/
kv_transfer/ — prefill instances ship computed KV + the first sampled token
to decode instances).

TPU-native shape of the idea: the paged cache already stores one sequence's
KV as whole pages, so a handoff is (prompt, first token, the seq's pages
gathered to host). Between co-located engines the arrays move as numpy;
across PROCESSES (or hosts) the same struct rides a ZMQ PUSH/PULL pipe
(``KVPipe`` below — the analogue of the reference's
kv_pipe/pynccl_pipe.py:40 point-to-point tensor pipe, over the transport
this platform actually has: the TPU pages are gathered to host anyway, so
host sockets ARE the device-to-device path; across hosts the same frames
ride TCP on the DCN).

Protocol:
    prefill engine:  rid = eng_p.prefill_for_transfer(prompt)
                     ... step() until finished ...
                     handoff = eng_p.extract_kv(rid)
                     pipe.send_handoff(handoff)          # cross-process
    decode engine:   handoff = pipe.recv_handoff()
                     rid = eng_d.inject_kv(handoff, sampling_params)
                     ... step() as usual — decode continues from token 1.
"""

from __future__ import annotations

import dataclasses
import pickle
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


class KVPipe:
    """Point-to-point KV-handoff transport between engine PROCESSES
    (reference kv_pipe/pynccl_pipe.py: a one-directional tensor pipe with a
    producer and a consumer end; connector semantics of
    kv_connector/simple_connector.py:28 ride on top).

    ZMQ PUSH/PULL over ipc:// (same host) or tcp:// (across hosts/DCN).
    Page arrays travel as raw multipart frames — no pickle copy of the
    payload bytes; only the small metadata header is pickled.
    """

    def __init__(self, addr: str, *, producer: bool):
        import zmq
        self.ctx = zmq.Context()
        self.sock = self.ctx.socket(zmq.PUSH if producer else zmq.PULL)
        # the consumer owns the endpoint: it outlives producer reconnects
        if producer:
            self.sock.connect(addr)
        else:
            self.sock.bind(addr)
        self._producer = producer

    @classmethod
    def producer(cls, addr: str) -> "KVPipe":
        return cls(addr, producer=True)

    @classmethod
    def consumer(cls, addr: str) -> "KVPipe":
        return cls(addr, producer=False)

    def send_handoff(self, h: KVHandoff) -> None:
        assert self._producer, "recv end cannot send"
        meta = {
            "prompt_token_ids": h.prompt_token_ids,
            "first_token": h.first_token,
            "first_logprob": h.first_logprob,
            "page_size": h.page_size,
            "kv_dtype": h.kv_dtype,
            "pages_shape": h.pages.shape,
            "pages_dtype": h.pages.dtype.name,
            "scales_shape": (None if h.scales is None else h.scales.shape),
            "scales_dtype": (None if h.scales is None
                             else h.scales.dtype.name),
        }
        # ship raw bytes: exotic dtypes (ml_dtypes bfloat16/fp8) have no
        # exportable buffer format, so frames travel as uint8 views
        frames = [pickle.dumps(meta),
                  np.ascontiguousarray(h.pages).view(np.uint8).reshape(-1)]
        if h.scales is not None:
            frames.append(
                np.ascontiguousarray(h.scales).view(np.uint8).reshape(-1))
        self.sock.send_multipart(frames, copy=False)

    def recv_handoff(self, timeout_ms: Optional[int] = None) -> KVHandoff:
        assert not self._producer, "send end cannot recv"
        import zmq
        if timeout_ms is not None:
            if not self.sock.poll(timeout_ms, zmq.POLLIN):
                raise TimeoutError(f"no KV handoff within {timeout_ms} ms")
        frames = self.sock.recv_multipart(copy=False)
        meta = pickle.loads(frames[0].bytes)
        pages = np.frombuffer(
            frames[1].buffer, dtype=np.dtype(meta["pages_dtype"])
        ).reshape(meta["pages_shape"]).copy()
        scales = None
        if meta["scales_shape"] is not None:
            scales = np.frombuffer(
                frames[2].buffer, dtype=np.dtype(meta["scales_dtype"])
            ).reshape(meta["scales_shape"]).copy()
        return KVHandoff(
            prompt_token_ids=meta["prompt_token_ids"],
            first_token=meta["first_token"],
            first_logprob=meta["first_logprob"],
            page_size=meta["page_size"], kv_dtype=meta["kv_dtype"],
            pages=pages, scales=scales)

    def close(self) -> None:
        self.sock.close(linger=0)
        self.ctx.term()
