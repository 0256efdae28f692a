"""Data-parallel serving: N engine replicas behind one router.

The reference's DP story is "run N vLLM engine replicas behind a router"
(docs/source/serving/distributed_serving.md; the v1 engine adds an
in-process DP coordinator later). Here each replica is an MQ engine process
(engine/multiprocessing.py) owning its own chip/mesh slice, and the router:

- dispatches new requests to the replica with the fewest outstanding
  requests (round-robin among ties),
- demultiplexes each replica's PUB stream into per-request queues on a
  background reader thread, so any number of requests stream concurrently,
- health-checks replicas and fails over: a dead replica's queued requests
  error out (ENGINE_DEAD semantics) while new requests route to survivors.
"""

from __future__ import annotations

import pickle
import queue
import threading
import time
from typing import Any, Iterator, List, Optional, Tuple

import zmq

from qspec_tpu.engine.multiprocessing import (ENGINE_DEAD, MQEngineDeadError,
                                              RPCAbortRequest,
                                              RPCGenerateRequest)


class _Replica:
    """Connection to one MQ engine + demux thread."""

    def __init__(self, input_addr: str, output_addr: str, health_addr: str,
                 name: str = ""):
        self.name = name or input_addr
        self.ctx = zmq.Context()
        self.inp = self.ctx.socket(zmq.PUSH)
        self.inp.connect(input_addr)
        self.out = self.ctx.socket(zmq.SUB)
        self.out.connect(output_addr)
        self.out.setsockopt(zmq.SUBSCRIBE, b"")
        self._health_addr = health_addr
        self._streams: dict[int, queue.Queue] = {}
        self._lock = threading.Lock()
        self._next_local = 0
        self.dead_reason: Optional[str] = None
        # set when the last health probe went unanswered (e.g. the process
        # was SIGKILLed and can't report ENGINE_DEAD); routing avoids
        # suspects and a later successful probe clears the flag
        self.suspect = False
        self._stop = threading.Event()
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()

    @property
    def outstanding(self) -> int:
        with self._lock:
            return len(self._streams)

    def _read_loop(self) -> None:
        while not self._stop.is_set():
            if not self.out.poll(timeout=100):
                continue
            topic, payload = self.out.recv_multipart()
            if topic == b"__dead__":
                self._mark_dead(payload.decode())
                return
            with self._lock:
                q = self._streams.get(int(topic))
            if q is not None:
                q.put(pickle.loads(payload))

    def _mark_dead(self, reason: str) -> None:
        self.dead_reason = reason
        with self._lock:
            for q in self._streams.values():
                q.put(MQEngineDeadError(reason))
            self._streams.clear()

    def submit(self, prompt_token_ids: list, sampling_params) -> Tuple[int, queue.Queue]:
        with self._lock:
            rid = self._next_local
            self._next_local += 1
            q: queue.Queue = queue.Queue()
            self._streams[rid] = q
        self.inp.send(pickle.dumps(
            RPCGenerateRequest(rid, prompt_token_ids, sampling_params)))
        return rid, q

    def finish(self, rid: int) -> None:
        with self._lock:
            self._streams.pop(rid, None)

    def abort(self, rid: int) -> None:
        self.inp.send(pickle.dumps(RPCAbortRequest(rid)))
        self.finish(rid)

    def check_health(self, timeout_ms: int = 2000) -> bool:
        if self.dead_reason:
            return False
        sock = self.ctx.socket(zmq.REQ)
        sock.setsockopt(zmq.LINGER, 0)
        try:
            sock.connect(self._health_addr)
            sock.send(b"ping")
            if not sock.poll(timeout=timeout_ms):
                self.suspect = True
                return False
            resp = sock.recv()
        finally:
            sock.close(0)
        if resp.startswith(ENGINE_DEAD):
            self._mark_dead(resp.decode())
            return False
        self.suspect = False
        return True

    def shutdown(self) -> None:
        try:
            self.inp.send(pickle.dumps("SHUTDOWN"))
        except Exception:
            pass
        self.close()

    def close(self) -> None:
        self._stop.set()
        self._reader.join(timeout=2)
        for s in (self.inp, self.out):
            s.close(0)
        self.ctx.term()


class DPRouter:
    """Round-robin/least-loaded request router over engine replicas."""

    def __init__(self, replicas: List[_Replica]):
        self.replicas = replicas
        self._rr = 0
        self._lock = threading.Lock()

    # -------------------------------------------------------------- routing
    def _pick(self) -> _Replica:
        with self._lock:
            live = [r for r in self.replicas if r.dead_reason is None]
            trusted = [r for r in live if not r.suspect]
            pool = trusted or live  # all-suspect: better to try than refuse
            if not pool:
                raise MQEngineDeadError("all replicas dead: " + "; ".join(
                    r.dead_reason or "?" for r in self.replicas))
            best = min(r.outstanding for r in pool)
            candidates = [r for r in pool if r.outstanding == best]
            self._rr += 1
            return candidates[self._rr % len(candidates)]

    def generate(self, prompt_token_ids: list, sampling_params,
                 timeout_s: float = 300.0) -> Iterator[Any]:
        replica = self._pick()
        rid, q = replica.submit(prompt_token_ids, sampling_params)
        deadline = time.monotonic() + timeout_s
        try:
            while True:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    raise TimeoutError(f"request {replica.name}/{rid} timed out")
                try:
                    out = q.get(timeout=min(remaining, 1.0))
                except queue.Empty:
                    continue
                if isinstance(out, Exception):
                    raise out
                yield out
                if out.finished:
                    return
        finally:
            replica.finish(rid)

    # -------------------------------------------------------------- health
    def check_health(self) -> dict:
        return {r.name: r.check_health() for r in self.replicas}

    @property
    def num_live(self) -> int:
        return sum(r.dead_reason is None for r in self.replicas)

    def shutdown(self) -> None:
        for r in self.replicas:
            r.shutdown()


def start_dp_router(engine_factory, num_replicas: int,
                    base_path: Optional[str] = None):
    """Fork num_replicas MQ engine processes and return (router, procs).

    engine_factory(replica_idx) or engine_factory() must be picklable.
    """
    import functools
    import inspect
    import multiprocessing as mp
    import os
    import tempfile

    from qspec_tpu.engine.multiprocessing import run_mq_engine

    base = base_path or tempfile.mkdtemp(prefix="qspec_dp_")
    replicas, procs = [], []
    takes_idx = len(inspect.signature(engine_factory).parameters) >= 1
    for i in range(num_replicas):
        d = os.path.join(base, f"r{i}")
        os.makedirs(d, exist_ok=True)
        addrs = tuple(f"ipc://{os.path.join(d, n)}" for n in
                      ("input", "output", "health"))
        fac = functools.partial(engine_factory, i) if takes_idx else engine_factory
        proc = mp.get_context("spawn").Process(
            target=run_mq_engine, args=(pickle.dumps(fac),) + addrs,
            daemon=True)
        proc.start()
        procs.append(proc)
        replicas.append(_Replica(*addrs, name=f"replica-{i}"))
    return DPRouter(replicas), procs
