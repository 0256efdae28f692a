"""Multiprocess engine behind ZMQ IPC (reference: vllm/engine/multiprocessing/
engine.py:33 MQLLMEngine + client.py:61 MQLLMEngineClient).

The engine runs in a separate process owning the TPU; clients talk over
three sockets: a PULL input socket (requests/aborts), a PUB output socket
(streams of RequestOutputs), and a heartbeat/health REP socket. Engine death
surfaces as ENGINE_DEAD to all clients (reference __init__.py:143
ENGINE_DEAD_ERROR semantics).
"""

from __future__ import annotations

import multiprocessing as mp
import pickle
import time
from dataclasses import dataclass
from typing import Any, Dict, Iterator, Optional

import zmq

HEALTHY = b"HEALTHY"
ENGINE_DEAD = b"ENGINE_DEAD"


class MQEngineDeadError(RuntimeError):
    pass


@dataclass
class RPCGenerateRequest:
    request_id: int
    prompt_token_ids: list
    sampling_params: Any
    task: str = "generate"      # "generate" | "embed"
    lora_id: int = 0
    # prompt-embeds / multimodal payloads (numpy arrays pickle fine over
    # the ZMQ transport; reference: multimodal data in the MQ engine path)
    prompt_embeds: Any = None
    mm_images: Any = None
    image_token_id: Any = None


@dataclass
class RPCAbortRequest:
    request_id: int


def run_mq_engine(engine_factory_bytes: bytes, input_addr: str, output_addr: str,
                  health_addr: str) -> None:
    """Engine process main loop (reference MQLLMEngine.start / run_engine_loop)."""
    ctx = zmq.Context()
    inp = ctx.socket(zmq.PULL)
    inp.bind(input_addr)
    out = ctx.socket(zmq.PUB)
    out.bind(output_addr)
    health = ctx.socket(zmq.REP)
    health.bind(health_addr)

    try:
        factory = pickle.loads(engine_factory_bytes)
        engine = factory()
    except Exception as e:  # propagate construction failure
        _serve_dead(inp, out, health, repr(e))
        return

    poller = zmq.Poller()
    poller.register(inp, zmq.POLLIN)
    poller.register(health, zmq.POLLIN)

    try:
        while True:
            has_work = engine.has_unfinished_requests()
            events = dict(poller.poll(timeout=0 if has_work else 50))
            if health in events:
                health.recv()
                health.send(HEALTHY)
            while inp in events and inp.poll(timeout=0):
                msg = pickle.loads(inp.recv())
                if isinstance(msg, RPCGenerateRequest):
                    engine.add_request(msg.prompt_token_ids, msg.sampling_params,
                                       request_id=msg.request_id,
                                       task=getattr(msg, "task", "generate"),
                                       lora_id=getattr(msg, "lora_id", 0),
                                       prompt_embeds=getattr(
                                           msg, "prompt_embeds", None),
                                       mm_images=getattr(msg, "mm_images",
                                                         None),
                                       image_token_id=getattr(
                                           msg, "image_token_id", None))
                elif isinstance(msg, RPCAbortRequest):
                    engine.abort_request(msg.request_id)
                elif msg == "SHUTDOWN":
                    return
            if engine.has_unfinished_requests():
                for o in engine.step():
                    out.send_multipart([str(o.request_id).encode(),
                                        pickle.dumps(o)])
    except Exception as e:
        _serve_dead(inp, out, health, repr(e))


def _serve_dead(inp, out, health, reason: str) -> None:
    """After a fatal error keep answering health checks with ENGINE_DEAD and
    notify subscribers (reference engine.py:101-105,337-342)."""
    deadline = time.monotonic() + 30
    out.send_multipart([b"__dead__", reason.encode()])
    while time.monotonic() < deadline:
        if health.poll(timeout=100):
            health.recv()
            health.send(ENGINE_DEAD + b":" + reason.encode())


class MQLLMEngineClient:
    """Client half: submits requests, streams outputs, checks health."""

    def __init__(self, input_addr: str, output_addr: str, health_addr: str):
        self.ctx = zmq.Context()
        self.inp = self.ctx.socket(zmq.PUSH)
        self.inp.connect(input_addr)
        self.out = self.ctx.socket(zmq.SUB)
        self.out.connect(output_addr)
        self.out.setsockopt(zmq.SUBSCRIBE, b"")
        self._health_addr = health_addr
        self._next_id = 0
        self._dead_reason: Optional[str] = None

    def check_health(self, timeout_ms: int = 5000) -> bool:
        """Returns True when healthy, False when unreachable (e.g. still
        starting); raises MQEngineDeadError when the engine reported death.

        A fresh REQ socket per probe: a timed-out REQ is stuck in its state
        machine and would silently break every later probe.
        """
        sock = self.ctx.socket(zmq.REQ)
        sock.setsockopt(zmq.LINGER, 0)
        try:
            sock.connect(self._health_addr)
            sock.send(b"ping")
            if not sock.poll(timeout=timeout_ms):
                return False
            resp = sock.recv()
        finally:
            sock.close(0)
        if resp.startswith(ENGINE_DEAD):
            self._dead_reason = resp.decode()
            raise MQEngineDeadError(self._dead_reason)
        return True

    def generate(self, prompt_token_ids: list, sampling_params,
                 timeout_s: float = 300.0, task: str = "generate",
                 lora_id: int = 0, prompt_embeds=None, mm_images=None,
                 image_token_id=None) -> Iterator[Any]:
        if self._dead_reason:
            raise MQEngineDeadError(self._dead_reason)
        rid = self._next_id
        self._next_id += 1
        self.inp.send(pickle.dumps(RPCGenerateRequest(
            rid, prompt_token_ids, sampling_params, task=task,
            lora_id=lora_id, prompt_embeds=prompt_embeds,
            mm_images=mm_images, image_token_id=image_token_id)))
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if not self.out.poll(timeout=1000):
                continue
            topic, payload = self.out.recv_multipart()
            if topic == b"__dead__":
                self._dead_reason = payload.decode()
                raise MQEngineDeadError(self._dead_reason)
            if int(topic) != rid:
                continue
            output = pickle.loads(payload)
            yield output
            if output.finished:
                return
        raise TimeoutError(f"request {rid} timed out")

    def abort(self, request_id: int) -> None:
        self.inp.send(pickle.dumps(RPCAbortRequest(request_id)))

    def shutdown_engine(self) -> None:
        self.inp.send(pickle.dumps("SHUTDOWN"))

    def close(self) -> None:
        for s in (self.inp, self.out):
            s.close(0)
        self.ctx.term()


def start_mq_engine(engine_factory, base_path: str = None):
    """Fork the engine process; returns (client, process).

    engine_factory must be picklable (a module-level function or partial).
    """
    import os
    import tempfile

    base = base_path or tempfile.mkdtemp(prefix="qspec_mq_")
    addrs = tuple(f"ipc://{os.path.join(base, n)}" for n in
                  ("input", "output", "health"))
    proc = mp.get_context("spawn").Process(
        target=run_mq_engine,
        args=(pickle.dumps(engine_factory),) + addrs,
        daemon=True)
    proc.start()
    client = MQLLMEngineClient(*addrs)
    return client, proc
