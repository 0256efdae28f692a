"""Multi-host SPMD control plane: one engine, N processes, lockstep steps.

TPU-native replacement for the reference's multi-node control plane
(vllm/distributed/parallel_state.py:984 init_distributed_environment +
executor/ray_gpu_executor.py RPC fan-out). On TPU pods there is no driver
that RPCs workers per step: JAX is multi-controller, so every host runs the
SAME program and jit/shard_map over a global mesh spans all chips, with XLA
emitting the ICI/DCN collectives. What remains to build — and what this
module provides — is the *request* plane:

  * process 0 (the head) owns the public engine API: callers add/abort
    requests and drive `step()` exactly like a single-host `LLMEngine`;
  * every step, the head broadcasts the batched control ops (add/abort)
    to all processes (`broadcast_one_to_all`, which rides the same
    collective fabric), so each process's scheduler — deterministic,
    insertion-ordered — reaches the identical schedule;
  * all processes then execute `engine.step()` together: the jitted SPMD
    step functions see identical replicated host inputs (token ids, block
    tables, sampling tensors) and globally-sharded params/KV, which is the
    invariant multi-controller JAX requires.

The engines must be constructed identically on every process (same config,
same `num_pages` — pass it explicitly rather than deriving it from local
HBM stats — and params from the same checkpoint/seed) over the same global
mesh. Validated by tests/parallel/test_multihost.py: 2 CPU processes x 4
virtual devices, TP=8 over the global mesh, outputs equal to the
single-process 8-device run (reference analogue:
.buildkite/run-multi-node-test.sh + tests/utils.py compare_two_settings).
"""

from __future__ import annotations

import pickle
from typing import List, Optional

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the multi-process runtime (reference
    init_distributed_environment, parallel_state.py:984). On a real TPU pod
    slice the three arguments come from the deployment environment (GKE/QR
    metadata); jax.distributed also supports fully-automatic discovery by
    calling with no arguments there."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis_names=("data", "model"), shape=None):
    """A mesh over ALL processes' devices (jax.devices() is global)."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    if shape is None:
        shape = (1, devs.size)
    return Mesh(devs.reshape(shape), axis_names)


def _broadcast_blob(payload: Optional[bytes]) -> bytes:
    """Broadcast a variable-length byte string from process 0 to all.

    broadcast_one_to_all requires identical shapes on every process, so a
    fixed int64 length header precedes the padded payload."""
    from jax.experimental import multihost_utils as mhu

    n = len(payload) if payload is not None else 0
    n = int(mhu.broadcast_one_to_all(np.int64(n)))
    buf = (np.frombuffer(payload, np.uint8) if payload is not None
           else np.zeros(n, np.uint8))
    if buf.size != n:  # follower passed stale/no payload
        buf = np.zeros(n, np.uint8)
    return mhu.broadcast_one_to_all(buf).tobytes()


class MultiHostEngine:
    """Lockstep driver wrapping one identically-constructed LLMEngine per
    process. The head exposes the LLMEngine API; followers run `serve()`."""

    def __init__(self, engine):
        import jax

        self.engine = engine
        self.process_index = jax.process_index()
        self.is_head = self.process_index == 0
        self._ops: List[tuple] = []
        self._next_id = 0

    # -- head-side API --------------------------------------------------
    def add_request(self, prompt_token_ids: List[int], sampling_params=None,
                    request_id: Optional[int] = None) -> int:
        assert self.is_head, "only the head process accepts requests"
        rid = request_id if request_id is not None else self._next_id
        self._next_id = max(self._next_id, rid + 1)
        self._ops.append(("add", rid, list(prompt_token_ids), sampling_params))
        return rid

    def abort_request(self, request_id: int) -> None:
        assert self.is_head
        self._ops.append(("abort", request_id))

    def has_unfinished_requests(self) -> bool:
        return bool(self._ops) or self.engine.has_unfinished_requests()

    def step(self):
        """Broadcast queued ops + a step opcode, then step every process."""
        assert self.is_head
        msg = ("step", self._ops)
        self._ops = []
        _broadcast_blob(pickle.dumps(msg))
        return self._apply(msg)

    def shutdown(self) -> None:
        assert self.is_head
        _broadcast_blob(pickle.dumps(("stop", [])))

    # -- follower loop ----------------------------------------------------
    def serve(self) -> None:
        """Run on every non-head process: mirror ops and step in lockstep
        until the head broadcasts stop."""
        assert not self.is_head
        while True:
            msg = pickle.loads(_broadcast_blob(None))
            if msg[0] == "stop":
                return
            self._apply(msg)

    # -- shared ----------------------------------------------------------
    def _apply(self, msg):
        for op in msg[1]:
            if op[0] == "add":
                _, rid, prompt, sp = op
                self.engine.add_request(prompt, sp, request_id=rid)
            elif op[0] == "abort":
                self.engine.abort_request(op[1])
        return self.engine.step()
