"""Multi-host control plane: 2-process SPMD run equals the 1-process run.

Reference analogue: .buildkite/run-multi-node-test.sh (containers on one
host) + tests/utils.py compare_two_settings — here two CPU processes with 4
virtual devices each form one global 8-device mesh, and the lockstep
MultiHostEngine must produce the same greedy outputs as the same engine on
a single process with 8 local devices.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import pytest

from tests.parallel import mh_worker


def _free_port() -> str:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


def _single_process_reference():
    from qspec_tpu.parallel.tp import make_mesh
    from qspec_tpu.sampling_params import SamplingParams

    eng = mh_worker.build_engine(make_mesh(tp_size=8))
    for p in mh_worker.make_prompts():
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=8,
                                          ignore_eos=True))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[str(o.request_id)] = o.output_token_ids
    return outs


@pytest.mark.slow
def test_two_process_engine_matches_single_process():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ref = _single_process_reference()
    assert len(ref) == 3 and all(len(v) == 8 for v in ref.values())

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    # prepend the repo (python puts the script dir, not cwd, on sys.path);
    # keep the existing entries — the axon sitecustomize lives there
    env["PYTHONPATH"] = "/root/repo" + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    procs = [subprocess.Popen([sys.executable, worker, str(i), "2", port],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env, cwd="/root/repo", text=True)
             for i in range(2)]
    try:
        out0, err0 = procs[0].communicate(timeout=600)
        out1, err1 = procs[1].communicate(timeout=600)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    assert procs[0].returncode == 0, f"head failed:\n{err0[-2000:]}"
    assert procs[1].returncode == 0, f"follower failed:\n{err1[-2000:]}"

    line = [l for l in out0.splitlines() if l.startswith("{")][-1]
    got = json.loads(line)["outputs"]
    assert got == ref
