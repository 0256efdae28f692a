"""Benchmark harness smoke tests (tiny model, CPU)."""

import json
import subprocess
import sys

import pytest


def _run(args, timeout=240):
    res = subprocess.run([sys.executable] + args, capture_output=True,
                         timeout=timeout, cwd="/root/repo",
                         env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                              "PYTHONPATH": "/root/repo",
                              "HOME": "/root"})
    assert res.returncode == 0, res.stderr.decode()[-2000:]
    last = res.stdout.decode().strip().splitlines()[-1]
    return json.loads(last)


def test_bench_quick():
    out = _run(["bench.py", "--quick", "--prompts", "2", "--max-tokens", "6"])
    assert out["metric"] == "accepted_tokens_per_sec"
    assert out["value"] > 0 and out["vs_baseline"] > 0


def test_benchmark_latency():
    out = _run(["benchmarks/benchmark_latency.py", "--model", "tiny",
                "--input-len", "8", "--output-len", "4", "--batch-size", "2",
                "--num-iters", "1"])
    assert out["avg_latency_s"] > 0 and out["tokens_per_s"] > 0


def test_benchmark_throughput():
    out = _run(["benchmarks/benchmark_throughput.py", "--model", "tiny",
                "--num-prompts", "3", "--input-len-mean", "12",
                "--output-len-mean", "4", "--max-num-seqs", "2"])
    assert out["output_tokens_per_s"] > 0 and out["requests_per_s"] > 0


def test_conversation_templates():
    from qspec_tpu.conversation import get_conv_template

    conv = get_conv_template("llama-3")
    conv.system_message = "be brief"
    conv.append_message("user", "hi")
    conv.append_message("assistant", None)
    p = conv.get_prompt()
    assert p.startswith("<|begin_of_text|>")
    assert "<|start_header_id|>user<|end_header_id|>" in p
    assert p.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")

    conv = get_conv_template("qwen-7b-chat")
    conv.append_message("user", "hello")
    conv.append_message("assistant", None)
    p = conv.get_prompt()
    assert "<|im_start|>user\nhello<|im_end|>" in p
    assert p.endswith("<|im_start|>assistant\n")
