"""CLI entry points (reference: vllm/scripts.py — `vllm serve` etc.).

    python -m qspec_tpu.scripts serve --model llama3-8b --port 8000
    python -m qspec_tpu.scripts bench --quick
    python -m qspec_tpu.scripts demo --prompts 8
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="qspec-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    serve = sub.add_parser("serve", help="OpenAI-compatible server")
    serve.add_argument("--host", default="0.0.0.0")
    serve.add_argument("--port", type=int, default=8000)
    from qspec_tpu.engine.arg_utils import EngineArgs
    EngineArgs.add_cli_args(serve)

    bench = sub.add_parser("bench", help="A/B throughput benchmark")
    bench.add_argument("rest", nargs=argparse.REMAINDER)

    demo = sub.add_parser("demo", help="QSpec demo driver (reference demo.py)")
    demo.add_argument("rest", nargs=argparse.REMAINDER)

    args = parser.parse_args(argv)
    if args.cmd == "serve":
        from qspec_tpu.entrypoints.openai.api_server import build_server
        from aiohttp import web
        server = build_server(EngineArgs.from_cli_args(args))
        web.run_app(server.app(), host=args.host, port=args.port)
    elif args.cmd == "bench":
        import runpy
        sys.argv = ["bench.py"] + args.rest
        runpy.run_path("bench.py", run_name="__main__")
    elif args.cmd == "demo":
        import runpy
        sys.argv = ["demo.py"] + args.rest
        runpy.run_path("demo.py", run_name="__main__")


if __name__ == "__main__":
    main()
