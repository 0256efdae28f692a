"""Environment-variable configuration tier (reference: vllm/envs.py).

Every knob has exactly one typed accessor here; modules read
``qspec_tpu.envs.FOO`` (module __getattr__, evaluated at access time so
tests can monkeypatch os.environ). CLI flags > env vars > defaults, as in
the reference: EngineArgs consult these for defaults only.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional


def _bool(name: str, default: bool) -> Callable[[], bool]:
    return lambda: os.environ.get(name, "1" if default else "0").lower() in (
        "1", "true", "yes", "on")


def _int(name: str, default: int) -> Callable[[], int]:
    return lambda: int(os.environ.get(name, default))


def _float(name: str, default: float) -> Callable[[], float]:
    return lambda: float(os.environ.get(name, default))


def _str(name: str, default: Optional[str]) -> Callable[[], Optional[str]]:
    return lambda: os.environ.get(name, default)


# name -> thunk (evaluated on attribute access)
environment_variables: Dict[str, Callable[[], Any]] = {
    # comma-separated allowlist of plugin names; None = load all
    "QSPEC_PLUGINS": _str("QSPEC_PLUGINS", None),
    # serving
    "QSPEC_HOST": _str("QSPEC_HOST", "0.0.0.0"),
    "QSPEC_PORT": _int("QSPEC_PORT", 8000),
    "QSPEC_API_KEY": _str("QSPEC_API_KEY", None),
    # engine defaults (CLI flags win)
    "QSPEC_KV_CACHE_DTYPE": _str("QSPEC_KV_CACHE_DTYPE", None),
    "QSPEC_GPU_MEMORY_UTILIZATION": _float("QSPEC_GPU_MEMORY_UTILIZATION", 0.9),
    "QSPEC_ENABLE_PREFIX_CACHING": _bool("QSPEC_ENABLE_PREFIX_CACHING", True),
    # observability
    "QSPEC_OTLP_ENDPOINT": _str("QSPEC_OTLP_ENDPOINT", None),
    "QSPEC_LOG_STATS_INTERVAL": _float("QSPEC_LOG_STATS_INTERVAL", 10.0),
    # XLA compile cache directory
    "QSPEC_CACHE_DIR": _str(
        "QSPEC_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "qspec_tpu")),
    # test / CI toggles
    "QSPEC_TPU_TESTS": _bool("QSPEC_TPU_TESTS", False),
}


def __getattr__(name: str) -> Any:
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return list(environment_variables)
