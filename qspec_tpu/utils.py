"""Small shared utilities (reference: vllm/utils.py, much slimmed)."""

from __future__ import annotations

import os

_CACHE_ENABLED = False


def enable_persistent_compile_cache(path: str = None) -> None:
    """Persistent XLA compilation cache across processes.

    The TPU analogue of BitBLAS's on-disk operator cache that the reference
    relies on to amortize its 5-10 min first-run tuning
    (README.md:74, quarot_nn/linear.py:192-205). First compile of each step
    function is expensive (minutes through a remote compile service); every
    later process reuses the artifacts.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        return
    if backend == "cpu" and not os.environ.get("QSPEC_COMPILE_CACHE"):
        # CPU-only processes (tests) skip the cache: jaxlib's XLA:CPU
        # executable serializer can SEGFAULT in put_executable_and_time,
        # and CPU compiles are cheap anyway. The cache exists for the
        # minutes-long remote TPU compiles.
        return

    cache_dir = path or os.environ.get("QSPEC_COMPILE_CACHE",
                                       os.path.expanduser("~/.cache/qspec_tpu/xla"))
    # Salt the directory with a host-CPU fingerprint: XLA:CPU AOT artifacts
    # target the exact feature set of the machine that compiled them, and
    # loading one compiled on a different host SIGSEGVs mid-run ("Compile
    # machine features ... vs host machine features" warning). A per-
    # fingerprint subdir makes a moved cache directory a miss, not a crash.
    try:
        import hashlib
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
        cache_dir = os.path.join(cache_dir,
                                 hashlib.sha1(flags.encode()).hexdigest()[:12])
    except OSError:
        pass
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _CACHE_ENABLED = True
    except Exception:
        pass


class Counter:
    def __init__(self, start: int = 0):
        self._v = start

    def __next__(self) -> int:
        v = self._v
        self._v += 1
        return v


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
