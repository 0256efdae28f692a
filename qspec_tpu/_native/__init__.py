"""Native host-ops loader: builds csrc/host_ops.cpp on first use.

Mirrors the reference's compiled-extension pattern (csrc/ -> torch.ops._C,
vllm/_custom_ops.py) for the host-side runtime: if the extension isn't built
yet, compile it in-place with the system toolchain; importers fall back to
pure-Python implementations when unavailable (AVAILABLE == False).
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_here = os.path.dirname(__file__)
_root = os.path.dirname(os.path.dirname(_here))

AVAILABLE = False
chain_hash = None
hash_prompt_pages = None
ngram_propose = None
build_slot_mapping = None


def _try_import() -> bool:
    global AVAILABLE, chain_hash, hash_prompt_pages, ngram_propose, build_slot_mapping
    try:
        from qspec_tpu._native import _host_ops  # type: ignore
    except ImportError:
        return False
    AVAILABLE = True
    chain_hash = _host_ops.chain_hash
    hash_prompt_pages = _host_ops.hash_prompt_pages
    ngram_propose = _host_ops.ngram_propose
    build_slot_mapping = _host_ops.build_slot_mapping
    return True


def build(verbose: bool = False) -> bool:
    """Compile csrc/host_ops.cpp into this package directory."""
    src = os.path.join(_root, "csrc", "host_ops.cpp")
    if not os.path.exists(src):
        return False
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_here, "_host_ops" + ext)
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           f"-I{include}", src, "-o", out]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0:
            if verbose:
                print(res.stderr.decode())
            return False
    except Exception:
        return False
    return _try_import()


if not _try_import():
    build()
