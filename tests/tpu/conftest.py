"""On-chip test tier (reference tests/tpu/, .buildkite/run-tpu-test.sh).

Run with:

    QSPEC_TPU_TESTS=1 python -m pytest tests/tpu -m tpu -q -p no:xdist

Without QSPEC_TPU_TESTS=1 the parent conftest forces the CPU platform and
every test here auto-skips, so the default `pytest tests/` stays CPU-only.
Only one process may hold the chip — never run this tier in parallel with
another TPU process.
"""

import jax
import pytest


def _on_tpu() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


ON_TPU = _on_tpu()


def pytest_collection_modifyitems(config, items):
    # NB: this hook sees the WHOLE session's items — gate on the marker
    skip = pytest.mark.skip(reason="needs the real TPU chip "
                            "(QSPEC_TPU_TESTS=1, JAX_PLATFORMS=axon)")
    for item in items:
        if "tpu" in item.keywords and not ON_TPU:
            item.add_marker(skip)
