"""Environment report for bug reports (reference: collect_env.py)."""

from __future__ import annotations

import platform
import sys


def main():
    print(f"python: {sys.version.split()[0]} ({platform.platform()})")
    for mod in ("jax", "jaxlib", "numpy", "flax", "optax", "transformers"):
        try:
            m = __import__(mod)
            print(f"{mod}: {getattr(m, '__version__', '?')}")
        except ImportError:
            print(f"{mod}: not installed")
    try:
        import jax
        print(f"jax backend: {jax.default_backend()}")
        print(f"devices: {jax.devices()}")
        print(f"device count: {jax.device_count()} "
              f"(local {jax.local_device_count()})")
    except Exception as e:
        print(f"jax device init failed: {e}")
    try:
        from qspec_tpu import _native
        print(f"qspec_tpu native host ops: {'built' if _native.AVAILABLE else 'missing'}")
        import qspec_tpu
        print(f"qspec_tpu: {qspec_tpu.__version__}")
    except Exception as e:
        print(f"qspec_tpu import failed: {e}")


if __name__ == "__main__":
    main()
