"""Shared helpers for Pallas TPU kernels (dispatch, padding, tiling)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@functools.lru_cache(maxsize=None)
def backend_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (CPU tests)."""
    return not backend_is_tpu()


def pad_dim(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    """Zero-pad ``axis`` of ``x`` up to a multiple of ``multiple``."""
    size = x.shape[axis]
    target = round_up(size, multiple)
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)
