"""Activation quantization ops (jnp reference semantics).

Matches the reference's symmetric per-token quantizers:
  - int4: scale = absmax / 7, values round-to-nearest clamped to [-8, 7]
    (QuaRot `sym_quant` / `fuse_sym_quant`,
     /root/reference/third-party/QuaRot/quarot/kernels/quant.cu:103-185,
     clip_ratio = 1.0 in all QSpec uses).
  - int8: scale = absmax / 127, clamp [-128, 127]
    (quant.cu:189-244; qserve layernorm_kernels.cu:326-341).

On TPU the int4 values are *not* nibble-packed for activations: the draft
GEMM feeds them straight to the MXU as int8 (the MXU consumes int4 via the
int8 path), so packing activations would only add unpack work. Weights stay
packed (see packing.py) because they are the HBM-resident, bandwidth-bound
side.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class QuantizedActivation(NamedTuple):
    """TPU analogue of quarot.PackedQuantizedTensor: int values + per-token scale."""

    values: jnp.ndarray  # int8, [..., hidden] (int4 range for w4a4)
    scales: jnp.ndarray  # float32, [..., 1]


def sym_quant_int4(x: jnp.ndarray) -> QuantizedActivation:
    """Per-token symmetric int4 quantization (absmax/7)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -8, 7).astype(jnp.int8)
    return QuantizedActivation(q, scale)


def sym_quant_int8(x: jnp.ndarray) -> QuantizedActivation:
    """Per-token symmetric int8 quantization (absmax/127)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127).astype(jnp.int8)
    return QuantizedActivation(q, scale)


def sym_dequant(q: QuantizedActivation, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.values.astype(jnp.float32) * q.scales).astype(dtype)
