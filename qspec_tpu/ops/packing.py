"""Packed-int4 weight representation for TPU.

A quantized linear layer's weight is stored once in HBM as two's-complement
int4 nibbles packed two-per-byte (uint8), plus a per-output-channel scale.
Both the W4A4 draft path and the W4A16 verify path read this single buffer —
this is the property that makes QSpec's scheme switching free (reference:
/root/reference/vllm/model_executor/layers/quarot_nn/linear.py:28-124, which
keeps one `weight` uint8 buffer of shape [out, in//2] serving both
`forward_w4a4` and `forward_w4a16`).

TPU-native layout choices (vs the reference's [out, in//2] CUDA layout):

* We pack along the *contraction* (in) dimension and store the packed array
  as ``[in // 2, out]`` so the out dimension lies on the 128-wide lane axis.
* **Halves pairing**: byte row ``r`` holds the int4 value for in-position
  ``r`` in its low nibble and in-position ``r + in//2`` in its high nibble.
  Unpacking inside a matmul kernel then needs *no* sublane interleave (an
  expensive relayout on TPU): the low-nibble plane multiplies the first half
  of the activation's contraction dim and the high-nibble plane the second
  half, as two independent MXU dots.

Values are two's complement int4 (range [-8, 7]).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_int4(w: jnp.ndarray) -> jnp.ndarray:
    """Pack int4-valued (range [-8, 7]) array along axis 0, halves pairing.

    ``w``: [in, out] integer array. Returns uint8 [in // 2, out] where row r
    = (low: w[r], high: w[r + in//2]).
    """
    if w.shape[0] % 2 != 0:
        raise ValueError(f"in-dim must be even to pack, got {w.shape}")
    half = w.shape[0] // 2
    w = jnp.asarray(w, jnp.int8)
    lo = w[:half] & 0x0F
    hi = w[half:] & 0x0F
    return ((hi << 4) | lo).astype(jnp.uint8)


def unpack_int4_low(packed: jnp.ndarray) -> jnp.ndarray:
    """Low-nibble plane as int8: in-positions [0, in//2).

    Arithmetic is done in int32 (the VPU's native lane width — Mosaic has no
    sub-word vector shifts) with a select for sign extension.
    """
    b = packed.astype(jnp.int32)
    lo = b & 0x0F
    return jnp.where(lo < 8, lo, lo - 16).astype(jnp.int8)


def unpack_int4_high(packed: jnp.ndarray) -> jnp.ndarray:
    """High-nibble plane as int8: in-positions [in//2, in)."""
    hi = jnp.right_shift(packed.astype(jnp.int32), 4)
    return jnp.where(hi < 8, hi, hi - 16).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`. uint8 [in//2, out] -> int8 [in, out]."""
    return jnp.concatenate([unpack_int4_low(packed), unpack_int4_high(packed)], axis=0)


def pack_int4_np(w: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`pack_int4` for checkpoint-conversion tooling."""
    assert w.shape[0] % 2 == 0
    half = w.shape[0] // 2
    w = w.astype(np.int8)
    lo = w[:half] & 0x0F
    hi = w[half:] & 0x0F
    return ((hi << 4) | lo).astype(np.uint8)


def unpack_int4_np(packed: np.ndarray) -> np.ndarray:
    b = packed.astype(np.int32)
    lo = b & 0x0F
    lo = np.where(lo < 8, lo, lo - 16)
    hi = b >> 4
    hi = np.where(hi < 8, hi, hi - 16)
    return np.concatenate([lo, hi], axis=0).astype(np.int8)


def quantize_weight_int4(w: np.ndarray):
    """Symmetric per-output-channel int4 quantization of a float weight.

    ``w``: [in, out] float array; one scale per output channel (axis 1),
    matching the reference's per-out-channel ``weight_scales``
    (quarot_nn/linear.py:37; `from_float` uses scale = absmax / 7, values
    clamped to [-8, 7]).

    Returns (packed uint8 [in//2, out], scales float32 [out]).
    """
    absmax = np.abs(w).max(axis=0, keepdims=True)
    scale = np.maximum(absmax, 1e-8) / 7.0
    q = np.clip(np.rint(w / scale), -8, 7).astype(np.int8)
    return pack_int4_np(q), scale.squeeze(0).astype(np.float32)


def repack_from_reference(ref_weight: np.ndarray) -> np.ndarray:
    """Convert a reference-layout packed weight to ours.

    Reference layout (quarot_nn/linear.py:38-40): uint8 [out, in//2], byte c
    holds in-position 2c (low) and 2c+1 (high), two's complement. Returns
    uint8 [in//2, out] in halves pairing.
    """
    b = ref_weight.astype(np.int32)
    lo = b & 0x0F
    lo = np.where(lo < 8, lo, lo - 16).astype(np.int8)   # [out, in//2] -> pos 2c
    hi = b >> 4
    hi = np.where(hi < 8, hi, hi - 16).astype(np.int8)   # pos 2c + 1
    unpacked = np.empty((ref_weight.shape[1] * 2, ref_weight.shape[0]), dtype=np.int8)
    unpacked[0::2] = lo.T
    unpacked[1::2] = hi.T
    return pack_int4_np(unpacked)
