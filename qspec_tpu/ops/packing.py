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


BIAS32 = 0x08080808  # excess-8 bias replicated per byte
MASK32 = 0x0F0F0F0F


def pack_int4(w: jnp.ndarray) -> jnp.ndarray:
    """Pack int4 values (range [-8, 7]) along axis 0, SWAR-word layout.

    ``w``: [in, out] integer array -> int32 [in // 8, out]. Each 32-bit word
    holds 8 nibbles: byte b (little-endian) of word row s is "packed row"
    r = 4*s + b, whose low nibble is w[r] and high nibble w[r + in//2]
    (halves pairing), both stored **excess-8** (v + 8, range [0, 15]).

    Rationale: a Pallas kernel extracts both nibble planes of FOUR bytes with
    two and/shift ops per word and `pltpu.bitcast` to int8 (which expands a
    word into 4 consecutive sublanes — verified little-endian byte order),
    instead of ~20 int32-lane ops per byte. The excess-8 bias makes sign
    recovery a plain subtract (no borrow across SWAR bytes).
    """
    if w.shape[0] % 8 != 0:
        raise ValueError(f"in-dim must be divisible by 8, got {w.shape}")
    half = w.shape[0] // 2
    w = jnp.asarray(w, jnp.int32)
    lo = (w[:half] + 8) & 0x0F
    hi = (w[half:] + 8) & 0x0F
    byte = (hi << 4) | lo                      # [in//2, out] values 0..255
    b0, b1, b2, b3 = byte[0::4], byte[1::4], byte[2::4], byte[3::4]
    word = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    return word.astype(jnp.int32)


def unpack_int4_low(packed: jnp.ndarray) -> jnp.ndarray:
    """Low-nibble plane as int8: in-positions [0, in//2). jnp reference of
    the kernel's SWAR extraction (shapes: int32 [in//8, out] -> [in//2, out])."""
    u = packed.astype(jnp.uint32)
    vals = []
    for b in range(4):
        nib = (u >> (8 * b)) & 0x0F
        vals.append(nib.astype(jnp.int32) - 8)
    out = jnp.stack(vals, axis=1)              # [in//8, 4, out]
    return out.reshape(packed.shape[0] * 4, packed.shape[1]).astype(jnp.int8)


def unpack_int4_high(packed: jnp.ndarray) -> jnp.ndarray:
    """High-nibble plane as int8: in-positions [in//2, in)."""
    u = packed.astype(jnp.uint32)
    vals = []
    for b in range(4):
        nib = (u >> (8 * b + 4)) & 0x0F
        vals.append(nib.astype(jnp.int32) - 8)
    out = jnp.stack(vals, axis=1)
    return out.reshape(packed.shape[0] * 4, packed.shape[1]).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`. int32 [in//8, out] -> int8 [in, out]."""
    return jnp.concatenate([unpack_int4_low(packed), unpack_int4_high(packed)], axis=0)


def pack_int4_np(w: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`pack_int4` for checkpoint-conversion tooling."""
    assert w.shape[0] % 8 == 0, w.shape
    half = w.shape[0] // 2
    w = w.astype(np.int64)
    lo = (w[:half] + 8) & 0x0F
    hi = (w[half:] + 8) & 0x0F
    byte = (hi << 4) | lo
    word = (byte[0::4] | (byte[1::4] << 8) | (byte[2::4] << 16)
            | (byte[3::4] << 24))
    return word.astype(np.uint32).view(np.int32)


def unpack_int4_np(packed: np.ndarray) -> np.ndarray:
    u = packed.view(np.uint32).astype(np.uint64)
    halves = []
    for shift0 in (0, 4):  # low plane, high plane
        vals = [((u >> (8 * b + shift0)) & 0x0F).astype(np.int64) - 8
                for b in range(4)]
        out = np.stack(vals, axis=1).reshape(packed.shape[0] * 4,
                                             packed.shape[1])
        halves.append(out)
    return np.concatenate(halves, axis=0).astype(np.int8)


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


def quantize_weight_int8(w: np.ndarray):
    """Symmetric per-output-channel int8 quantization (for the lm_head).

    ``w``: [in, out] float array -> (int8 [in, out], scales float32 [out]).
    """
    absmax = np.abs(w).max(axis=0, keepdims=True)
    scale = np.maximum(absmax, 1e-8) / 127.0
    q = np.clip(np.rint(w / scale), -128, 127).astype(np.int8)
    return q, scale.squeeze(0).astype(np.float32)


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
