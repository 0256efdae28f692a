"""Fused RMSNorm -> per-token quantization, TPU-native.

Replaces the reference's `qserve_backend.layernorm_ops.rms_norm_general_fuse_
sum_{i4,i8,fp16}` CUDA kernels (third-party/kernels/csrc/layernorm_kernels.cu;
used by quarot_nn.RMSNorm, /root/reference/vllm/model_executor/layers/
quarot_nn/normalization.py:35-105). Semantics:

* The QuaRot model's RMSNorms are **weightless** — the gamma vector is fused
  into adjacent quantized weights offline, so the live kernel only normalizes
  (layernorm.cpp:32-38 takes no weight for the _i4/_fp16 variants).
* int4 fused path: y = x * rsqrt(mean(x^2) + eps); per-token scale =
  absmax(y)/7; q = clamp(round(y/scale), -8, 7). Also emits sum(y) per token
  (``input_sum``, consumed by the w4a8 zero-point correction).
* int8 path: same with absmax/127, clamp [-128, 127].

One Pallas kernel does norm + absmax + quant in a single VMEM pass; a gamma-
bearing variant serves non-QuaRot (plain bf16) models.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qspec_tpu.ops._kernel_utils import interpret_mode, pad_dim, round_up
from qspec_tpu.ops.quant import QuantizedActivation

# ---------------------------------------------------------------------------
# jnp references
# ---------------------------------------------------------------------------


def rmsnorm_ref(x: jnp.ndarray, gamma: Optional[jnp.ndarray] = None,
                eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma.astype(jnp.float32)
    return y.astype(x.dtype)


def rmsnorm_quant_ref(x: jnp.ndarray, gamma: Optional[jnp.ndarray] = None,
                      eps: float = 1e-5, bits: int = 4) -> QuantizedActivation:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma.astype(jnp.float32)
    qmax = 7.0 if bits == 4 else 127.0
    lo = -8 if bits == 4 else -128
    absmax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / qmax
    q = jnp.clip(jnp.round(y / scale), lo, qmax).astype(jnp.int8)
    return QuantizedActivation(q, scale)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _rmsnorm_quant_kernel(x_ref, q_ref, s_ref, *, eps, hidden, qmax, qmin):
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) * (1.0 / hidden)
    y = xf * jax.lax.rsqrt(var + eps)
    absmax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) * (1.0 / qmax)
    q_ref[:] = jnp.clip(jnp.round(y / scale), qmin, qmax).astype(jnp.int8)
    s_ref[:] = scale


def _rmsnorm_kernel(x_ref, g_ref, o_ref, *, eps, hidden):
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) * (1.0 / hidden)
    y = xf * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * g_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "bits"))
def rmsnorm_quant(x: jnp.ndarray, eps: float = 1e-5, bits: int = 4) -> QuantizedActivation:
    """Weightless fused rmsnorm + per-token symmetric quant. x: [M, H].

    Small batches take the jnp path: XLA fuses it into neighbouring ops,
    which beats a separate Pallas launch at decode sizes. The Pallas kernel
    pays off once the activation block is prefill-sized.
    """
    m, h = x.shape
    if m <= 64:
        return rmsnorm_quant_ref(x, eps=eps, bits=bits)
    m_pad = round_up(max(m, 8), 8)
    xp = pad_dim(x, 0, m_pad)
    qmax = 7.0 if bits == 4 else 127.0
    qmin = -8.0 if bits == 4 else -128.0
    bm = min(m_pad, 256)
    while m_pad % bm:
        bm //= 2
    q, s = pl.pallas_call(
        functools.partial(_rmsnorm_quant_kernel, eps=eps, hidden=h, qmax=qmax, qmin=qmin),
        grid=(m_pad // bm,),
        in_specs=[pl.BlockSpec((bm, h), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bm, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, h), jnp.int8),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(xp)
    return QuantizedActivation(q[:m], s[:m])


@functools.partial(jax.jit, static_argnames=("eps",))
def rmsnorm(x: jnp.ndarray, gamma: Optional[jnp.ndarray] = None,
            eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm (optionally gamma-scaled), fused Pallas pass. x: [M, H]."""
    m, h = x.shape
    if m <= 64:
        return rmsnorm_ref(x, gamma, eps=eps)
    if gamma is None:
        gamma = jnp.ones((h,), x.dtype)
    m_pad = round_up(max(m, 8), 8)
    xp = pad_dim(x, 0, m_pad)
    bm = min(m_pad, 256)
    while m_pad % bm:
        bm //= 2
    out = pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps, hidden=h),
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, h), x.dtype),
        interpret=interpret_mode(),
    )(xp, gamma.reshape(1, h))
    return out[:m]
