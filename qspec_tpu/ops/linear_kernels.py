"""Quantized matmul kernels: the two hot GEMMs of QSpec, as Pallas MXU kernels.

One packed-int4 weight buffer (see packing.py) serves both:

* ``matmul_w4a16`` — verify path: on-the-fly dequant int4 -> bf16 fused into
  a bf16 MXU matmul. TPU-native replacement for the reference's BitBLAS
  dequant GEMM (quarot_nn/linear.py:102-124 `forward_w4a16`).
* ``matmul_w4a4`` — draft path: int4-range int8 activations x int4 weights on
  the MXU int8 pipe with int32 accumulation and a rowwise (per-token) x
  columnwise (per-out-channel) scale epilogue. Replacement for the CUTLASS
  ``rowwise_scaled_linear_cutlass_s4s4_unified`` GEMM
  (quarot_nn/linear.py:67-84; third-party/ao .../rowwise_scaled_linear_cutlass).

Kernel structure (shared): grid (M/bm, N/bn) with a single pass over the
full contraction dim per step (every grid step independent — Mosaic
pipelines the next weight tile's DMA behind the current MXU work, the
structure XLA's own small-M matmul emitter uses). The SWAR weight tile
(packing.py) is expanded into its low/high nibble planes, which multiply the
first and second half of the activation's contraction dim (halves pairing —
no sublane interleave), with the excess-8 bias folded out via a rowsum
correction.

Stacked-layer mode: the model stores each projection's weights for ALL
layers as one [L, K//8, N] array and scans over layers. Passing the scanned
slice as a kernel operand makes XLA materialize a copy of the ~100 MB slab
every iteration (dynamic-slice into a custom-call operand cannot alias), a
measured 671 -> 411 GB/s cliff. Instead the kernels accept the full stacked
array plus a ``layer_idx`` scalar-prefetch argument and DMA tiles of layer
``layer_idx`` directly from HBM (same pattern as the paged-attention kernel
indexing the KV cache by layer) — measured back at 661 GB/s.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qspec_tpu.ops._kernel_utils import cdiv, interpret_mode, pad_dim, round_up
from qspec_tpu.ops.packing import unpack_int4, unpack_int4_high, unpack_int4_low

# ---------------------------------------------------------------------------
# jnp reference implementations (ground truth for tests; CPU fallback)
# ---------------------------------------------------------------------------


def matmul_w4a16_ref(x: jnp.ndarray, w_packed: jnp.ndarray, w_scales: jnp.ndarray,
                     bias: Optional[jnp.ndarray] = None, *,
                     out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dequantize-to-bf16 matmul: x [M,K] bf16, w_packed [K//2,N], scales [N]."""
    w = unpack_int4(w_packed).astype(jnp.bfloat16)
    out = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    out = out * w_scales.astype(jnp.float32)[None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.astype(out_dtype)


def matmul_w8a16_ref(x: jnp.ndarray, w_q: jnp.ndarray, w_scales: jnp.ndarray,
                     bias: Optional[jnp.ndarray] = None, *,
                     out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dequantize-int8-to-bf16 matmul: x [M,K] bf16, w_q [K,N] int8, scales [N].

    Used for the quantized lm_head (vocab projection): at decode M the dense
    bf16 head is HBM-bound at ~1 GB/step for Llama-3's 128k vocab; int8
    halves the bytes at near-zero quality cost (per-channel symmetric,
    QServe-style W8 head).
    """
    w = w_q.astype(jnp.bfloat16)
    out = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    out = out * w_scales.astype(jnp.float32)[None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.astype(out_dtype)


def matmul_w4a16_g_ref(x: jnp.ndarray, w_packed: jnp.ndarray,
                       w_scales_g: jnp.ndarray, w_offs_g: jnp.ndarray,
                       bias: Optional[jnp.ndarray] = None, *,
                       out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """GROUP-quantized dequant matmul (AWQ/GPTQ checkpoints).

    Storage trick: the packer stores ``q_unsigned - 8`` in the excess-8
    nibble format, so the stored nibble IS the original unsigned value
    q in [0, 15]; dequant is then w = q*s - zp*s with per-(group, channel)
    scales ``w_scales_g`` [K//g, N] and precomputed offsets
    ``w_offs_g = zp * s`` [K//g, N] (model_loader/grouped.py).

    x [M, K] bf16, w_packed [K//8, N] int32 -> [M, N].
    """
    K = 8 * w_packed.shape[-2]
    G = w_scales_g.shape[-2]
    g = K // G
    u = (unpack_int4(w_packed).astype(jnp.float32) + 8.0)   # back to q
    s = jnp.repeat(w_scales_g.astype(jnp.float32), g, axis=0)
    o = jnp.repeat(w_offs_g.astype(jnp.float32), g, axis=0)
    w = (u * s - o).astype(jnp.bfloat16)
    out = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.astype(out_dtype)


def matmul_w4a4_ref(x_q: jnp.ndarray, x_scales: jnp.ndarray, w_packed: jnp.ndarray,
                    w_scales: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Int4 x int4 matmul with rowwise x columnwise rescale.

    x_q [M,K] int8 (int4 range), x_scales [M] or [M,1], w_packed [K//2,N],
    w_scales [N]. Output bf16 [M,N].
    """
    w = unpack_int4(w_packed)
    acc = jax.lax.dot_general(x_q, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * x_scales.reshape(-1, 1).astype(jnp.float32)
    out = out * w_scales.astype(jnp.float32)[None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _swar_planes(w32):
    """Extract excess-8 nibble planes from SWAR words (see packing.pack_int4):
    int32 [R, bn] -> two int8 [4R, bn] arrays with values in [0, 15]."""
    from qspec_tpu.ops.packing import MASK32
    lo = pltpu.bitcast(w32 & MASK32, jnp.int8)
    hi = pltpu.bitcast(jnp.right_shift(w32, 4) & MASK32, jnp.int8)
    return lo, hi


def _w4a16_kernel(x_lo_ref, x_hi_ref, w_ref, s_ref, out_ref):
    """Single pass over the full contraction dim; grid over N tiles only.

    No accumulator scratch or k-step revisits — each grid step is
    independent, so Mosaic pipelines the next weight tile's DMA behind this
    tile's MXU work (the structure XLA's own small-M matmul emitter uses,
    which measures at the HBM floor)."""
    lo_u, hi_u = _swar_planes(w_ref[:])
    x_lo = x_lo_ref[:]
    x_hi = x_hi_ref[:]
    # weights stored excess-8: dot(x, u - 8) = dot(x, u) - 8 * rowsum(x)
    acc = jnp.dot(x_lo, lo_u.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi, hi_u.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    rowsum = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True) + \
        jnp.sum(x_hi.astype(jnp.float32), axis=1, keepdims=True)
    out_ref[:] = ((acc - 8.0 * rowsum)
                  * s_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _w4a4_kernel(x_lo_ref, x_hi_ref, sx_ref, w_ref, sw_ref, out_ref):
    lo_u, hi_u = _swar_planes(w_ref[:])
    x_lo = x_lo_ref[:]
    x_hi = x_hi_ref[:]
    acc = jax.lax.dot_general(x_lo, lo_u, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(x_hi, hi_u, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    rowsum = (jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
              + jnp.sum(x_hi.astype(jnp.int32), axis=1, keepdims=True))
    out = (acc - 8 * rowsum).astype(jnp.float32)
    out = out * sx_ref[:].astype(jnp.float32)          # [M, 1] per-token
    out = out * sw_ref[:].astype(jnp.float32)          # [1, bn] per-channel
    out_ref[:] = out.astype(out_ref.dtype)


def _choose_bn(m: int, k_half: int, n: int, x_bytes: int):
    """N-tile width: full-K weight tile (k_half bytes per column) plus the
    whole activation must fit comfortably in VMEM (~10 MB with double
    buffering headroom).

    Mosaic requires the last block dim to be a multiple of 128 (or equal to
    the whole array dim), so only 128-multiple divisors of n are candidates
    (a plain halving loop produced e.g. 1536 -> 192, which compiles on CPU
    interpret but is rejected by the TPU lowering)."""
    cands = [c for c in range(128, min(n, 2048) + 1, 128) if n % c == 0]
    if not cands:
        return n  # n < 128 or no 128-multiple divisor: one full-width tile
    budget = 10 * 1024 * 1024 - 2 * m * k_half * x_bytes
    fit = [c for c in cands if 2 * k_half * c <= budget]
    bn = max(fit) if fit else cands[0]
    # deepen short grids: small-N shapes (qkv/o) at 2-3 tiles leave the
    # first tile's DMA exposed and the pipeline shallow; >=8 stages measured
    # ~10-20% faster on chip for N <= 8k
    deeper = [c for c in fit if n // c >= 8]
    if deeper:
        bn = max(deeper)
    return bn


def _choose_bm(m_pad: int, x_row_bytes: int):
    """M tiling: ONE M tile whenever the whole (padded) activation block
    fits VMEM comfortably. The weight-side BlockSpecs ignore the M grid
    index, so every ADDITIONAL M tile re-streams the full weight array
    from HBM — catastrophic at spec-verify widths (M=144 degenerated to
    bm=16 and streamed an 8B layer's weights 9x per call, measured ~30
    AR-steps per verify). When the activation is too large (prefill
    rectangles), fall back to 128-row tiles with m_pad rounded up so bm
    never drops below 128 (at bm=128 each weight stream amortizes over
    128 rows and the kernel is MXU-bound, not HBM-bound).

    Returns (m_pad, bm)."""
    if m_pad * x_row_bytes <= 5 * 1024 * 1024:
        return m_pad, m_pad
    return round_up(m_pad, 128), 128


def _stacked_kernel(kernel):
    """Wrap a 2-D-weight kernel so weight/scale refs carry a leading
    layer-block dim of 1 (stacked mode); the scalar-prefetch ref holding the
    layer index is consumed by the index maps only."""
    def wrapped(li_ref, *refs):
        *ins, w_ref, s_ref, out_ref = refs
        kernel(*ins, w_ref.at[0], s_ref.at[0], out_ref)
    return wrapped


def _w4_pallas(kernel, xs, w_packed, w_scales, layer_idx, grid, bm, bn,
               k_half, m_pad, n, out_dtype, extra_specs=(), cost=None,
               m_inner=False):
    """Shared pallas_call builder for the packed-int4 GEMMs: plain 2-D
    weights, or stacked [L, K//8, N] weights indexed by ``layer_idx``
    through scalar prefetch (no per-layer slab copy).

    ``m_inner``: iterate M tiles INSIDE each N tile (grid (n, m) instead of
    (m, n)). With the weight index map constant along the inner axis, each
    weight tile is DMA'd and SWAR-decoded ONCE and revisited for every M
    tile — the right order at prefill widths, where many M tiles would
    otherwise re-stream the full weight array per tile. Activations
    re-stream once per N tile instead, but at large M they are the smaller
    operand per-iteration and the stream pipelines behind the MXU."""
    if m_inner:
        grid = (grid[1], grid[0])
        xm0 = lambda j, i: (i, 0)              # noqa: E731
        xm1 = lambda j, i: (i, 1)              # noqa: E731
        wm = lambda j, i: (0, j)               # noqa: E731
        om = lambda j, i: (i, j)               # noqa: E731
    else:
        xm0 = lambda i, j: (i, 0)              # noqa: E731
        xm1 = lambda i, j: (i, 1)              # noqa: E731
        wm = lambda i, j: (0, j)               # noqa: E731
        om = lambda i, j: (i, j)               # noqa: E731
    x_specs = [
        pl.BlockSpec((bm, k_half), xm0, memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, k_half), xm1, memory_space=pltpu.VMEM),
    ]
    assert not (m_inner and extra_specs), "m_inner: no extra operand specs"
    x_specs += list(extra_specs)
    out_spec = pl.BlockSpec((bm, bn), om, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m_pad, n), out_dtype)
    if layer_idx is None:
        specs = x_specs + [
            pl.BlockSpec((k_half // 4, bn), wm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), wm, memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            kernel, grid=grid, in_specs=specs, out_specs=out_spec,
            out_shape=out_shape, interpret=interpret_mode(), cost_estimate=cost,
        )(*xs, w_packed, w_scales.reshape(1, -1))

    def _shift(spec):
        # re-home a 2-D spec's index_map to the 3-arg (g0, g1, li) form
        f = spec.index_map
        return pl.BlockSpec(spec.block_shape, lambda a, b, li, f=f: f(a, b))

    sw = (lambda j, i, li: (li[0], 0, j)) if m_inner else \
        (lambda i, j, li: (li[0], 0, j))
    specs = [_shift(s) for s in x_specs] + [
        pl.BlockSpec((1, k_half // 4, bn), sw),
        pl.BlockSpec((1, 1, bn), sw),
    ]
    L = w_packed.shape[0]
    return pl.pallas_call(
        _stacked_kernel(kernel),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=specs,
            out_specs=pl.BlockSpec(out_spec.block_shape,
                                   lambda a, b, li: out_spec.index_map(a, b)),
        ),
        out_shape=out_shape, interpret=interpret_mode(), cost_estimate=cost,
    )(jnp.atleast_1d(layer_idx).astype(jnp.int32), *xs, w_packed,
      w_scales.reshape(L, 1, n))


def _w4a16_bigm(x, w_packed, w_scales, bias, out_dtype, layer_idx):
    """Prefill-width (large-M) W4A16 path: dequantize the layer's planes
    ONCE to bf16 integer values and run plain XLA MXU dots.

    The Pallas kernel's weight BlockSpecs ignore the M grid index, so every
    M tile past the first re-streams (and re-SWAR-decodes) the full weight
    array — the right trade at decode/verify widths where one tile covers
    all rows, but at prefill rectangles (M in the thousands) it multiplies
    weight traffic by M/128 and puts the VPU nibble decode on the critical
    path. Here the decode runs once (2 shifts + masks per word), the halves
    pairing maps onto two contiguous bf16 dots (no sublane interleave), and
    XLA's own large-matmul emitter keeps the MXU busy. Numerics match the
    kernel: integer-valued bf16 operands, fp32 accumulation, per-channel
    scale in the epilogue. Measured on the 8B-dims bench: the [16,1024]
    prefill step dropped from ~2.6 s to the MXU-bound floor.
    """
    from qspec_tpu.ops.packing import unpack_int4_high, unpack_int4_low
    if layer_idx is not None:
        li = jnp.asarray(layer_idx, jnp.int32).reshape(())
        w_packed = jax.lax.dynamic_index_in_dim(w_packed, li, 0,
                                                keepdims=False)
        w_scales = jax.lax.dynamic_index_in_dim(w_scales, li, 0,
                                                keepdims=False)
    lo = unpack_int4_low(w_packed).astype(jnp.bfloat16)
    hi = unpack_int4_high(w_packed).astype(jnp.bfloat16)
    k_half = lo.shape[0]
    xb = x.astype(jnp.bfloat16)
    acc = jnp.dot(xb[:, :k_half], lo, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xb[:, k_half:], hi,
                        preferred_element_type=jnp.float32)
    out = (acc * w_scales.astype(jnp.float32)[None, :]).astype(out_dtype)
    if bias is not None:
        out = out + bias[None, :].astype(out.dtype)
    return out


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul_w4a16(x: jnp.ndarray, w_packed: jnp.ndarray, w_scales: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None, *, out_dtype=jnp.bfloat16,
                 layer_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x [M, K] bf16 @ packed-int4 w [K//2, N] -> [M, N] out_dtype.

    M is padded to the sublane multiple internally; K and N must be multiples
    of 256 and 128 respectively (true for all supported model dims).
    With ``layer_idx``, w_packed is the stacked [L, K//8, N] array and
    w_scales [L, N]; tiles of layer ``layer_idx`` stream straight from HBM.
    """
    m, k = x.shape
    if layer_idx is not None:
        _, k_words, n = w_packed.shape
    else:
        k_words, n = w_packed.shape
    k_half = 4 * k_words
    assert k == 2 * k_half, (x.shape, w_packed.shape)

    if round_up(max(m, 16), 16) * 4 * k_half > 5 * 1024 * 1024:
        # the activation would not fit a single VMEM M tile: prefill
        # regime — dequant-once + XLA dot beats per-tile weight re-streams
        return _w4a16_bigm(x, w_packed, w_scales, bias, out_dtype, layer_idx)

    m_pad, bm = _choose_bm(round_up(max(m, 16), 16), 4 * k_half)
    x = pad_dim(x.astype(jnp.bfloat16), 0, m_pad)
    bn = _choose_bn(bm, k_half, n, 2)
    grid = (m_pad // bm, cdiv(n, bn))

    cost = pl.CostEstimate(
        flops=2 * m_pad * k * n,
        bytes_accessed=k_half * n + m_pad * k * 2 + m_pad * n * 2,
        transcendentals=0,
    )
    out = _w4_pallas(_w4a16_kernel, (x, x), w_packed, w_scales, layer_idx,
                     grid, bm, bn, k_half, m_pad, n, out_dtype, cost=cost)
    out = out[:m]
    if bias is not None:
        out = out + bias[None, :].astype(out.dtype)
    return out


def _w4a16_g_kernel(x_lo_ref, x_hi_ref, w_ref, s_ref, o_ref, out_ref):
    """Group-quantized dequant matmul tile (AWQ/GPTQ path).

    Per-group scales vary ALONG the contraction dim, so they cannot fold
    into an epilogue like the symmetric kernel's per-channel scales — the
    weight tile is dequantized in VMEM (q*s - zp*s) and fed to a bf16 MXU
    dot, the same structure as the reference's BitBLAS/Marlin dequant GEMMs
    (csrc/quantization/gptq_marlin). The stored nibble is the original
    UNSIGNED q (packer stores q-8 in excess-8 form), so no +8 rebias."""
    lo_u, hi_u = _swar_planes(w_ref[:])       # int8, values 0..15 == q
    khalf = lo_u.shape[0]
    G = s_ref.shape[0]
    G2 = G // 2                               # groups per K-half
    g = khalf // G2
    s = s_ref[:].astype(jnp.float32)
    o = o_ref[:].astype(jnp.float32)

    def rep(a):                               # [G2, bn] -> [khalf, bn]
        return jnp.broadcast_to(a[:, None, :], (G2, g, a.shape[-1])
                                ).reshape(khalf, a.shape[-1])

    w_lo = (lo_u.astype(jnp.float32) * rep(s[:G2])
            - rep(o[:G2])).astype(jnp.bfloat16)
    w_hi = (hi_u.astype(jnp.float32) * rep(s[G2:])
            - rep(o[G2:])).astype(jnp.bfloat16)
    acc = jnp.dot(x_lo_ref[:], w_lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi_ref[:], w_hi, preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _stacked_g_kernel(kernel):
    """Stacked-layer wrapper for the grouped kernel (3 weight-side refs)."""
    def wrapped(li_ref, x_lo, x_hi, w_ref, s_ref, o_ref, out_ref):
        kernel(x_lo, x_hi, w_ref.at[0], s_ref.at[0], o_ref.at[0], out_ref)
    return wrapped


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _w4a16_g_bigm(x, w_packed, w_scales_g, w_offs_g, bias, out_dtype,
                  layer_idx):
    """Prefill-width path for the GROUP-quantized GEMM (see _w4a16_bigm):
    dequant w = q*s - zp*s once per call to bf16, halves-paired XLA dots."""
    from qspec_tpu.ops.packing import unpack_int4_high, unpack_int4_low
    if layer_idx is not None:
        li = jnp.asarray(layer_idx, jnp.int32).reshape(())
        w_packed = jax.lax.dynamic_index_in_dim(w_packed, li, 0,
                                                keepdims=False)
        w_scales_g = jax.lax.dynamic_index_in_dim(w_scales_g, li, 0,
                                                  keepdims=False)
        w_offs_g = jax.lax.dynamic_index_in_dim(w_offs_g, li, 0,
                                                keepdims=False)
    # stored nibbles are the original UNSIGNED q (packer stores q-8 in
    # excess-8 form); the unpack helpers subtract 8, so add it back
    lo_q = unpack_int4_low(w_packed).astype(jnp.float32) + 8.0
    hi_q = unpack_int4_high(w_packed).astype(jnp.float32) + 8.0
    k_half = lo_q.shape[0]
    G = w_scales_g.shape[0]
    G2 = G // 2
    g = k_half // G2

    def rep(a):                                # [G2, N] -> [k_half, N]
        return jnp.broadcast_to(a[:, None, :], (G2, g, a.shape[-1])
                                ).reshape(k_half, a.shape[-1])

    s = w_scales_g.astype(jnp.float32)
    o = w_offs_g.astype(jnp.float32)
    w_lo = (lo_q * rep(s[:G2]) - rep(o[:G2])).astype(jnp.bfloat16)
    w_hi = (hi_q * rep(s[G2:]) - rep(o[G2:])).astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    acc = jnp.dot(xb[:, :k_half], w_lo, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xb[:, k_half:], w_hi,
                        preferred_element_type=jnp.float32)
    out = acc.astype(out_dtype)
    if bias is not None:
        out = out + bias[None, :].astype(out.dtype)
    return out


def matmul_w4a16_g(x: jnp.ndarray, w_packed: jnp.ndarray,
                   w_scales_g: jnp.ndarray, w_offs_g: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None, *,
                   out_dtype=jnp.bfloat16,
                   layer_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x [M, K] bf16 @ group-quantized int4 w -> [M, N] (AWQ/GPTQ weights).

    w_packed [K//8, N] int32 (nibbles = unsigned q), w_scales_g [K//g, N],
    w_offs_g = zp*s [K//g, N]. Group count must be even (g <= K/2) and g must
    divide K/2 (true for g in {32, 64, 128} at all production dims). With
    ``layer_idx`` the weight-side arrays carry a leading stacked-layer dim.
    """
    m, k = x.shape
    if layer_idx is not None:
        _, k_words, n = w_packed.shape
        G = w_scales_g.shape[1]
    else:
        k_words, n = w_packed.shape
        G = w_scales_g.shape[0]
    k_half = 4 * k_words
    assert k == 2 * k_half, (x.shape, w_packed.shape)
    assert G % 2 == 0 and k_half % (G // 2) == 0, (k, G)

    if round_up(max(m, 16), 16) * 4 * k_half > 5 * 1024 * 1024:
        # prefill regime: dequant each group's columns once to bf16 and
        # run XLA dots (see _w4a16_bigm's rationale)
        return _w4a16_g_bigm(x, w_packed, w_scales_g, w_offs_g, bias,
                             out_dtype, layer_idx)

    m_pad, bm = _choose_bm(round_up(max(m, 16), 16), 4 * k_half)
    x = pad_dim(x.astype(jnp.bfloat16), 0, m_pad)
    bn = _choose_bn(bm, k_half, n, 2)
    grid = (m_pad // bm, cdiv(n, bn))

    cost = pl.CostEstimate(
        flops=2 * m_pad * k * n,
        bytes_accessed=k_half * n + 8 * G * n + m_pad * k * 2 + m_pad * n * 2,
        transcendentals=0,
    )
    x_specs = [
        pl.BlockSpec((bm, k_half), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, k_half), lambda i, j: (i, 1), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m_pad, n), out_dtype)
    if layer_idx is None:
        specs = x_specs + [
            pl.BlockSpec((k_half // 4, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        out = pl.pallas_call(
            _w4a16_g_kernel, grid=grid, in_specs=specs, out_specs=out_spec,
            out_shape=out_shape, interpret=interpret_mode(),
            cost_estimate=cost,
        )(x, x, w_packed, w_scales_g, w_offs_g)
    else:
        def _shift(spec):
            f = spec.index_map
            return pl.BlockSpec(spec.block_shape,
                                lambda i, j, li, f=f: f(i, j))

        specs = [_shift(s) for s in x_specs] + [
            pl.BlockSpec((1, k_half // 4, bn), lambda i, j, li: (li[0], 0, j)),
            pl.BlockSpec((1, G, bn), lambda i, j, li: (li[0], 0, j)),
            pl.BlockSpec((1, G, bn), lambda i, j, li: (li[0], 0, j)),
        ]
        out = pl.pallas_call(
            _stacked_g_kernel(_w4a16_g_kernel),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=specs,
                out_specs=pl.BlockSpec(out_spec.block_shape,
                                       lambda i, j, li: (i, j)),
            ),
            out_shape=out_shape, interpret=interpret_mode(),
            cost_estimate=cost,
        )(jnp.atleast_1d(layer_idx).astype(jnp.int32), x, x, w_packed,
          w_scales_g, w_offs_g)
    out = out[:m]
    if bias is not None:
        out = out + bias[None, :].astype(out.dtype)
    return out


def _w8a16_kernel(x_ref, w_ref, s_ref, out_ref):
    acc = jnp.dot(x_ref[:], w_ref[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    out_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _choose_bn_w8(k: int, n: int):
    """Largest divisor tile width with a <=4 MB int8 weight tile (double
    buffering under the ~16 MB VMEM budget). Vocab sizes aren't powers of
    two (128256 = 2^7*3*334), so scan non-pow2 multiples of 128 too."""
    for bn in (2048, 1536, 1024, 768, 512, 384, 256, 128):
        if n % bn == 0 and k * bn <= 4 * 1024 * 1024:
            return bn
    return 128


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul_w8a16(x: jnp.ndarray, w_q: jnp.ndarray, w_scales: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None, *,
                 out_dtype=jnp.bfloat16,
                 layer_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x [M, K] bf16 @ int8 w [K, N] -> [M, N] out_dtype (per-N-channel scales).

    Serves the int8 lm_head and W8A16 trunks (compressed-tensors
    int-quantized ingestion, model_loader/ct.py). With ``layer_idx`` the
    weight side is the stacked [L, K, N] array (+ scales [L, N]) and tiles
    of layer ``layer_idx`` stream straight from HBM via scalar prefetch.
    """
    m, k = x.shape
    if layer_idx is not None:
        L, kw, n = w_q.shape
    else:
        kw, n = w_q.shape
    assert k == kw, (x.shape, w_q.shape)
    if round_up(max(m, 16), 16) * 2 * k > 5 * 1024 * 1024:
        # prefill regime (see _w4a16_bigm): int8 weights feed XLA's dot
        # directly, scale in the epilogue
        if layer_idx is not None:
            li = jnp.asarray(layer_idx, jnp.int32).reshape(())
            w_q = jax.lax.dynamic_index_in_dim(w_q, li, 0, keepdims=False)
            w_scales = jax.lax.dynamic_index_in_dim(w_scales, li, 0,
                                                    keepdims=False)
        acc = jnp.dot(x.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        out = (acc * w_scales.astype(jnp.float32)[None, :]).astype(out_dtype)
        if bias is not None:
            out = out + bias[None, :].astype(out.dtype)
        return out
    m_pad, bm = _choose_bm(round_up(max(m, 16), 16), 2 * k)
    x = pad_dim(x.astype(jnp.bfloat16), 0, m_pad)
    bn = _choose_bn_w8(k, n)
    grid = (m_pad // bm, cdiv(n, bn))
    cost = pl.CostEstimate(
        flops=2 * m_pad * k * n,
        bytes_accessed=k * n + m_pad * k * 2 + m_pad * n * 2,
        transcendentals=0,
    )
    if layer_idx is None:
        out = pl.pallas_call(
            _w8a16_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
            interpret=interpret_mode(),
            cost_estimate=cost,
        )(x, w_q, w_scales.reshape(1, -1))
    else:
        specs = [
            pl.BlockSpec((bm, k), lambda i, j, li: (i, 0)),
            pl.BlockSpec((1, k, bn), lambda i, j, li: (li[0], 0, j)),
            pl.BlockSpec((1, 1, bn), lambda i, j, li: (li[0], 0, j)),
        ]
        out = pl.pallas_call(
            _stacked_kernel(_w8a16_kernel),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=specs,
                out_specs=pl.BlockSpec((bm, bn), lambda i, j, li: (i, j)),
            ),
            out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
            interpret=interpret_mode(), cost_estimate=cost,
        )(jnp.atleast_1d(layer_idx).astype(jnp.int32), x, w_q,
          w_scales.reshape(L, 1, n))
    out = out[:m]
    if bias is not None:
        out = out + bias[None, :].astype(out.dtype)
    return out


def matmul_w8a16_g_ref(x: jnp.ndarray, w_q: jnp.ndarray,
                       w_scales: jnp.ndarray,
                       out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """jnp reference for the W8A16 path (CPU fallback for tiny dims):
    x [M,K] bf16 @ int8 w [K,N] with per-N scales."""
    w = w_q.astype(jnp.float32) * w_scales.astype(jnp.float32)[None, :]
    return jnp.dot(x.astype(jnp.float32), w).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul_w4a4(x_q: jnp.ndarray, x_scales: jnp.ndarray, w_packed: jnp.ndarray,
                w_scales: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                *, out_dtype=jnp.bfloat16,
                layer_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Quantized activations [M, K] int8 x packed-int4 w [K//2, N] -> [M, N].

    With ``layer_idx``, w_packed is stacked [L, K//8, N] / w_scales [L, N]
    (see module docstring)."""
    m, k = x_q.shape
    if layer_idx is not None:
        _, k_words, n = w_packed.shape
    else:
        k_words, n = w_packed.shape
    k_half = 4 * k_words
    assert k == 2 * k_half, (x_q.shape, w_packed.shape)

    m_pad, bm = _choose_bm(round_up(max(m, 32), 32), 2 * k_half)
    x_q = pad_dim(x_q, 0, m_pad)
    x_scales = pad_dim(x_scales.reshape(-1, 1).astype(jnp.float32), 0, m_pad)
    bn = _choose_bn(bm, k_half, n, 1)
    grid = (m_pad // bm, cdiv(n, bn))

    sx_spec = pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * m_pad * k * n,
        bytes_accessed=k_half * n + m_pad * k + m_pad * n * 2,
        transcendentals=0,
    )
    out = _w4_pallas(_w4a4_kernel, (x_q, x_q, x_scales), w_packed, w_scales,
                     layer_idx, grid, bm, bn, k_half, m_pad, n, out_dtype,
                     extra_specs=(sx_spec,), cost=cost)
    out = out[:m]
    if bias is not None:
        out = out + bias[None, :].astype(out.dtype)
    return out
