"""Quantized matmul kernels vs jnp references (interpret mode on CPU).

Mirrors /root/reference/tests/kernels/test_marlin_gemm.py-style sweeps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qspec_tpu.ops.linear_kernels import (matmul_w4a4, matmul_w4a4_ref,
                                          matmul_w4a16, matmul_w4a16_ref)
from qspec_tpu.ops.packing import quantize_weight_int4
from qspec_tpu.ops.quant import sym_quant_int4, sym_quant_int8, sym_dequant


@pytest.mark.parametrize("m,k,n", [(1, 256, 128), (7, 512, 256), (16, 1024, 384)])
def test_w4a16_matches_ref(rng, m, k, n):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qw, qs = quantize_weight_int4(w)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32), jnp.bfloat16)
    out = matmul_w4a16(x, jnp.asarray(qw), jnp.asarray(qs))
    ref = matmul_w4a16_ref(x, jnp.asarray(qw), jnp.asarray(qs))
    assert out.shape == (m, n)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("m,k,n", [(1, 256, 128), (5, 512, 256), (32, 1024, 384)])
def test_w4a4_matches_ref(rng, m, k, n):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qw, qs = quantize_weight_int4(w)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32), jnp.bfloat16)
    xq = sym_quant_int4(x)
    out = matmul_w4a4(xq.values, xq.scales, jnp.asarray(qw), jnp.asarray(qs))
    ref = matmul_w4a4_ref(xq.values, xq.scales, jnp.asarray(qw), jnp.asarray(qs))
    # int32 accumulation is exact; only the f32->bf16 epilogue rounds
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_w4a16_bigm_path_matches_ref(rng):
    """Prefill-width M routes through the dequant-once XLA path
    (_w4a16_bigm); it must agree with the scalar reference, plain and
    stacked-layer mode both."""
    m, k, n = 10496, 512, 256          # m*2k bytes > 5 MB -> big-M branch
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qw, qs = quantize_weight_int4(w)
    out = matmul_w4a16(x, jnp.asarray(qw), jnp.asarray(qs))
    ref = matmul_w4a16_ref(x, jnp.asarray(qw), jnp.asarray(qs))
    np.testing.assert_allclose(np.asarray(out[::97], np.float32),
                               np.asarray(ref[::97], np.float32),
                               rtol=2e-2, atol=2e-2)
    # stacked-layer mode with a dynamic layer index
    w2 = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qw2, qs2 = quantize_weight_int4(w2)
    stack = jnp.stack([jnp.asarray(qw), jnp.asarray(qw2)])
    sstack = jnp.stack([jnp.asarray(qs), jnp.asarray(qs2)])
    out1 = matmul_w4a16(x, stack, sstack, layer_idx=jnp.int32(1))
    ref1 = matmul_w4a16_ref(x, jnp.asarray(qw2), jnp.asarray(qs2))
    np.testing.assert_allclose(np.asarray(out1[::97], np.float32),
                               np.asarray(ref1[::97], np.float32),
                               rtol=2e-2, atol=2e-2)


def test_w4a16_dequant_accuracy(rng):
    """The kernel must be faithful to symmetric per-channel dequant semantics
    (the 'verify path lossless' requirement, BASELINE.md)."""
    k, n = 512, 256
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qw, qs = quantize_weight_int4(w)
    x = jnp.asarray(np.eye(k, dtype=np.float32)[:8], jnp.bfloat16)  # picks out rows
    out = np.asarray(matmul_w4a16(x, jnp.asarray(qw), jnp.asarray(qs)), np.float32)
    from qspec_tpu.ops.packing import unpack_int4_np
    wd = unpack_int4_np(qw).astype(np.float32) * qs[None, :]
    np.testing.assert_allclose(out, wd[:8], rtol=1e-2, atol=1e-3)


def test_sym_quant_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    for fn, bits in [(sym_quant_int4, 4), (sym_quant_int8, 8)]:
        q = fn(x)
        deq = np.asarray(sym_dequant(q, jnp.float32))
        step = np.asarray(q.scales)
        assert np.all(np.abs(deq - np.asarray(x)) <= 0.51 * step + 1e-6)


@pytest.mark.parametrize("m,k,n", [(1, 256, 128), (7, 512, 384), (16, 1024, 256)])
def test_w8a16_matches_ref(rng, m, k, n):
    from qspec_tpu.ops.linear_kernels import matmul_w8a16, matmul_w8a16_ref
    from qspec_tpu.ops.packing import quantize_weight_int8
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qw, qs = quantize_weight_int8(w)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32), jnp.bfloat16)
    out = matmul_w8a16(x, jnp.asarray(qw), jnp.asarray(qs), out_dtype=jnp.float32)
    ref = matmul_w8a16_ref(x, jnp.asarray(qw), jnp.asarray(qs), out_dtype=jnp.float32)
    assert out.shape == (m, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_w8a16_dequant_accuracy(rng):
    """Per-channel int8 dequant semantics: identity rows pick out w columns."""
    from qspec_tpu.ops.linear_kernels import matmul_w8a16
    from qspec_tpu.ops.packing import quantize_weight_int8
    k, n = 512, 256
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qw, qs = quantize_weight_int8(w)
    x = jnp.asarray(np.eye(k, dtype=np.float32)[:8], jnp.bfloat16)
    out = np.asarray(matmul_w8a16(x, jnp.asarray(qw), jnp.asarray(qs),
                                  out_dtype=jnp.float32))
    wd = qw.astype(np.float32) * qs[None, :]
    np.testing.assert_allclose(out, wd[:8], rtol=1e-2, atol=1e-3)
