"""Grouped-quant (AWQ/GPTQ) dequant GEMM + format unpackers.

Reference pattern: tests/kernels/test_awq.py / test_gptq_marlin_gemm.py —
each quantized kernel is checked against a dequantize-then-matmul oracle
over shape sweeps, and the format unpackers against the packing identity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from qspec_tpu.model_loader.grouped import (make_awq_tensors,
                                            make_gptq_tensors,
                                            pack_grouped_proj, unpack_awq,
                                            unpack_gptq, _group_quantize)
from qspec_tpu.ops.linear_kernels import matmul_w4a16_g, matmul_w4a16_g_ref


def _dequant(q, zp, s, g):
    K = q.shape[0]
    return (q.astype(np.float32)
            - np.repeat(zp, g, axis=0)) * np.repeat(s, g, axis=0)


@pytest.mark.parametrize("fmt", ["awq", "gptq"])
@pytest.mark.parametrize("g", [64, 128])
def test_format_roundtrip(fmt, g):
    """pack -> unpack recovers the exact q / zp / s triples."""
    rng = np.random.default_rng(0)
    K, N = 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    q0, zp0, s0 = _group_quantize(w, g, 0)
    if fmt == "awq":
        t = make_awq_tensors(w, g)
        q, zp, s = unpack_awq(t["qweight"], t["qzeros"], t["scales"])
    else:
        t = make_gptq_tensors(w, g)
        q, zp, s = unpack_gptq(t["qweight"], t["qzeros"], t["scales"],
                               t["g_idx"])
    np.testing.assert_array_equal(q, q0)
    np.testing.assert_array_equal(zp, zp0)
    np.testing.assert_allclose(s, s0.astype(np.float16).astype(np.float32))


def test_gptq_act_order_rejected():
    rng = np.random.default_rng(1)
    t = make_gptq_tensors(rng.standard_normal((256, 128)).astype(np.float32),
                          128)
    bad = np.flip(t["g_idx"]).copy()
    with pytest.raises(NotImplementedError, match="act-order"):
        unpack_gptq(t["qweight"], t["qzeros"], t["scales"], bad)


@pytest.mark.parametrize("m,k,n,g", [(1, 256, 128, 64), (8, 512, 384, 128),
                                     (17, 1024, 512, 128), (64, 256, 256, 32)])
def test_grouped_ref_matches_dequant_oracle(m, k, n, g):
    rng = np.random.default_rng(2)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    q, zp, s = _group_quantize(w, g, 0)
    p = pack_grouped_proj(q, zp, s)
    x = (rng.standard_normal((m, k)) * 0.5).astype(np.float32)
    got = np.asarray(matmul_w4a16_g_ref(
        jnp.asarray(x, jnp.bfloat16), p["qw"], p["qs_g"], p["qo_g"],
        out_dtype=jnp.float32))
    w_deq = _dequant(q, zp, s, g)
    want = x.astype(np.float32) @ w_deq
    # bf16 activations + bf16 dequant weights: relative tolerance ~1%
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05 * np.abs(want).max())


@pytest.mark.parametrize("m,k,n,g", [(1, 256, 128, 128), (8, 512, 384, 64),
                                     (33, 512, 1536, 128)])
def test_grouped_kernel_matches_ref(m, k, n, g):
    """Pallas kernel (interpret mode on CPU) vs the jnp reference — exact
    same dequant math, so near-bit tolerance."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    q, zp, s = _group_quantize(w, g, 0)
    p = pack_grouped_proj(q, zp, s)
    x = jnp.asarray((rng.standard_normal((m, k)) * 0.5), jnp.bfloat16)
    ref = np.asarray(matmul_w4a16_g_ref(x, p["qw"], p["qs_g"], p["qo_g"],
                                        out_dtype=jnp.float32))
    got = np.asarray(matmul_w4a16_g(x, p["qw"], p["qs_g"], p["qo_g"],
                                    out_dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2 * np.abs(ref).max())


def test_grouped_bigm_path_matches_ref():
    """Prefill-width M routes through the grouped dequant-once XLA path
    (_w4a16_g_bigm) and must agree with the jnp reference."""
    m, k, n, g = 10496, 512, 384, 64     # m*4*k_half bytes > 5 MB
    rng = np.random.default_rng(7)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    q, zp, s = _group_quantize(w, g, 0)
    p = pack_grouped_proj(q, zp, s)
    x = jnp.asarray((rng.standard_normal((m, k)) * 0.5), jnp.bfloat16)
    ref = np.asarray(matmul_w4a16_g_ref(x[:64], p["qw"], p["qs_g"],
                                        p["qo_g"], out_dtype=jnp.float32))
    got = np.asarray(matmul_w4a16_g(x, p["qw"], p["qs_g"], p["qo_g"],
                                    out_dtype=jnp.float32))
    np.testing.assert_allclose(got[:64], ref, rtol=2e-2,
                               atol=2e-2 * np.abs(ref).max())


def test_grouped_kernel_stacked_layers():
    rng = np.random.default_rng(4)
    k, n, g, L = 256, 256, 128, 3
    ps = []
    for _ in range(L):
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
        ps.append(pack_grouped_proj(*_group_quantize(w, g, 0)))
    import jax
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    x = jnp.asarray(rng.standard_normal((4, k)) * 0.5, jnp.bfloat16)
    for li in range(L):
        ref = np.asarray(matmul_w4a16_g_ref(
            x, ps[li]["qw"], ps[li]["qs_g"], ps[li]["qo_g"],
            out_dtype=jnp.float32))
        got = np.asarray(matmul_w4a16_g(
            x, stacked["qw"], stacked["qs_g"], stacked["qo_g"],
            layer_idx=jnp.asarray(li), out_dtype=jnp.float32))
        np.testing.assert_allclose(got, ref, rtol=2e-2,
                                   atol=2e-2 * np.abs(ref).max())


def test_pack_grouped_proj_tp_layouts():
    """col_blocks / shard_in rearrangements keep dequant semantics: the
    rearranged pack must dequant to the correspondingly rearranged float."""
    rng = np.random.default_rng(5)
    k, g, tp = 512, 128, 2
    nq, nk = 256, 128
    w = rng.standard_normal((k, nq + 2 * nk)).astype(np.float32) * 0.1
    q, zp, s = _group_quantize(w, g, 0)
    p = pack_grouped_proj(q, zp, s, col_blocks=(nq, nk, nk), tp_size=tp)
    x = (rng.standard_normal((4, k)) * 0.5).astype(np.float32)
    got = np.asarray(matmul_w4a16_g_ref(
        jnp.asarray(x, jnp.bfloat16), p["qw"], p["qs_g"], p["qo_g"],
        out_dtype=jnp.float32))
    w_deq = _dequant(q, zp, s, g)
    want = x @ w_deq
    # undo the col_blocks rearrangement on the oracle
    parts = np.split(want, np.cumsum((nq, nk, nk))[:-1], axis=1)
    chunks = [p_[:, r * (p_.shape[1] // tp):(r + 1) * (p_.shape[1] // tp)]
              for r in range(tp) for p_ in parts]
    want_re = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(got, want_re, rtol=0.05,
                               atol=0.05 * np.abs(want).max())

    # shard_in: each K-chunk packed independently so that shard r's packed
    # stripe + its LOCAL x slice + its group-row stripe reproduce the full
    # matmul when psum'd (the shard_map row-parallel contract, parallel/tp.py)
    p_row = pack_grouped_proj(q, zp, s, shard_in=True, tp_size=tp)
    qw = np.asarray(p_row["qw"])
    sg = np.asarray(p_row["qs_g"])
    og = np.asarray(p_row["qo_g"])
    kc_words, gc = qw.shape[0] // tp, sg.shape[0] // tp
    acc = np.zeros_like(want)
    for r in range(tp):
        x_loc = x[:, r * (k // tp):(r + 1) * (k // tp)]
        acc += np.asarray(matmul_w4a16_g_ref(
            jnp.asarray(x_loc, jnp.bfloat16),
            jnp.asarray(qw[r * kc_words:(r + 1) * kc_words]),
            jnp.asarray(sg[r * gc:(r + 1) * gc]),
            jnp.asarray(og[r * gc:(r + 1) * gc]), out_dtype=jnp.float32))
    np.testing.assert_allclose(acc, want, rtol=0.05,
                               atol=0.05 * np.abs(want).max())
