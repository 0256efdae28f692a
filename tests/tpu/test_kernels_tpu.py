"""Every Pallas kernel exercised on the REAL chip at production shapes.

Interpret mode (the CPU kernel tests) cannot catch Mosaic-only failure
modes — illegal DMA slice forms that compile-but-crash, relayout throughput
cliffs, int8 vector-op legalization — so this tier re-validates each kernel
against its jnp reference ON the TPU (reference: tests/tpu/,
.buildkite/run-tpu-test.sh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qspec_tpu.ops import kv_cache as kvc

pytestmark = pytest.mark.tpu


def _bf16(rng, shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale,
                       jnp.bfloat16)


def make_cache(rng, Hkv=4, P=80, S=128, D=128, L=2, dtype="bfloat16"):
    cfg = kvc.KVCacheConfig(num_layers=L, num_kv_heads=Hkv, head_dim=D,
                            num_pages=P, page_size=S, dtype=dtype)
    cache = kvc.allocate(cfg)
    if dtype == "int8":
        vals = rng.integers(-127, 128, cache.kv_pages.shape).astype(np.int8)
        scales = (rng.random(cache.kv_scales.shape) * 0.02 + 0.01).astype(
            np.float32)
        return cache._replace(kv_pages=jnp.asarray(vals),
                              kv_scales=jnp.asarray(scales))
    kv = rng.standard_normal(cache.kv_pages.shape).astype(np.float32)
    if dtype.startswith("fp8"):
        pages = jnp.asarray(kv, kvc.kv_entry_dtype(dtype))
        if cache.kv_scales is not None:  # e4m3: modest per-token scales
            scales = (rng.random(cache.kv_scales.shape) * 0.02
                      + 0.01).astype(np.float32)
            return cache._replace(kv_pages=pages,
                                  kv_scales=jnp.asarray(scales))
        return cache._replace(kv_pages=pages)
    return cache._replace(kv_pages=jnp.asarray(kv, jnp.bfloat16))


def _attn_pair(rng, cache, *, B, Q, Hq, layer=0, n_pages=8, window=None):
    from qspec_tpu.ops.attention import paged_attention_ref
    from qspec_tpu.ops.attention_pallas import paged_attention_pallas

    Hkv, S, D = cache.kv_pages.shape[3], cache.kv_pages.shape[4], \
        cache.kv_pages.shape[5]
    q = _bf16(rng, (B, Q, Hq, D))
    total = cache.kv_pages.shape[1]
    ids = rng.permutation(np.arange(1, total))[:B * n_pages]
    tables = jnp.asarray(ids.reshape(B, n_pages).astype(np.int32))
    ctx = jnp.asarray(rng.integers(Q + 1, n_pages * S, size=B), jnp.int32)
    scale = D ** -0.5
    ref = paged_attention_ref(q, cache, layer, tables, ctx, scale,
                              window=window)
    out = paged_attention_pallas(q, cache.kv_pages, tables, ctx, scale,
                                 layer=jnp.asarray(layer, jnp.int32),
                                 kv_scales=cache.kv_scales, window=window)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=4e-2, rtol=4e-2)


@pytest.mark.parametrize("Q", [1, 4])
def test_attention_decode_verify(rng, Q):
    """Decode (Q=1) and verify (Q=k+1) widths, layer-indexed stacked cache."""
    cache = make_cache(rng)
    _attn_pair(rng, cache, B=8, Q=Q, Hq=16, layer=1)


@pytest.mark.parametrize("Q", [1, 4])
def test_attention_int8_kv(rng, Q):
    """int8 KV pages + per-(head,token) scales dequantized inside the kernel."""
    cache = make_cache(rng, dtype="int8")
    _attn_pair(rng, cache, B=4, Q=Q, Hq=16, layer=1)


@pytest.mark.parametrize("kv_dtype", ["fp8_e4m3", "fp8_e5m2"])
def test_attention_fp8_kv(rng, kv_dtype):
    """fp8 KV pages on Mosaic: e4m3 with in-score scale folds, e5m2 via the
    bare in-kernel astype (kv_cache_dtype=fp8_* production shapes)."""
    cache = make_cache(rng, dtype=kv_dtype)
    _attn_pair(rng, cache, B=4, Q=2, Hq=16, layer=1)


def _attn_small_head(rng, D, Hq, Hkv, Q, layer=0, dtype="bfloat16"):
    """Production path for sub-128 head dims: the cache stores 128-lane
    PADDED pages (ModelConfig.cache_head_dim) because Mosaic requires
    lane-tile-aligned HBM DMA slices — a raw D<128 page array cannot feed
    the kernel (the round-3 head-size lift only worked in interpret
    mode). The ops.attention.paged_attention dispatch pads q and slices
    the output; compare against the ref path on the same padded cache."""
    import jax.numpy as jnp

    from qspec_tpu.ops.attention import PagedKVCache, paged_attention, \
        paged_attention_ref
    cache = make_cache(rng, Hkv=Hkv, D=128, dtype=dtype)
    B, n_pages = 4, 8
    q = _bf16(rng, (B, Q, Hq, D))
    total = cache.kv_pages.shape[1]
    S = cache.kv_pages.shape[4]
    ids = rng.permutation(np.arange(1, total))[:B * n_pages]
    tables = jnp.asarray(ids.reshape(B, n_pages).astype(np.int32))
    ctx = jnp.asarray(rng.integers(Q + 1, n_pages * S, size=B), jnp.int32)
    scale = D ** -0.5
    out = paged_attention(q, cache, layer, tables, ctx, scale)
    assert out.shape[-1] == D
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 128 - D)))
    ref = paged_attention_ref(qp, cache, layer, tables, ctx,
                              scale)[..., :D]
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=4e-2, rtol=4e-2)


@pytest.mark.parametrize("D,Hq,Hkv", [(64, 12, 12), (80, 8, 8), (96, 8, 4)])
def test_attention_small_head_dim(rng, D, Hq, Hkv):
    """head_dim 64/80/96 (GPT-2/Phi/GPT-J/StableLM families) through the
    padded-lane production path (reference head-size dispatch:
    csrc/attention/attention_kernels.cuh)."""
    _attn_small_head(rng, D, Hq, Hkv, Q=1, layer=1)
    _attn_small_head(rng, D, Hq, Hkv, Q=4, layer=0)


def test_attention_small_head_dim_int8(rng):
    """sub-128 head_dim combined with int8 KV in-kernel dequant."""
    _attn_small_head(rng, 64, 8, 4, Q=2, layer=1, dtype="int8")


def test_attention_long_block_table(rng):
    """64-page tables (8k ctx): the in-kernel DMA pipeline over many pages."""
    cache = make_cache(rng, P=140, S=128)
    _attn_pair(rng, cache, B=2, Q=1, Hq=16, n_pages=64)


def test_attention_prefill_grid_tiling(rng):
    """G = group*Q > 256 engages query-block grid tiling."""
    from qspec_tpu.ops.attention import paged_attention_ref
    from qspec_tpu.ops.attention_pallas import paged_attention_pallas

    B, Q, Hq, Hkv, D, S = 2, 256, 16, 4, 128, 128
    cache = make_cache(rng, Hkv=Hkv, P=24, S=S, D=D, L=1)
    q = _bf16(rng, (B, Q, Hq, D))
    tables = jnp.asarray(np.arange(1, 1 + B * 8).reshape(B, 8), jnp.int32)
    # chunk starting mid-prompt: q_positions offset from context start
    q_pos = jnp.tile(jnp.arange(Q, dtype=jnp.int32)[None] + 300, (B, 1))
    ctx = jnp.asarray([300 + Q, 300 + Q], jnp.int32)
    scale = D ** -0.5
    ref = paged_attention_ref(q, cache, 0, tables, ctx, scale,
                              q_positions=q_pos)
    out = paged_attention_pallas(q, cache.kv_pages, tables, ctx, scale,
                                 q_positions=q_pos)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=4e-2, rtol=4e-2)


@pytest.mark.parametrize("window", [256])
def test_attention_sliding_window(rng, window):
    """Mistral-style windowed mask + out-of-window page skip."""
    cache = make_cache(rng)
    _attn_pair(rng, cache, B=4, Q=1, Hq=16, n_pages=8, window=window)


@pytest.mark.parametrize("Q", [1, 4])
def test_attention_alibi(rng, Q):
    """ALiBi slope bias (BLOOM/MPT/JAIS/Baichuan-13B) in the Mosaic kernel
    at production shapes, nonzero slopes, grouped-query rows."""
    from qspec_tpu.ops.attention import alibi_slopes, paged_attention_ref
    from qspec_tpu.ops.attention_pallas import paged_attention_pallas

    cache = make_cache(rng)
    B, Hq, n_pages = 4, 16, 8
    Hkv, S, D = (cache.kv_pages.shape[3], cache.kv_pages.shape[4],
                 cache.kv_pages.shape[5])
    q = _bf16(rng, (B, Q, Hq, D))
    ids = rng.permutation(np.arange(1, cache.kv_pages.shape[1]))[:B * n_pages]
    tables = jnp.asarray(ids.reshape(B, n_pages).astype(np.int32))
    ctx = jnp.asarray(rng.integers(Q + 1, n_pages * S, size=B), jnp.int32)
    sl = jnp.asarray(alibi_slopes(Hq))
    assert float(jnp.abs(sl).min()) > 0
    ref = paged_attention_ref(q, cache, 1, tables, ctx, D ** -0.5, alibi=sl)
    out = paged_attention_pallas(q, cache.kv_pages, tables, ctx, D ** -0.5,
                                 layer=jnp.asarray(1, jnp.int32), alibi=sl)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=4e-2, rtol=4e-2)


def test_kv_update_layer_scatter(rng):
    """Token scatter into the interleaved head-major pages (both dtypes)."""
    for dtype in ("bfloat16", "int8"):
        cache = make_cache(rng, dtype=dtype)
        L, P, _, H, S, D = cache.kv_pages.shape
        T = 16
        k_new = _bf16(rng, (T, H, D))
        v_new = _bf16(rng, (T, H, D))
        slots = jnp.asarray(
            rng.choice(np.arange(S, 4 * S), size=T, replace=False), jnp.int32)
        new = kvc.update_layer(cache, 1, k_new, v_new, slots)
        pages = np.asarray(new.kv_pages)
        page, off = np.asarray(slots) // S, np.asarray(slots) % S
        for t in range(T):
            got_k = pages[1, page[t], 0, :, off[t], :].astype(np.float32)
            if dtype == "int8":
                got_k = got_k * np.asarray(
                    new.kv_scales)[1, page[t], 0, :, off[t], None]
            np.testing.assert_allclose(
                got_k, np.asarray(k_new[t], np.float32), atol=2e-2, rtol=3e-2)


@pytest.mark.parametrize("m", [8, 256])
def test_linear_kernels_on_chip(rng, m):
    """w4a16 / w4a4 / w8a16 Pallas GEMMs vs refs at production K/N."""
    from qspec_tpu.ops.linear_kernels import (matmul_w4a4, matmul_w4a4_ref,
                                              matmul_w4a16, matmul_w4a16_ref,
                                              matmul_w8a16, matmul_w8a16_ref)
    from qspec_tpu.ops.packing import (quantize_weight_int4,
                                       quantize_weight_int8)
    from qspec_tpu.ops.quant import sym_quant_int4

    k, n = 2048, 2048
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qw, qs = quantize_weight_int4(w)
    qw, qs = jnp.asarray(qw), jnp.asarray(qs)
    x = _bf16(rng, (m, k))

    out = matmul_w4a16(x, qw, qs)
    ref = matmul_w4a16_ref(x, qw, qs)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)

    xq = sym_quant_int4(x)
    out = matmul_w4a4(xq.values, xq.scales, qw, qs)
    ref = matmul_w4a4_ref(xq.values, xq.scales, qw, qs)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)

    qw8, qs8 = quantize_weight_int8(w)
    out = matmul_w8a16(x, jnp.asarray(qw8), jnp.asarray(qs8),
                       out_dtype=jnp.float32)
    ref = matmul_w8a16_ref(x, jnp.asarray(qw8), jnp.asarray(qs8),
                           out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("m", [8, 256])
def test_grouped_gemm_on_chip(rng, m):
    """AWQ/GPTQ grouped dequant GEMM (matmul_w4a16_g) vs ref on the chip,
    plain and stacked-layer forms."""
    from qspec_tpu.model_loader.grouped import (_group_quantize,
                                                pack_grouped_proj)
    from qspec_tpu.ops.linear_kernels import (matmul_w4a16_g,
                                              matmul_w4a16_g_ref)

    k, n, g = 2048, 2048, 128
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    p = pack_grouped_proj(*_group_quantize(w, g, 0))
    x = _bf16(rng, (m, k))
    out = matmul_w4a16_g(x, p["qw"], p["qs_g"], p["qo_g"])
    ref = matmul_w4a16_g_ref(x, p["qw"], p["qs_g"], p["qo_g"])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)

    stacked = jax.tree.map(lambda a: jnp.stack([a, a]), p)
    out_s = matmul_w4a16_g(x, stacked["qw"], stacked["qs_g"],
                           stacked["qo_g"], layer_idx=jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(out_s, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("bits", [4, 8])
def test_rmsnorm_quant_on_chip(rng, bits):
    from qspec_tpu.ops.rmsnorm_quant import rmsnorm_quant, rmsnorm_quant_ref

    x = _bf16(rng, (8, 4096))
    out = rmsnorm_quant(x, bits=bits)
    ref = rmsnorm_quant_ref(x, bits=bits)
    np.testing.assert_allclose(np.asarray(out.scales), np.asarray(ref.scales),
                               rtol=5e-3)
    diff = np.abs(np.asarray(out.values, np.int32)
                  - np.asarray(ref.values, np.int32))
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.98


def test_hadamard_transform_on_chip(rng):
    """Online Hadamard (used around o_proj/down_proj) is orthonormal on-chip."""
    from qspec_tpu.ops.hadamard import hadamard_transform

    x = _bf16(rng, (8, 4096))
    y = hadamard_transform(x)
    nx = np.linalg.norm(np.asarray(x, np.float32), axis=-1)
    ny = np.linalg.norm(np.asarray(y, np.float32), axis=-1)
    np.testing.assert_allclose(ny, nx, rtol=2e-2)


def test_attention_tree_mask(rng):
    """Medusa tree-structured causal mask on Mosaic (per-row ancestor
    bits): pallas vs ref at production page sizes."""
    from qspec_tpu.ops.attention import paged_attention_ref
    from qspec_tpu.ops.attention_pallas import paged_attention_pallas
    from qspec_tpu.spec_decode.medusa_tree import DEFAULT_TREE, build_tree

    tspec = build_tree(DEFAULT_TREE)
    prefix, T = 5, tspec.num_nodes
    cache = make_cache(rng, P=40)
    B, Hq, Q = 2, 16, prefix + T
    S, D = cache.kv_pages.shape[4], cache.kv_pages.shape[5]
    q = _bf16(rng, (B, Q, Hq, D))
    ids = rng.permutation(np.arange(1, 33))[:B * 8]
    tables = jnp.asarray(ids.reshape(B, 8).astype(np.int32))
    pos = np.asarray([300, 700], np.int32)
    depth = np.asarray(tspec.depth, np.int32)
    positions = np.concatenate([
        (pos - prefix + 1)[:, None] + np.arange(prefix)[None, :],
        pos[:, None] + depth[None, :]], axis=1)
    ctx = jnp.asarray(pos + 1 + T, jnp.int32)
    tree = (prefix, tspec.ancestors)
    ref = paged_attention_ref(q, cache, 1, tables, ctx, D ** -0.5,
                              q_positions=jnp.asarray(positions), tree=tree)
    out = paged_attention_pallas(q, cache.kv_pages, tables, ctx, D ** -0.5,
                                 q_positions=jnp.asarray(positions),
                                 layer=jnp.asarray(1, jnp.int32), tree=tree)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=4e-2, rtol=4e-2)
