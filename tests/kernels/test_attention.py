"""Paged attention: Pallas kernel (interpret) vs dense reference, all phases.

Mirrors reference tests/kernels/test_attention.py parameter sweeps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.attention import paged_attention_ref, prefill_attention_ref
from qspec_tpu.ops.attention_pallas import paged_attention_pallas


def make_cache(rng, Hkv=2, P=16, S=8, D=64, L=1):
    cfg = kvc.KVCacheConfig(num_layers=L, num_kv_heads=Hkv, head_dim=D,
                            num_pages=P, page_size=S)
    cache = kvc.allocate(cfg)
    kv = rng.standard_normal(cache.kv_pages.shape).astype(np.float32)
    return cache._replace(kv_pages=jnp.asarray(kv, jnp.bfloat16))


@pytest.mark.parametrize("Q", [1, 4])  # decode and verify widths
def test_pallas_matches_ref(rng, Q):
    B, Hq, Hkv, D, S = 3, 4, 2, 64, 8
    cache = make_cache(rng, Hkv=Hkv, S=S, D=D)
    q = jnp.asarray(rng.standard_normal((B, Q, Hq, D)).astype(np.float32),
                    jnp.bfloat16)
    block_tables = jnp.asarray(rng.permutation(np.arange(1, 13)).reshape(3, 4)
                               .astype(np.int32))
    ctx_lens = jnp.asarray([Q + 3, S + Q, 2 * S + Q], jnp.int32)
    scale = D ** -0.5

    ref = paged_attention_ref(q, cache, 0, block_tables, ctx_lens, scale)
    out = paged_attention_pallas(q, cache.kv_pages,
                                 block_tables, ctx_lens, scale,
                                 pages_per_chunk=2)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2)


def test_causality_within_window(rng):
    """Later queries in the window see more context than earlier ones."""
    B, Q, Hq, Hkv, D, S = 1, 4, 2, 2, 64, 8
    cache = make_cache(rng, Hkv=Hkv, S=S, D=D)
    q = jnp.asarray(rng.standard_normal((B, Q, Hq, D)).astype(np.float32),
                    jnp.bfloat16)
    tables = jnp.asarray([[1, 2]], jnp.int32)
    ctx = jnp.asarray([Q + 4], jnp.int32)
    out = paged_attention_ref(q, cache, 0, tables, ctx, D ** -0.5)
    # query 0 must be independent of kv positions > 4
    kv2 = cache.kv_pages.at[0, 2, 0].set(999.0)  # page id 2 holds positions 8..15
    cache2 = cache._replace(kv_pages=kv2)
    out2 = paged_attention_ref(q, cache2, 0, tables, ctx, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out[:, 0], np.float32),
                               np.asarray(out2[:, 0], np.float32), atol=1e-6)


def test_prefill_ref_matches_dense(rng):
    """prefill via paged path == dense causal attention."""
    T, Hq, Hkv, D, S = 12, 4, 2, 32, 4
    cache = make_cache(rng, Hkv=Hkv, S=S, D=D, P=8)
    k_new = rng.standard_normal((T, Hkv, D)).astype(np.float32)
    v_new = rng.standard_normal((T, Hkv, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((T, Hq, D)).astype(np.float32), jnp.bfloat16)
    slots = jnp.asarray([(i // S + 1) * S + i % S for i in range(T)], jnp.int32)
    cache = kvc.update_layer(cache, 0, jnp.asarray(k_new, jnp.bfloat16),
                             jnp.asarray(v_new, jnp.bfloat16), slots)
    tables = jnp.asarray([[1, 2, 3]], jnp.int32)
    out = paged_attention_ref(q[None], cache, 0, tables,
                              jnp.asarray([T], jnp.int32), D ** -0.5)
    dense = prefill_attention_ref(q, jnp.asarray(k_new, jnp.bfloat16),
                                  jnp.asarray(v_new, jnp.bfloat16), D ** -0.5)
    np.testing.assert_allclose(np.asarray(out[0], np.float32),
                               np.asarray(dense, np.float32), atol=2e-2, rtol=2e-2)


def test_padded_prefill_matches_exact(rng):
    """Regression: end-padded prefill (Q > ctx) must give identical outputs
    at valid positions as exact-length prefill — padding queries and extra
    (lookahead) pages in the block table must not leak into the mask."""
    import jax.numpy as jnp
    from qspec_tpu.config import ModelConfig
    from qspec_tpu.engine.model_runner import prefill_step
    from qspec_tpu.models.llama import init_params

    cfg = ModelConfig.tiny(quant="w4")
    params = init_params(cfg, 0)
    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                             num_pages=64, page_size=16)
    P = 23
    prompt = rng.integers(1, 500, size=P).astype(np.int32)

    outs = []
    for Q, tbl in [(32, [1, 2, 0, 0]), (64, [1, 2, 0, 0]), (64, [1, 2, 3, 4]),
                   (64, [9, 4, 7, 2])]:
        cache = kvc.allocate(kcfg)
        # pollute an unused page to catch leaks
        cache = cache._replace(kv_pages=cache.kv_pages.at[:, 30].set(5.0))
        toks = np.zeros((1, Q), np.int32)
        toks[0, :P] = prompt
        tables = np.zeros((1, 16), np.int32)
        tables[0, :len(tbl)] = tbl
        logits, _ = prefill_step(
            params, cache, jnp.asarray(toks),
            jnp.asarray(np.arange(Q, dtype=np.int32)[None]),
            jnp.asarray(tables), jnp.asarray([P], np.int32),
            cfg=cfg, scheme="w4a16")
        outs.append(np.asarray(logits[0], np.float32))
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("kv_dtype", ["int8", "fp8_e4m3", "fp8_e5m2"])
def test_quantized_kv_cache_roundtrip(rng, kv_dtype):
    """8-bit KV options (reference kv_cache_dtype int8/fp8,
    csrc/cache_kernels.cu conversion paths): write-quantize via
    update_layer, read-dequantize via gather_layer."""
    cfg = kvc.KVCacheConfig(num_layers=1, num_kv_heads=2, head_dim=32,
                            num_pages=4, page_size=4, dtype=kv_dtype)
    cache = kvc.allocate(cfg)
    assert (cache.kv_scales is not None) == kvc.kv_has_scales(kv_dtype)
    k = jnp.asarray(rng.standard_normal((4, 2, 32)).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((4, 2, 32)).astype(np.float32), jnp.bfloat16)
    slots = jnp.asarray([4, 5, 6, 7], jnp.int32)
    cache = kvc.update_layer(cache, 0, k, v, slots)
    kd, vd = kvc.gather_layer(cache, 0, jnp.asarray([[1]], jnp.int32))
    assert kd.dtype == jnp.bfloat16
    # e5m2 keeps only 2 mantissa bits: widest tolerance of the three
    tol = dict(int8=(0.03, 0.05), fp8_e4m3=(0.03, 0.07),
               fp8_e5m2=(0.2, 0.25))[kv_dtype]
    np.testing.assert_allclose(np.asarray(kd[0, :, :4], np.float32).transpose(1, 0, 2),
                               np.asarray(k, np.float32), atol=tol[0], rtol=tol[1])


def test_pallas_large_query_blocks(rng):
    """G > 256 exercises the query-block grid dimension (prefill shapes)."""
    B, Q, Hq, Hkv, D, S = 1, 160, 4, 2, 64, 8
    cache = make_cache(rng, Hkv=Hkv, S=S, D=D, P=32)
    q = jnp.asarray(rng.standard_normal((B, Q, Hq, D)).astype(np.float32),
                    jnp.bfloat16)
    tables = jnp.asarray(np.arange(1, 26)[None], jnp.int32)
    ctx = jnp.asarray([Q + 30], jnp.int32)
    pos = jnp.arange(30, 30 + Q, dtype=jnp.int32)[None]
    ref = paged_attention_ref(q, cache, 0, tables, ctx, D ** -0.5, q_positions=pos)
    out = paged_attention_pallas(q, cache.kv_pages,
                                 tables, ctx, D ** -0.5, pages_per_chunk=4,
                                 q_positions=pos)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("Q", [1, 4])
@pytest.mark.parametrize("kv_dtype", ["int8", "fp8_e4m3", "fp8_e5m2"])
def test_pallas_quantized_kv_matches_ref(rng, Q, kv_dtype):
    """8-bit KV stays on the Pallas fast path: int8/fp8_e4m3 stream scales
    with the pages and fold them into score space (k) / probabilities (v);
    fp8_e5m2 dequantizes with a bare in-kernel astype."""
    B, Hq, Hkv, D, S = 3, 4, 2, 64, 8
    cfg = kvc.KVCacheConfig(num_layers=1, num_kv_heads=Hkv, head_dim=D,
                            num_pages=16, page_size=S, dtype=kv_dtype)
    cache = kvc.allocate(cfg)
    # populate via update_layer so quantization matches production writes
    T = 40
    k_new = jnp.asarray(rng.standard_normal((T, Hkv, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((T, Hkv, D)), jnp.bfloat16)
    slots = jnp.asarray(np.arange(T) + S, jnp.int32)  # pages 1..5
    cache = kvc.update_layer(cache, 0, k_new, v_new, slots)

    q = jnp.asarray(rng.standard_normal((B, Q, Hq, D)).astype(np.float32),
                    jnp.bfloat16)
    block_tables = jnp.asarray(np.tile(np.arange(1, 6), (B, 1)).astype(np.int32))
    ctx_lens = jnp.asarray([Q + 3, S + Q, 3 * S + Q], jnp.int32)
    scale = D ** -0.5

    ref = paged_attention_ref(q, cache, 0, block_tables, ctx_lens, scale)
    out = paged_attention_pallas(q, cache.kv_pages, block_tables, ctx_lens,
                                 scale, kv_scales=cache.kv_scales)
    tol = 8e-2 if kv_dtype == "fp8_e5m2" else 4e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=tol)


# -- sliding window (Mistral; reference quarot_llama.py:125-136) ------------

def _dense_window_oracle(rng, q, cache, tables, ctx, scale, window, q_pos=None):
    """Brute-force: gather tokens, mask [pos-W+1, pos], softmax."""
    from qspec_tpu.ops.kv_cache import gather_layer
    B, Q, Hq, D = q.shape
    if q_pos is None:
        q_pos = (np.asarray(ctx)[:, None] - Q) + np.arange(Q)[None, :]
    k, v = gather_layer(cache, 0, tables)
    k = np.asarray(k, np.float32)
    v = np.asarray(v, np.float32)
    Hkv = k.shape[1]
    group = Hq // Hkv
    qf = np.asarray(q, np.float32).reshape(B, Q, Hkv, group, D) * scale
    s = np.einsum("bqhgd,bhcd->bhgqc", qf, k)
    kv_pos = np.arange(k.shape[2])
    mask = (kv_pos[None, None] <= q_pos[:, :, None]) & \
           (kv_pos[None, None] > q_pos[:, :, None] - window)
    s = np.where(mask[:, None, None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    out = np.einsum("bhgqc,bhcd->bqhgd", p, v)
    return out.reshape(B, Q, Hq, D)


@pytest.mark.parametrize("Q,window", [(1, 8), (1, 12), (4, 8), (4, 5)])
def test_sliding_window_ref_matches_oracle(rng, Q, window):
    B, Hq, Hkv, D, S = 3, 4, 2, 64, 8
    cache = make_cache(rng, Hkv=Hkv, S=S, D=D)
    q = jnp.asarray(rng.standard_normal((B, Q, Hq, D)).astype(np.float32),
                    jnp.bfloat16)
    tables = jnp.asarray(rng.permutation(np.arange(1, 13)).reshape(3, 4)
                         .astype(np.int32))
    ctx = jnp.asarray([Q + 3, S + Q, 3 * S + Q], jnp.int32)
    scale = D ** -0.5
    ref = paged_attention_ref(q, cache, 0, tables, ctx, scale, window=window)
    oracle = _dense_window_oracle(rng, q, cache, tables, ctx, scale, window)
    np.testing.assert_allclose(np.asarray(ref, np.float32), oracle,
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("Q,window", [(1, 8), (4, 8), (4, 21), (1, 40)])
def test_sliding_window_pallas_matches_ref(rng, Q, window):
    """Kernel (with its out-of-window page skip) == masked reference."""
    B, Hq, Hkv, D, S = 3, 4, 2, 64, 8
    cache = make_cache(rng, Hkv=Hkv, S=S, D=D, P=32)
    q = jnp.asarray(rng.standard_normal((B, Q, Hq, D)).astype(np.float32),
                    jnp.bfloat16)
    tables = jnp.asarray(rng.permutation(np.arange(1, 25)).reshape(3, 8)
                         .astype(np.int32))
    # long contexts so the skip actually drops leading pages (max fits the
    # 8-page tables)
    ctx = jnp.asarray([Q + 3, 4 * S + Q, 8 * S - 2], jnp.int32)
    scale = D ** -0.5
    ref = paged_attention_ref(q, cache, 0, tables, ctx, scale, window=window)
    out = paged_attention_pallas(q, cache.kv_pages, tables, ctx, scale,
                                 window=window)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_sliding_window_prefill_ref(rng):
    T, Hq, Hkv, D, W = 16, 4, 2, 64, 6
    q = rng.standard_normal((T, Hq, D)).astype(np.float32)
    k = rng.standard_normal((T, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((T, Hkv, D)).astype(np.float32)
    out = prefill_attention_ref(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                D ** -0.5, window=W)
    # row t must ignore keys < t-W+1: zeroing key 0 can't change row 8
    k2 = k.copy()
    k2[0] = 77.0
    out2 = prefill_attention_ref(jnp.asarray(q), jnp.asarray(k2),
                                 jnp.asarray(v), D ** -0.5, window=W)
    np.testing.assert_allclose(np.asarray(out[8:], np.float32),
                               np.asarray(out2[8:], np.float32), atol=1e-6)
    # ...but row 1 (keys {0, 1} visible) must see the change
    with pytest.raises(AssertionError):
        np.testing.assert_allclose(np.asarray(out[1], np.float32),
                                   np.asarray(out2[1], np.float32), atol=1e-3)


@pytest.mark.parametrize("Q", [1, 4])  # decode and verify widths
def test_alibi_pallas_matches_ref(rng, Q):
    """ALiBi bias (BLOOM/MPT/JAIS/Baichuan-13B): slope * (kv_pos - q_pos)
    added pre-softmax, grouped-query heads each carrying their own slope
    (reference flash_attn.py:603-619 bias build)."""
    from qspec_tpu.ops.attention import alibi_slopes

    B, Hq, Hkv, D, S = 3, 4, 2, 64, 8
    cache = make_cache(rng, Hkv=Hkv, S=S, D=D)
    q = jnp.asarray(rng.standard_normal((B, Q, Hq, D)).astype(np.float32),
                    jnp.bfloat16)
    tables = jnp.asarray(rng.permutation(np.arange(1, 13)).reshape(3, 4)
                         .astype(np.int32))
    ctx = jnp.asarray([Q + 3, S + Q, 2 * S + Q], jnp.int32)
    scale = D ** -0.5
    sl = jnp.asarray(alibi_slopes(Hq))

    ref = paged_attention_ref(q, cache, 0, tables, ctx, scale, alibi=sl)
    out = paged_attention_pallas(q, cache.kv_pages, tables, ctx, scale,
                                 alibi=sl)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)
    # the bias must actually matter: no-alibi output differs
    base = paged_attention_ref(q, cache, 0, tables, ctx, scale)
    assert not np.allclose(np.asarray(ref, np.float32),
                           np.asarray(base, np.float32), atol=1e-3)


def test_alibi_slopes_match_hf():
    """Closed-form slopes == transformers' BLOOM builder (power-of-2 and
    interpolated non-power-of-2 head counts)."""
    torch = pytest.importorskip("torch")
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor

    from qspec_tpu.ops.attention import alibi_slopes

    for n in (4, 8, 6, 12):
        mask = torch.ones(1, 5)
        alibi = build_alibi_tensor(mask, n, torch.float32)  # [n, 1, 5]
        # slope = bias at distance 1 relative to distance 0... the tensor is
        # slopes * arange(seq), so column 1 IS the slope
        hf = alibi[:, 0, 1].numpy()
        np.testing.assert_allclose(alibi_slopes(n), hf, rtol=1e-6)


@pytest.mark.parametrize("prefix", [3, 5])
def test_tree_mask_pallas_matches_ref(rng, prefix):
    """Medusa tree verify: [rewrite-prefix | tree] rectangle under the
    tree-structured causal mask (ancestor bits per tree query) — Pallas
    interpret vs the dense reference."""
    from qspec_tpu.spec_decode.medusa_tree import DEFAULT_TREE, build_tree

    tspec = build_tree(DEFAULT_TREE)
    T = tspec.num_nodes
    B, Hq, Hkv, D, S = 2, 4, 2, 64, 8
    Q = prefix + T
    cache = make_cache(rng, Hkv=Hkv, S=S, D=D, P=24)
    q = jnp.asarray(rng.standard_normal((B, Q, Hq, D)).astype(np.float32),
                    jnp.bfloat16)
    tables = jnp.asarray(rng.permutation(np.arange(1, 21)).reshape(2, 10)
                         .astype(np.int32))
    # root at slot pos; tree slots pos+1..pos+T must fit the tables
    pos = np.asarray([17, 30], np.int32)
    q_start = jnp.asarray(pos - (prefix - 1), jnp.int32)
    depth = np.asarray(tspec.depth, np.int32)
    positions = np.concatenate([
        q_start[:, None] + np.arange(prefix)[None, :],
        pos[:, None] + depth[None, :]], axis=1)
    ctx = jnp.asarray(pos + 1 + T, jnp.int32)
    tree = (prefix, tspec.ancestors)
    scale = D ** -0.5

    ref = paged_attention_ref(q, cache, 0, tables, ctx, scale,
                              q_positions=jnp.asarray(positions), tree=tree)
    out = paged_attention_pallas(q, cache.kv_pages, tables, ctx, scale,
                                 q_positions=jnp.asarray(positions),
                                 tree=tree)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)
    # structural check: a tree query must IGNORE its non-ancestor siblings
    # (slot-space garbage): perturb a depth-1 node's KV slot and assert the
    # sibling depth-1 queries are unchanged while its own child changes
    root_slot = int(pos[0])
    sib_slot = root_slot + 1 + 1          # node index 1 = path (1,)
    page, off = sib_slot // S, sib_slot % S
    pid = int(np.asarray(tables)[0, page])
    kv2 = cache.kv_pages.at[0, pid, :, :, off].set(99.0)
    out2 = paged_attention_ref(q, cache._replace(kv_pages=kv2), 0, tables,
                               ctx, scale,
                               q_positions=jnp.asarray(positions), tree=tree)
    # node 0 (path (0,)) is not a descendant of node 1: row prefix+0
    np.testing.assert_allclose(np.asarray(ref[0, prefix], np.float32),
                               np.asarray(out2[0, prefix], np.float32),
                               atol=1e-6)
    # node (1, 0) IS node 1's child: must see the perturbation
    child = tspec.choices.index((1, 0))
    assert not np.allclose(np.asarray(ref[0, prefix + child], np.float32),
                           np.asarray(out2[0, prefix + child], np.float32),
                           atol=1e-3)
