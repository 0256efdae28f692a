"""TP numerics: shard_mapped steps must equal the single-chip results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qspec_tpu.config import ModelConfig
from qspec_tpu.engine.model_runner import prefill_step
from qspec_tpu.models.llama import init_params
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.parallel.tp import (make_mesh, make_tp_step_fns, shard_cache,
                                   shard_params)


@pytest.mark.parametrize("tp", [2, 4])
@pytest.mark.parametrize("scheme", ["w4a16", "w4a4"])
def test_tp_prefill_matches_single(rng, tp, scheme):
    if len(jax.devices()) < tp:
        pytest.skip("needs virtual device mesh")
    cfg = ModelConfig.tiny(quant="w4", num_layers=2, num_heads=4, num_kv_heads=4,
                           head_dim=64, hidden_size=256, intermediate_size=448)
    # NOTE: single-chip params use tp_size=1 packing; TP params pack per shard
    params_tp = init_params(cfg, seed=0, tp_size=tp)
    params_1 = init_params(cfg, seed=0, tp_size=1)

    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                             num_pages=16, page_size=16)
    T = 12
    toks = np.zeros((1, 32), np.int32)
    toks[0, :T] = rng.integers(1, 500, size=T)
    positions = np.arange(32, dtype=np.int32)[None]
    tables = np.zeros((1, 8), np.int32)
    tables[0, :2] = [1, 2]
    ctx = np.asarray([T], np.int32)

    cache0 = kvc.allocate(kcfg)
    ref, _ = prefill_step(params_1, cache0, jnp.asarray(toks),
                          jnp.asarray(positions), jnp.asarray(tables),
                          jnp.asarray(ctx), cfg=cfg, scheme=scheme)

    mesh = make_mesh(tp_size=tp)
    sp = shard_params(params_tp, cfg, mesh)
    cache1 = shard_cache(kvc.allocate(kcfg), mesh)
    fns = make_tp_step_fns(mesh, cfg, sp, scheme, draft_scheme="w4a4", k=2)
    fn = fns["prefill"] if scheme == "w4a16" else fns["prefill_draft"]
    out, _ = fn(sp, cache1, jnp.asarray(toks), jnp.asarray(positions),
                jnp.asarray(tables), jnp.asarray(ctx), None)

    out = np.asarray(out, np.float32)
    ref = np.asarray(ref, np.float32)
    # sharded matmul + psum reorders bf16 reductions; integer-activation
    # schemes amplify that into occasional one-quant-step flips, so compare
    # distributionally tight but pointwise loose
    # int4 activations amplify it into quant-step flips; the tiny test model
    # (hidden 256) makes those relatively large, hence the loose w4a4 bound
    atol = 3e-2 if scheme == "w4a16" else 3e-1
    np.testing.assert_allclose(out, ref, atol=atol, rtol=5e-2)
    assert np.abs(out - ref).mean() < (5e-3 if scheme == "w4a16" else 8e-2)
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > (0.999 if scheme == "w4a16"
                                                          else 0.98)


def test_tp_eagle_matches_single(rng):
    """EAGLE under TP (replicated draft net + draft KV, sharded verify)
    must emit the same greedy tokens as the single-chip path."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual device mesh")
    from qspec_tpu.engine.model_runner import (eagle_rounds_step,
                                               prefill_eagle_step)
    from qspec_tpu.ops.sampling import SamplingTensors
    from qspec_tpu.parallel.tp import replicate
    from qspec_tpu.spec_decode.eagle import eagle_cfg_for, init_eagle_params

    cfg = ModelConfig.tiny(quant="w4", num_layers=2, num_heads=4,
                           num_kv_heads=4, head_dim=64, hidden_size=256,
                           intermediate_size=448)
    ecfg = eagle_cfg_for(cfg)
    eagle = init_eagle_params(cfg, seed=3)
    params_1 = init_params(cfg, seed=0, tp_size=1)
    params_1["eagle"] = eagle
    params_tp = init_params(cfg, seed=0, tp_size=2)
    params_tp["eagle"] = eagle

    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                             num_pages=16, page_size=16)
    ekcfg = kvc.KVCacheConfig(1, ecfg.num_kv_heads, ecfg.head_dim,
                              num_pages=16, page_size=16)
    T, Q, k = 12, 32, 2
    prompt = rng.integers(1, 500, size=T).astype(np.int32)
    toks = np.zeros((1, Q), np.int32)
    toks[0, :T] = prompt
    shifted = np.zeros((1, Q), np.int32)
    shifted[0, :T - 1] = prompt[1:]
    feat_len = np.asarray([T - 1], np.int32)
    positions = np.arange(Q, dtype=np.int32)[None]
    tables = np.zeros((1, 8), np.int32)
    tables[0, :2] = [1, 2]
    ctx = np.asarray([T], np.int32)
    pf_args = tuple(jnp.asarray(a) for a in
                    (toks, shifted, feat_len, positions, tables, ctx))

    def run(params, mesh=None):
        cache, dcache = kvc.allocate(kcfg), kvc.allocate(ekcfg)
        if mesh is not None:
            fns = make_tp_step_fns(mesh, cfg, params, "w4a16",
                                   draft_scheme="w4a4", k=k, num_rounds=2)
            cache = shard_cache(cache, mesh)
            dcache = replicate(dcache, mesh)
            logits, h_last, cache, dcache = fns["prefill_eagle"](
                params, cache, dcache, *pf_args)
        else:
            logits, h_last, cache, dcache = prefill_eagle_step(
                params, cache, dcache, *pf_args, cfg=cfg, ecfg=ecfg,
                scheme="w4a16")
        logits = np.asarray(logits, np.float32)
        t0 = int(np.argmax(logits[0]))
        h_span = np.zeros((1, k + 1, cfg.hidden_size), np.float32)
        h_span[0, 0] = np.asarray(h_last, np.float32)[0]
        t_span = np.zeros((1, k + 1), np.int32)
        t_span[0, 0] = t0
        # span-BANK form: 1 seq row + 1 padding scratch row
        eh = np.zeros((2, k + 1, cfg.hidden_size), np.float32)
        eh[0] = h_span[0]
        et = np.zeros((2, k + 1), np.int32)
        et[0] = t_span[0]
        rd_args = (jnp.asarray(eh, jnp.bfloat16), jnp.asarray(et),
                   jnp.asarray([T - 1, 0], np.int32),
                   jnp.asarray([1, 0], np.int32),
                   jnp.asarray([0], np.int32),       # rows
                   jnp.asarray(tables), jnp.asarray([8], np.int32),
                   SamplingTensors.greedy(1), jax.random.PRNGKey(7))
        if mesh is not None:
            out, accs, _, _, _, dcache, cache = fns["eagle_rounds"](
                params, dcache, cache, *rd_args)
        else:
            out, accs, _, _, _, dcache, cache = eagle_rounds_step(
                params, dcache, cache, *rd_args, cfg=cfg, ecfg=ecfg,
                scheme="w4a16", k=k, num_rounds=2)
        return logits, np.asarray(out), np.asarray(accs)

    logits_1, toks_1, accs_1 = run(params_1)
    mesh = make_mesh(tp_size=2)
    logits_2, toks_2, accs_2 = run(shard_params(params_tp, cfg, mesh),
                                   mesh=mesh)
    np.testing.assert_allclose(logits_2, logits_1, atol=3e-2, rtol=5e-2)
    assert accs_2.tolist() == accs_1.tolist()
    assert toks_2.tolist() == toks_1.tolist()


def test_tp_decode_with_guided_sampling():
    """Regression: batches carrying a vocab_mask / logit_bias (guided
    decoding, penalties) must match the shard_map in_specs (the
    SamplingTensors spec used to cover only 4 of 6 fields and crashed)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual device mesh")
    from qspec_tpu.ops.sampling import SamplingTensors

    cfg = ModelConfig.tiny(quant="w4", num_layers=2, num_heads=4, num_kv_heads=4,
                           head_dim=64, hidden_size=256, intermediate_size=448)
    params_tp = init_params(cfg, seed=0, tp_size=2)
    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                             num_pages=16, page_size=16)
    mesh = make_mesh(tp_size=2)
    sp = shard_params(params_tp, cfg, mesh)
    cache = shard_cache(kvc.allocate(kcfg), mesh)
    fns = make_tp_step_fns(mesh, cfg, sp, "w4a16", draft_scheme="w4a4", k=2)

    B = 2
    allowed = 77
    mask = np.zeros((B, cfg.vocab_size), bool)
    mask[:, allowed] = True
    bias = np.zeros((B, cfg.vocab_size), np.float32)
    bias[:, allowed] = 5.0
    st = SamplingTensors(
        temperature=jnp.zeros(B), top_k=jnp.zeros(B, jnp.int32),
        top_p=jnp.ones(B), min_p=jnp.zeros(B),
        vocab_mask=jnp.asarray(mask), logit_bias=jnp.asarray(bias))
    tables = np.zeros((B, 8), np.int32)
    tables[0, 0] = 1
    tables[1, 0] = 2
    toks, _lp, _cache = fns["decode"](
        sp, cache, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
        jnp.asarray(tables), st, jax.random.PRNGKey(0), None)
    assert np.asarray(toks).tolist() == [allowed] * B
