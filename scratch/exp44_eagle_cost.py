"""Where does an EAGLE round's time go? (r03: 0.711x AR at 0.9869 acc)

At 0.99 acceptance and k=8 a round emits ~8.9 tokens; to lose to AR the
round must cost ~12x an AR step. Times the production eagle_rounds_step
against its components with FIXED inputs:
  - AR multi_decode per-step (baseline)
  - eagle_rounds_step per round at k in {8, 4, 2}
  - components: span re-feed (1 eagle layer over k+1), the k-iteration
    sequential draft loop, verify_onehot (k+1 trunk positions), and the
    single-iteration pieces (lm_head+argmax / fuse+embed / eagle layer)
Run: python scratch/exp44_eagle_cost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_eagle_regime, induction_prompts
from qspec_tpu.config import (CacheConfig, EngineConfig, SchedulerConfig,
                              SpeculativeConfig)
from qspec_tpu.engine.llm_engine import LLMEngine
from qspec_tpu.engine.model_runner import (make_sampling_tensors,
                                           _pad_sampling, _slot_of,
                                           compute_logits_jit, _embed_rows_of)
from qspec_tpu.sampling_params import SamplingParams

B = 4
PROMPT = 384
ROUNDS = 8


def build_engine(cfg, params, *, spec_method=None, k=8):
    sched = SchedulerConfig(max_num_seqs=B, max_model_len=1000,
                            prefill_chunk_size=512,
                            max_num_batched_tokens=4096,
                            decode_batch_buckets=(B,),
                            prefill_token_buckets=(256, 512, 1024),
                            steps_per_decode_call=32 if spec_method is None
                            else 1)
    spec = None
    if spec_method:
        spec = SpeculativeConfig(num_speculative_tokens=k,
                                 rounds_per_step=ROUNDS, method=spec_method)
    ec = EngineConfig(model=cfg, cache=CacheConfig(page_size=128),
                      scheduler=sched, speculative=spec)
    eng = LLMEngine(ec, params)
    prompts = induction_prompts(B, PROMPT, cfg.vocab_size)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=512,
                                          ignore_eos=True))
    while True:
        b = eng.scheduler.schedule()
        if b.kind != "prefill":
            break
        eng._run_prefill(b)
    return eng, b.seqs


def timeit(f, warmup=2, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg, params, train_seq = load_eagle_regime()
    assert cfg is not None
    print(f"platform={jax.default_backend()} "
          f"V={cfg.vocab_size} H={cfg.hidden_size} L={cfg.num_layers}")

    # ---- AR baseline --------------------------------------------------
    eng, seqs = build_engine(cfg, params, spec_method=None)
    r = eng.runner
    st = _pad_sampling(make_sampling_tensors(seqs, cfg.vocab_size, None),
                       len(seqs), B)
    last = jnp.asarray([s.last_token() for s in seqs], jnp.int32)
    pos = jnp.asarray([s.num_tokens - 1 for s in seqs], jnp.int32)
    budget = jnp.full((B,), 500, jnp.int32)
    tables = jnp.asarray(r._pad_block_tables([s.page_ids for s in seqs]))
    key = jax.random.PRNGKey(0)

    def ar_call():
        toks, lps, adv, r.cache = r.fns["multi_decode"](
            r.params, r.cache, last, pos, tables, budget, st, key, None)
        return toks
    t = timeit(ar_call)
    per_step = t / 32
    print(f"AR multi_decode(32): {t*1e3:.2f} ms/call -> "
          f"{per_step*1e6:.0f} us/step -> {B/per_step:.0f} tok/s")

    # ---- full eagle rounds at k sweep ---------------------------------
    for k in (8, 4, 2):
        eng, seqs = build_engine(cfg, params, spec_method="eagle", k=k)
        r = eng.runner
        st = _pad_sampling(make_sampling_tensors(seqs, cfg.vocab_size, None),
                           len(seqs), B)
        tables = jnp.asarray(r._pad_block_tables([s.page_ids for s in seqs]))
        H = cfg.hidden_size
        h_span = jnp.zeros((B, k + 1, H), jnp.bfloat16)
        t_span = jnp.zeros((B, k + 1), jnp.int32)
        span_pos = jnp.asarray([s.num_tokens - 1 for s in seqs], jnp.int32)
        span_len = jnp.ones((B,), jnp.int32)
        budget = jnp.full((B,), 500, jnp.int32)

        def eg_call():
            toks, accs, lps, adv, r.draft_cache, r.cache = \
                r.fns["eagle_rounds"](
                    r.params, r.draft_cache, r.cache, h_span, t_span,
                    span_pos, span_len, tables, budget, st, key)
            return toks, accs
        t = timeit(eg_call)
        per_round = t / ROUNDS
        _, accs = jax.device_get(eg_call())
        acc_mean = float(np.mean(accs))
        print(f"eagle k={k}: {t*1e3:.2f} ms/call -> "
              f"{per_round*1e6:.0f} us/round (= {per_round/per_step:.2f} AR "
              f"steps) mean_acc={acc_mean:.2f} "
              f"-> {B*acc_mean/per_round:.0f} tok/s")

    # ---- components at k=8 --------------------------------------------
    k = 8
    eng, seqs = build_engine(cfg, params, spec_method="eagle", k=k)
    r = eng.runner
    ecfg = r.draft_cfg
    st = _pad_sampling(make_sampling_tensors(seqs, cfg.vocab_size, None),
                       len(seqs), B)
    tables = jnp.asarray(r._pad_block_tables([s.page_ids for s in seqs]))
    H = cfg.hidden_size
    pos = jnp.asarray([s.num_tokens - 1 for s in seqs], jnp.int32)
    page_size = r.cache.page_size
    from qspec_tpu.spec_decode.eagle import eagle_layer_step, fuse_features
    from qspec_tpu.engine.model_runner import AttentionBatch

    h_hat0 = jnp.zeros((B, H), jnp.bfloat16)
    eagle = {kk: vv for kk, vv in r.params["eagle"].items()}
    lm_head = r.params["lm_head"]

    @jax.jit
    def span_refeed(draft_cache, h_span, t_span):
        feats = fuse_features(eagle, _embed_rows_of(r.params, cfg, t_span),
                              h_span)
        fpos = pos[:, None] + jnp.arange(k + 1)[None, :]
        fslot = _slot_of(tables, fpos, page_size)
        fb = AttentionBatch(positions=fpos, slot_mapping=fslot,
                            block_tables=tables, ctx_lens=pos + k + 1)
        a, draft_cache = eagle_layer_step(eagle, ecfg, draft_cache, feats, fb)
        return a, draft_cache

    h_span = jnp.zeros((B, k + 1, H), jnp.bfloat16)
    t_span = jnp.zeros((B, k + 1), jnp.int32)
    t = timeit(lambda: span_refeed(r.draft_cache, h_span, t_span))
    print(f"  span re-feed (k+1 feats, 1 eagle layer): {t*1e6:.0f} us")

    @jax.jit
    def draft_loop(draft_cache, h_hat):
        def draft_one(j, carry):
            h_hat, draft_cache, props = carry
            d = jnp.argmax(compute_logits_jit(h_hat, lm_head),
                           axis=-1).astype(jnp.int32)
            props = props.at[:, j].set(d)
            fp = (pos + j)[:, None]
            fs = _slot_of(tables, fp, page_size)
            fb = AttentionBatch(positions=fp, slot_mapping=fs,
                                block_tables=tables, ctx_lens=pos + j + 1)
            f = fuse_features(eagle, _embed_rows_of(r.params, cfg, d[:, None]),
                              h_hat[:, None])
            a1, draft_cache = eagle_layer_step(eagle, ecfg, draft_cache, f, fb)
            return a1[:, 0], draft_cache, props
        props = jnp.zeros((B, k), jnp.int32)
        h_hat, draft_cache, props = jax.lax.fori_loop(
            0, k, draft_one, (h_hat, draft_cache, props))
        return props, draft_cache
    t = timeit(lambda: draft_loop(r.draft_cache, h_hat0))
    print(f"  draft loop (k={k} sequential): {t*1e6:.0f} us "
          f"({t/k*1e6:.0f} us/iter)")

    d_toks = jnp.zeros((B, k), jnp.int32)

    def verify_call():
        res, r.cache = r.fns["verify_onehot"](
            r.params, r.cache, last, d_toks, pos, tables, st, key)
        return res.tokens
    t = timeit(verify_call)
    print(f"  verify_onehot (Q={k+1} trunk): {t*1e6:.0f} us")

    # single-iteration pieces
    @jax.jit
    def lm_head_argmax(h):
        return jnp.argmax(compute_logits_jit(h, lm_head), axis=-1)
    t = timeit(lambda: lm_head_argmax(h_hat0))
    print(f"  lm_head+argmax (1 tok): {t*1e6:.0f} us")

    @jax.jit
    def fuse_one(d, h):
        return fuse_features(eagle, _embed_rows_of(r.params, cfg, d[:, None]),
                             h[:, None])
    d0 = jnp.zeros((B,), jnp.int32)
    t = timeit(lambda: fuse_one(d0, h_hat0))
    print(f"  embed+fuse (1 tok): {t*1e6:.0f} us")

    @jax.jit
    def layer_one(draft_cache, f):
        fp = pos[:, None]
        fs = _slot_of(tables, fp, page_size)
        fb = AttentionBatch(positions=fp, slot_mapping=fs,
                            block_tables=tables, ctx_lens=pos + 1)
        a1, draft_cache = eagle_layer_step(eagle, ecfg, draft_cache, f, fb)
        return a1, draft_cache
    f0 = jnp.zeros((B, 1, H), jnp.bfloat16)
    t = timeit(lambda: layer_one(r.draft_cache, f0))
    print(f"  eagle layer (1 tok): {t*1e6:.0f} us")


if __name__ == "__main__":
    main()
