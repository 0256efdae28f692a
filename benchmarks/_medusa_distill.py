"""Self-distillation phase for the Medusa heads — QUANTIZED-base corpus.

Serving acceptance compares head proposals against the QUANTIZED base's own
greedy continuation (bench.py A/Bs the int4 engine against itself), not
against clean training sequences and not against the float base. Measured
(scratch/exp43_medusa_quant_drift.py + step-0 distill logs): heads trained
on the clean copy distribution chain to 3.83 expected accepted/round
teacher-forced, stay ~3.8 on the FLOAT base's own continuations (the float
base barely drifts), but drop to 2.27 teacher-forcing the INT4 engine's
continuations and to 1.56 served — the QuaRot int4 rounding perturbs the
greedy trajectory into corrupted near-periodic suffixes the heads never
saw. The reference's Medusa recipe trains on model-generated data for the
same distribution-matching reason (vllm/model_executor/models/medusa.py
serves such distillation artifacts).

So this phase: (1) quantizes the frozen base exactly as serving will
(model_loader.quantize_float, same seed), (2) greedy-decodes it through the
REAL engine (LLMEngine, w4a16) on induction prompts, (3) teacher-forces the
continuations back through the engine forward to collect the post-norm
serving-basis hidden at every position, and (4) trains the heads on those
(hidden, next-tokens) pairs — the literal quantity rejection sampling
accepts at serving time.
"""

from __future__ import annotations

import time

import numpy as np


def build_quant_corpus(base_params, cfg, rope, *, n_seqs: int,
                       prompt_len: int, total_len: int, quant_seed: int,
                       seed: int, batch: int = 32):
    """Returns (z [N, T, H] f32 np, tokens [N, T] i32 np) from the int4
    engine's own greedy continuations."""
    import jax
    import jax.numpy as jnp

    from train_induction import to_hf_state_dict

    from qspec_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.model_loader.loader import quantize_float
    from qspec_tpu.models.llama import AttentionBatch, model_forward
    from qspec_tpu.ops import kv_cache as kvc
    from qspec_tpu.sampling_params import SamplingParams

    sd = to_hf_state_dict({**base_params, "rope_cache": rope}, cfg)
    sd = {k: np.asarray(jax.device_get(v)) for k, v in sd.items()}
    cfg_f = ModelConfig(**{k: v for k, v in cfg.__dict__.items()
                           if not k.startswith("_")})
    params_q, cfg_q = quantize_float(sd, cfg_f, seed=quant_seed)

    V = cfg.vocab_size
    rng = np.random.default_rng(seed + 51)
    prompts = []
    for _ in range(n_seqs):
        period = int(rng.integers(16, 65))
        seg = rng.integers(2, V, size=period)
        prompts.append([int(x) for x in
                        np.tile(seg, prompt_len // period + 1)[:prompt_len]])

    sched = SchedulerConfig(max_num_seqs=batch,
                            max_model_len=total_len + 8,
                            prefill_chunk_size=512,
                            max_num_batched_tokens=4096,
                            decode_batch_buckets=(batch,),
                            prefill_token_buckets=(256, 512),
                            steps_per_decode_call=16)
    eng = LLMEngine(EngineConfig(model=cfg_q,
                                 cache=CacheConfig(page_size=128),
                                 scheduler=sched), params_q)
    max_tokens = total_len - prompt_len
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0,
                                          max_tokens=max_tokens,
                                          ignore_eos=True))
    outs = {}
    t0 = time.time()
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[int(o.request_id)] = o.output_token_ids
    print(f"distill corpus: generated {n_seqs} x {max_tokens} tokens "
          f"({time.time()-t0:.0f}s)", flush=True)

    toks = np.zeros((n_seqs, total_len), np.int32)
    for i, p in enumerate(prompts):
        seq = list(p) + list(outs[i])
        toks[i] = np.asarray(seq[:total_len], np.int32)

    # teacher-force through the same engine forward for serving-basis hidden
    page = 128
    npg = (total_len + page - 1) // page
    fb = 8  # featurize batch

    @jax.jit
    def featurize(pq, tb):
        # pq passed as an ARG: closing weights over a jit on this platform
        # turns them into HLO constants the remote compile service uploads
        B = tb.shape[0]
        kv_cfg = kvc.KVCacheConfig(num_layers=cfg_q.num_layers,
                                   num_kv_heads=cfg_q.num_kv_heads,
                                   head_dim=cfg_q.head_dim,
                                   num_pages=B * npg + 2, page_size=page)
        cache = kvc.allocate(kv_cfg)
        pos = jnp.arange(total_len, dtype=jnp.int32)
        bt = (jnp.arange(B)[:, None] * npg + jnp.arange(npg)[None] + 1)
        slots = bt[:, pos // page] * page + (pos % page)[None]  # [B, T]
        batch_meta = AttentionBatch(
            positions=jnp.broadcast_to(pos[None], (B, total_len)),
            slot_mapping=slots.astype(jnp.int32),
            block_tables=bt.astype(jnp.int32),
            ctx_lens=jnp.full((B,), total_len, jnp.int32))
        _, hidden, _ = model_forward(pq, cfg_q, tb, cache, batch_meta,
                                     scheme="w4a16", return_hidden="all")
        return hidden.astype(jnp.float32)

    zs = []
    t0 = time.time()
    for i in range(0, n_seqs, fb):
        tb = jnp.asarray(toks[i:i + fb])
        if tb.shape[0] < fb:  # pad the tail group to the compiled shape
            pad = np.zeros((fb - tb.shape[0], total_len), np.int32)
            z = np.asarray(jax.device_get(
                featurize(params_q, jnp.concatenate([tb, jnp.asarray(pad)]))))
            zs.append(z[:tb.shape[0]])
        else:
            zs.append(np.asarray(jax.device_get(featurize(params_q, tb))))
    z = np.concatenate(zs).astype(np.float32)
    print(f"distill corpus: featurized -> z {z.shape} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return z, toks


def distill_heads(heads, z, toks, *, prompt_len: int, steps: int,
                  batch: int = 16, lr: float = 1e-4, seed: int = 0,
                  log_every: int = 100, holdout: int = 64):
    """Train heads (base frozen — z precomputed) to predict the engine's own
    future tokens. Returns (heads, held-out per-head agreement).

    Held-out agreement is monitored during training and the best-held-out
    snapshot is returned: a fixed corpus memorizes fast (a 1500-step run at
    lr 5e-4 on 224 seqs hit 0.97 train / 0.51 held-out — WORSE than the
    clean-trained init's 0.74), so this phase is an early-stopped gentle
    adaptation, not a from-scratch fit."""
    import jax
    import jax.numpy as jnp
    import optax

    heads_k = int(heads["b1"].shape[0])
    N, T, H = z.shape
    Tn = T - heads_k - 1
    n_train = N - holdout

    hmask = (np.arange(Tn) >= prompt_len - heads_k - 1)

    def loss_fn(hd, zb, tb):
        B = zb.shape[0]
        m = jnp.broadcast_to(jnp.asarray(hmask)[None], (B, Tn))

        def head_loss(j):
            r = zb + jax.nn.silu(zb @ hd["w1"][j] + hd["b1"][j])
            lg = r @ hd["head"][j]
            lgj = jax.lax.dynamic_slice_in_dim(lg, 0, Tn, 1)
            tgtj = jax.lax.dynamic_slice_in_dim(tb, j + 2, Tn, 1)
            lpj = jax.nn.log_softmax(lgj)
            nllj = -jnp.take_along_axis(lpj, tgtj[..., None], -1)[..., 0]
            lj = (nllj * m).sum() / m.sum()
            aj = ((lgj.argmax(-1) == tgtj) & m).sum() / m.sum()
            return lj, aj

        hls, accs = jax.lax.map(head_loss, jnp.arange(heads_k))
        return hls.sum(), accs

    warmup = min(50, max(1, steps // 10))
    tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(steps, warmup + 1)), weight_decay=0.01)
    opt_state = tx.init(heads)

    @jax.jit
    def step(hd, s, zb, tb):
        (l, accs), g = jax.value_and_grad(loss_fn, has_aux=True)(hd, zb, tb)
        updates, s = tx.update(g, s, hd)
        return optax.apply_updates(hd, updates), s, l, accs

    ev = jax.jit(loss_fn)

    def heldout_accs(hd):
        tot = np.zeros(heads_k)
        nev = 0
        for i in range(n_train, N - batch + 1, batch):
            _, a = jax.device_get(ev(hd, jnp.asarray(z[i:i + batch]),
                                     jnp.asarray(toks[i:i + batch])))
            tot += np.asarray(a) * batch
            nev += batch
        return tot / max(nev, 1)

    rng = np.random.default_rng(seed + 73)
    t0 = time.time()
    # chained-acceptance score decides "best": what a spec round earns
    best = (-1.0, jax.tree.map(lambda a: a, heads), None)
    for i in range(steps):
        idx = rng.integers(0, n_train, size=batch)
        heads, opt_state, l, accs = step(heads, opt_state,
                                         jnp.asarray(z[idx]),
                                         jnp.asarray(toks[idx]))
        if i % log_every == 0 or i == steps - 1:
            ho = heldout_accs(heads)
            score = float(np.cumprod(ho).sum())
            l, a = jax.device_get((l, accs))
            print(f"distill {i}: loss {float(l):.4f} train "
                  f"{[round(float(x), 3) for x in a]} held-out "
                  f"{[round(float(x), 3) for x in ho]} chain {score:.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            if score > best[0]:
                best = (score, jax.tree.map(lambda a: a, heads),
                        [float(x) for x in ho])

    _, heads, accs = best
    print(f"distill best held-out self-agreement: "
          f"{[round(x, 3) for x in accs]}", flush=True)
    return heads, accs
