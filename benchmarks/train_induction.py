"""Train a small REAL language model (in-image) for the honest prompt-lookup
benchmark regime.

The image has zero egress and no pretrained checkpoints, so random-weight
models give structurally unpredictable outputs — speculative acceptance on
them is meaningless. This script trains (with a real training loop, real
loss, real generalization) a small llama-architecture LM on an induction
task: sequences made of a repeated random segment, next-token loss. A
transformer trained this way learns the classic induction-head copy
circuit, so at inference its greedy continuations genuinely repeat
structure found in the prompt — exactly the workload the reference's
prompt-lookup speculation targets (vllm/spec_decode/ngram_worker.py:
"prompt lookup assumes the generation will reuse n-grams from the
context", e.g. summarization / code editing).

The float weights are saved in HF state-dict naming so the existing offline
QuaRot pipeline (model_loader.quantize_float) rotates + int4-quantizes them
for the engine, same as a downloaded checkpoint.

Run: python benchmarks/train_induction.py [--steps 1200] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


DEFAULT_OUT = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                           "induction_lm_v1")


def model_cfg(preset: str = "small"):
    from qspec_tpu.config import ModelConfig
    # head_dim 128 keeps the Pallas attention fast path; the hidden /
    # intermediate sizes must decompose into constructible Hadamard factors
    # for the QuaRot conversion
    if preset == "big":
        # ~360M params (~180 MB int4): a DECODE-BANDWIDTH-BOUND model, so
        # speculation wins on physics (a verify pass streams the weights
        # once for k+1 tokens) rather than on dispatch amortization; sized
        # so f32 AdamW training fits the 16 GB HBM alongside remat'd
        # activations
        return ModelConfig(vocab_size=4096, hidden_size=1536,
                           intermediate_size=6144, num_layers=10,
                           num_heads=12, num_kv_heads=4, head_dim=128,
                           rope_theta=10000.0, max_position_embeddings=1024,
                           quant="none", weightless_norm=False)
    if preset == "draft":
        # ~18M params: a SEPARATE smaller draft model for the medium/medium4k
        # target (reference draft_model_config, vllm/config.py:1707 +
        # spec_decode/smaller_tp_proposer_worker.py). Same vocabulary as the
        # medium presets (rejection sampling requires it); trained on the
        # same induction distribution so its greedy continuations agree with
        # the target's. Served bf16 (no QuaRot needed): at target scale its
        # per-step weight traffic is ~1% of the target's — the weight-bound-
        # regime fix BENCH_NOTES.md's exp45 analysis calls for.
        return ModelConfig(vocab_size=4096, hidden_size=512,
                           intermediate_size=1536, num_layers=4,
                           num_heads=4, num_kv_heads=4, head_dim=128,
                           rope_theta=10000.0, max_position_embeddings=4608,
                           quant="none", weightless_norm=False)
    if preset == "medium4k":
        # the medium arch extended to a 4k position window (round-4 headline
        # regime): at B=32 and ctx 2-4k a decode step streams 1-2 GB of KV,
        # so the KV-traffic / (fixed+weights) ratio r reaches ~2-3 and the
        # shared-weights qspec ceiling (k+1)(1+r)/(k+1+r) clears 2x — the
        # round-3 2k window capped r at ~0.8 (ceiling 1.5x, BENCH_NOTES.md).
        # Same params as `medium`, so warm-start extension applies.
        return ModelConfig(vocab_size=4096, hidden_size=1024,
                           intermediate_size=3072, num_layers=8,
                           num_heads=8, num_kv_heads=4, head_dim=128,
                           rope_theta=10000.0, max_position_embeddings=4608,
                           quant="none", weightless_norm=False)
    if preset == "medium":
        # ~110M params: at serving batch 32+ and ~1k context the decode step
        # is dominated by KV + weight STREAMING (hundreds of MB/step), not
        # dispatch — the regime where a verify pass honestly amortizes the
        # whole step over k+1 tokens and the windowed qspec draft
        # (SpeculativeConfig.draft_kv_window) skips most of the KV traffic.
        # GQA 8q/4kv like production llamas; dims decompose into Hadamard
        # factors (1024 = H4 (x) H256, 3072 = H12 (x) H256); the f16
        # checkpoint stays committable (~220 MB).
        return ModelConfig(vocab_size=4096, hidden_size=1024,
                           intermediate_size=3072, num_layers=8,
                           num_heads=8, num_kv_heads=4, head_dim=128,
                           rope_theta=10000.0, max_position_embeddings=2048,
                           quant="none", weightless_norm=False)
    return ModelConfig(vocab_size=2048, hidden_size=512,
                       intermediate_size=1024, num_layers=3, num_heads=4,
                       num_kv_heads=4, head_dim=128, rope_theta=10000.0,
                       max_position_embeddings=1024, quant="none",
                       weightless_norm=False, lm_head_quant="bf16")


def make_batch(rng: np.random.Generator, batch: int, seq: int, vocab: int):
    """Sequences tiled from a random segment (period 16..64)."""
    out = np.empty((batch, seq), np.int32)
    for b in range(batch):
        period = int(rng.integers(16, 65))
        seg = rng.integers(2, vocab, size=period)
        out[b] = np.tile(seg, seq // period + 1)[:seq]
    return out


def train_forward(params, cfg, tokens, return_residual: bool = False,
                  input_embeds=None):
    """Dense-causal training forward sharing the engine's float weight
    layout and rope (models/llama.py) — weights trained here ARE engine
    weights; tests assert logits parity with the inference path.

    ``return_residual``: return the final PRE-norm residual stream [B, T, H]
    instead of logits (feature source for Medusa-head training,
    benchmarks/train_medusa.py).

    ``input_embeds`` [B, T, H]: use these rows instead of the embed-table
    lookup (multimodal training, benchmarks/train_vlm.py — image rows come
    from the differentiable vision tower)."""
    import jax
    import jax.numpy as jnp

    from qspec_tpu.ops.rotary import apply_rope

    B, T = tokens.shape
    H = cfg.hidden_size
    nh, dh = cfg.num_heads, cfg.head_dim
    eps = cfg.rms_norm_eps

    def rms(x, gamma):
        x32 = x.astype(jnp.float32)
        n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
        return (n * gamma).astype(x.dtype)

    x = (params["embed"][tokens] if input_embeds is None
         else input_embeds)              # [B, T, H]
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1)).reshape(-1)
    causal = jnp.tril(jnp.ones((T, T), bool))

    L = params["layers"]["qkv"]["w"].shape[0]

    def layer_fn(x, lp):
        h = rms(x, lp["input_norm"])
        qkv = h @ lp["qkv"]["w"]
        if "b" in lp["qkv"]:
            qkv = qkv + lp["qkv"]["b"]
        q, k, v = jnp.split(qkv, [cfg.q_size, cfg.q_size + cfg.kv_size], -1)
        q = q.reshape(B * T, nh, dh)
        k = k.reshape(B * T, cfg.num_kv_heads, dh)
        q, k = apply_rope(q, k, pos, params["rope_cache"])
        # GQA: repeat kv heads up to the query head count for the dense
        # training einsum (inference reads the grouped heads natively)
        rep = nh // cfg.num_kv_heads
        k = jnp.repeat(k, rep, axis=1)
        q = q.reshape(B, T, nh, dh).astype(jnp.float32)
        k = k.reshape(B, T, nh, dh).astype(jnp.float32)
        v = jnp.repeat(v.reshape(B * T, cfg.num_kv_heads, dh), rep, axis=1)
        v = v.reshape(B, T, nh, dh).astype(jnp.float32)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (dh ** -0.5)
        s = jnp.where(causal[None, None], s, -1e30)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).astype(x.dtype)
        x = x + o.reshape(B, T, cfg.q_size) @ lp["o"]["w"]
        h = rms(x, lp["post_norm"])
        gu = h @ lp["gate_up"]["w"]
        g, u = jnp.split(gu, 2, -1)
        return x + (jax.nn.silu(g) * u) @ lp["down"]["w"]

    # remat each layer: recompute activations in backward instead of
    # retaining them (the big preset trains inside 16 GB HBM this way)
    ckpt = jax.checkpoint(layer_fn)
    for li in range(L):
        lp = jax.tree.map(lambda a, i=li: a[i], params["layers"])
        x = ckpt(x, lp)
    if return_residual:
        return x
    x = rms(x, params["final_norm"])
    return x @ params["lm_head"]         # [B, T, V]


def to_hf_state_dict(params, cfg) -> dict:
    """Engine float pytree -> HF-named numpy state dict (the input format of
    model_loader.quantize_float)."""
    import jax

    f32 = lambda a: np.asarray(jax.device_get(a), np.float32)
    sd = {"model.embed_tokens.weight": f32(params["embed"]),
          "model.norm.weight": f32(params["final_norm"]),
          "lm_head.weight": f32(params["lm_head"]).T}
    L = params["layers"]["qkv"]["w"].shape[0]
    qs, ks = cfg.q_size, cfg.kv_size
    for i in range(L):
        p = f"model.layers.{i}."
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        qkv = f32(lp["qkv"]["w"])
        sd[p + "self_attn.q_proj.weight"] = qkv[:, :qs].T
        sd[p + "self_attn.k_proj.weight"] = qkv[:, qs:qs + ks].T
        sd[p + "self_attn.v_proj.weight"] = qkv[:, qs + ks:].T
        sd[p + "self_attn.o_proj.weight"] = f32(lp["o"]["w"]).T
        gu = f32(lp["gate_up"]["w"])
        I = gu.shape[1] // 2
        sd[p + "mlp.gate_proj.weight"] = gu[:, :I].T
        sd[p + "mlp.up_proj.weight"] = gu[:, I:].T
        sd[p + "mlp.down_proj.weight"] = f32(lp["down"]["w"]).T
        sd[p + "input_layernorm.weight"] = f32(lp["input_norm"])
        sd[p + "post_attention_layernorm.weight"] = f32(lp["post_norm"])
    return sd


def train(steps: int = 1200, batch: int = 32, seq: int = 256, lr: float = 3e-4,
          seed: int = 0, log_every: int = 100, preset: str = "small",
          save_every: int = 0, save_fn=None, init_from: str = None):
    """``init_from``: warm-start from an existing checkpoint basename —
    the position-window EXTENSION path (e.g. a seq-768-trained model
    fine-tuned at seq 2048). Induction-circuit formation from scratch is
    lr/seq-sensitive (a from-scratch seq-2048 run plateaued at copy-acc
    0.017 where seq-768 reached 0.997); extending an existing circuit to
    new rope positions converges in a few hundred steps instead."""
    import jax
    import jax.numpy as jnp
    import optax

    from qspec_tpu.models.llama import init_params

    cfg = model_cfg(preset)
    if init_from:
        import json as _json
        with open(init_from + ".json") as f:
            meta = _json.load(f)
        from qspec_tpu.config import ModelConfig
        from qspec_tpu.model_loader.loader import load_hf_float
        icfg = ModelConfig(**meta["cfg"])
        assert icfg.hidden_size == cfg.hidden_size \
            and icfg.num_layers == cfg.num_layers, "preset mismatch"
        params, _ = load_hf_float(dict(np.load(init_from + ".npz")), cfg)
        params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    else:
        params = jax.tree.map(lambda a: a.astype(jnp.float32),
                              init_params(cfg, seed=seed, dtype=jnp.float32))
    rope = params.pop("rope_cache")  # not trained

    warmup = min(50, max(1, steps // 4))
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup,
                                               max(steps, warmup + 1))
    tx = optax.adamw(sched, weight_decay=0.01)
    opt_state = tx.init(params)

    def loss_fn(p, tokens):
        logits = train_forward({**p, "rope_cache": rope}, cfg, tokens)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        # grade only positions past the first period (64): earlier ones mix
        # unpredictable first-occurrence tokens into the signal
        mask = jnp.broadcast_to(
            jnp.arange(nll.shape[1])[None] >= min(64, nll.shape[1] // 2),
            nll.shape)
        acc = (logits[:, :-1].argmax(-1) == tgt) & mask
        return (nll * mask).sum() / mask.sum(), acc.sum() / mask.sum()

    @jax.jit
    def step(p, s, tokens):
        (l, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(p, tokens)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, l, acc

    rng = np.random.default_rng(seed + 1)
    t0 = time.time()
    for i in range(steps):
        tokens = jnp.asarray(make_batch(rng, batch, seq, cfg.vocab_size))
        params, opt_state, l, acc = step(params, opt_state, tokens)
        if i % log_every == 0 or i == steps - 1:
            l, acc = jax.device_get((l, acc))
            print(f"step {i}: loss {float(l):.4f} copy-acc {float(acc):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if save_every and save_fn is not None and i and i % save_every == 0:
            # periodic snapshot: long runs can be harvested as soon as the
            # copy circuit saturates instead of waiting for the final step
            save_fn({**params, "rope_cache": rope}, cfg, float(acc))
            print(f"step {i}: snapshot saved", flush=True)
    return {**params, "rope_cache": rope}, cfg, float(acc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=256,
                    help="training sequence length — the copy circuit only "
                         "generalizes to positions it has seen, so bench "
                         "prompt+output must fit inside this window")
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--preset", default="small",
                    choices=["small", "draft", "medium", "medium4k", "big"])
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--save-every", type=int, default=0,
                    help="snapshot the checkpoint every N steps")
    ap.add_argument("--init", default=None,
                    help="checkpoint basename to warm-start from "
                         "(position-window extension)")
    args = ap.parse_args()

    def save(params, cfg, acc):
        sd = to_hf_state_dict(params, cfg)
        os.makedirs(os.path.dirname(os.path.abspath(args.out + ".npz")),
                    exist_ok=True)
        np.savez(args.out + ".npz", **{k: v.astype(np.float16)
                                       for k, v in sd.items()})
        with open(args.out + ".json", "w") as f:
            json.dump({"copy_acc": acc, "train_seq": args.seq,
                       "cfg": {k: v for k, v in cfg.__dict__.items()
                               if not k.startswith("_")}}, f, indent=1)

    params, cfg, acc = train(steps=args.steps, batch=args.batch, lr=args.lr,
                             seq=args.seq, preset=args.preset,
                             save_every=args.save_every, save_fn=save,
                             init_from=args.init)
    save(params, cfg, acc)
    print(f"saved {args.out}.npz (final copy-acc {acc:.3f})")


if __name__ == "__main__":
    main()
