"""Train Medusa heads (in-image, on the TPU) for the induction LM.

The reference serves Medusa from downloaded head checkpoints
(vllm/model_executor/models/medusa.py); this image has zero egress, so —
like the base induction LM (train_induction.py) — the heads are trained
here with a real loss on the real task. Head j learns to predict the token
at offset j+2 from position t's hidden state (the lm_head owns offset +1),
exactly the quantity medusa_rounds_step asks of it at serving time
(engine/model_runner.py).

Training is JOINT (Medusa-2 style, warm-started from the existing base):
a frozen induction backbone's hidden provably carries no x_{t+2}
information (scratch/exp37_medusa_diag.py: linear probe at chance), so the
combined loss fine-tunes the backbone to expose future tokens while its own
LM loss preserves next-token quality. Outputs BOTH a new base checkpoint
(induction_lm_v<next>) and the matching heads (induction_medusa_v*).

Basis note: the serving engine runs the QuaRot-rotated int4 checkpoint, so
the hidden state the heads see at inference is

    z_t = rmsnorm_nogamma(x_t) @ Q,   Q = random_hadamard(H, seed)

(model_loader.quantize_float folds the final-norm gamma into lm_head and
rotates the residual stream by Q; rmsnorm commutes with the orthonormal
rotation). The heads are trained directly on z_t, so they drop into
``params["medusa"]`` with no load-time fix-up.

Run: python benchmarks/train_medusa.py [--heads 7] [--steps 3000]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_induction import make_batch, train_forward  # noqa: E402

DEFAULT_OUT = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                           "induction_medusa_v1")


def load_base(base: str = None):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if base is None:
        cands = sorted(glob.glob(os.path.join(here, "checkpoints",
                                              "induction_lm_v*.npz")))
        if not cands:
            raise SystemExit("no induction checkpoint; run "
                             "benchmarks/train_induction.py first")
        base = cands[-1][:-4]
    from qspec_tpu.config import ModelConfig
    from qspec_tpu.model_loader.loader import load_hf_float

    with open(base + ".json") as f:
        meta = json.load(f)
    cfg = ModelConfig(**meta["cfg"])
    sd = dict(np.load(base + ".npz"))
    params, cfg = load_hf_float(sd, cfg)
    import jax.numpy as jnp
    params = __import__("jax").tree.map(
        lambda a: a.astype(jnp.float32), params)
    return params, cfg, meta, os.path.basename(base)


def make_fake_quant(cfg, Q, quant_seed: int = 0):
    """Serving-exact QAT transform: rotate each projection into the basis
    quantize_float will quantize it in (gamma-fold + Q / per-head Hadamard /
    H_I — loader.py:221-296), apply per-out-channel symmetric int4
    fake-quant (straight-through gradients), rotate back. The backbone then
    trains its future-token stashing against the EXACT weight noise the
    served int4 engine has — without this, heads reaching 0.88-0.99 top-1
    on float hiddens measure 0.46-0.77 on the quantized engine's hiddens
    (checkpoints/induction_medusa_v2.json) and acceptance lands ~0.32."""
    import jax
    import jax.numpy as jnp

    from qspec_tpu.ops.hadamard import decompose_dim, hadamard_matrix

    H, I = cfg.hidden_size, cfg.intermediate_size
    nh, dh = cfg.num_heads, cfg.head_dim
    Hh = jnp.asarray(hadamard_matrix(nh), jnp.float32) / math.sqrt(nh)
    K_f, P_f = decompose_dim(I)
    HI = jnp.asarray(np.kron(hadamard_matrix(K_f), hadamard_matrix(P_f)),
                     jnp.float32) / math.sqrt(I)

    def fq(w, bits):
        lim = 2 ** (bits - 1)
        s = jnp.maximum(jnp.abs(w).max(0, keepdims=True), 1e-8) / (lim - 1)
        q = jnp.clip(jnp.round(w / s), -lim, lim - 1) * s
        return w + jax.lax.stop_gradient(q - w)

    def safe(g):
        # gamma-fold/unfold needs nonzero gammas; keep sign, clamp magnitude
        return jnp.where(jnp.abs(g) < 1e-4, jnp.where(g < 0, -1e-4, 1e-4), g)

    def qat_layer(lp):
        gin = safe(lp["input_norm"].astype(jnp.float32))[:, None]
        gpost = safe(lp["post_norm"].astype(jnp.float32))[:, None]
        out = dict(lp)

        w = lp["qkv"]["w"].astype(jnp.float32)
        out["qkv"] = {**lp["qkv"],
                      "w": (Q @ fq(Q.T @ (gin * w), 4)) / gin}

        w = lp["o"]["w"].astype(jnp.float32).reshape(nh, dh, H)
        rot = jnp.einsum("jh,hdk->jdk", Hh, w).reshape(nh * dh, H) @ Q
        v = (fq(rot, 4) @ Q.T).reshape(nh, dh, H)
        out["o"] = {**lp["o"],
                    "w": jnp.einsum("jh,jdk->hdk", Hh, v).reshape(nh * dh, H)}

        w = lp["gate_up"]["w"].astype(jnp.float32)
        out["gate_up"] = {**lp["gate_up"],
                          "w": (Q @ fq(Q.T @ (gpost * w), 4)) / gpost}

        w = lp["down"]["w"].astype(jnp.float32)
        out["down"] = {**lp["down"],
                       "w": HI.T @ (fq((HI @ w) @ Q, 4) @ Q.T)}
        return out

    def qat(params):
        p = dict(params)
        p["layers"] = jax.vmap(qat_layer)(params["layers"])
        gfin = safe(params["final_norm"].astype(jnp.float32))[:, None]
        lm = params["lm_head"].astype(jnp.float32)
        # served lm_head is int8 per-channel (ModelConfig lm_head_quant auto)
        p["lm_head"] = (Q @ fq(Q.T @ (gfin * lm), 8)) / gfin
        return p

    return qat


def train(heads_k: int = 7, steps: int = 3000, batch: int = 32,
          seq: int = 256, lr: float = 1e-3, base_lr: float = 1e-4,
          seed: int = 0, quant_seed: int = 0, log_every: int = 200,
          base: str = None, head_weight: float = 0.2,
          init_heads: str = None, boost_head: int = -1,
          boost: float = 4.0, fake_quant: bool = False):
    """Joint (Medusa-2-style) training: the heads AND the base are trained
    together, warm-started from the existing induction checkpoint.

    Why joint: a frozen 3-layer induction model's hidden state carries only
    the RETRIEVED NEXT token (its induction circuit attends exactly one
    position ahead of the match) — a linear probe on z recovers x_{t+1} at
    99.7% but x_{t+2} at chance (scratch/exp37_medusa_diag.py). Heads alone
    therefore cannot beat uniform; the joint objective (Medusa paper §3.2's
    combined loss) teaches the backbone to stash x_{t+2..} into the hidden
    while the base LM loss preserves its own next-token quality.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from qspec_tpu.ops.hadamard import random_hadamard_matrix

    params, cfg, meta, base_name = load_base(base)
    H, V = cfg.hidden_size, cfg.vocab_size
    train_seq = int(meta.get("train_seq", 768))
    rope = params.pop("rope_cache")  # not trained
    # the rotation quantize_float will apply at serving time (same seed)
    Q = jnp.asarray(random_hadamard_matrix(H, seed=quant_seed), jnp.float32)

    def lm_rot_of(p):
        gfin = p["final_norm"].astype(jnp.float32)
        return Q.T @ (gfin[:, None] * p["lm_head"].astype(jnp.float32))

    # head init: near-identity resblock with PER-HEAD random noise on w1 —
    # identical zero inits left one head stuck in a symmetric saddle
    # (observed: head 1 plateaued at 0.13 while its neighbours reached
    # 0.8+); head = engine-basis lm_head (the reference's clone init).
    # The noise must be SMALL relative to the identity path: at scale s the
    # perturbation silu(z @ w1) has magnitude ~ s*sqrt(H)*|z| — a flat 0.02
    # at H=512 injects ~0.45|z| and destroys the identity init entirely
    # (measured: ALL heads stuck <0.35 where zero-init reached 0.8+).
    # s = 0.02/sqrt(H) keeps the perturbation ~2% of z: symmetry broken,
    # identity preserved.
    rng0 = np.random.default_rng(seed + 99)
    w1_init = (rng0.standard_normal((heads_k, H, H)).astype(np.float32)
               * (0.02 / math.sqrt(H)))
    heads = {
        "w1": jnp.asarray(w1_init),
        "b1": jnp.zeros((heads_k, H), jnp.float32),
        "head": jnp.broadcast_to(lm_rot_of(params)[None], (heads_k, H, V)).copy(),
    }
    if init_heads:
        # warm start from an existing heads checkpoint (escape a single
        # stuck head without re-deriving the rest): the noise init above is
        # ADDED to the loaded w1 so a saddle-symmetric head gets kicked
        with np.load(init_heads) as z:
            heads = {
                "w1": jnp.asarray(z["w1"], jnp.float32) + heads["w1"],
                "b1": jnp.asarray(z["b1"], jnp.float32),
                "head": jnp.asarray(z["head"], jnp.float32),
            }
        assert heads["w1"].shape[0] == heads_k, "heads count mismatch"

    warmup = min(100, max(1, steps // 10))
    tx = optax.multi_transform(
        {"heads": optax.adamw(optax.warmup_cosine_decay_schedule(
             0.0, lr, warmup, max(steps, warmup + 1)), weight_decay=0.0),
         "base": optax.adamw(optax.warmup_cosine_decay_schedule(
             0.0, base_lr, warmup, max(steps, warmup + 1)),
             weight_decay=0.01)},
        {"heads": jax.tree.map(lambda _: "heads", heads),
         "base": jax.tree.map(lambda _: "base", params)})
    state = {"heads": heads, "base": params}
    opt_state = tx.init(state)

    grade_from = 72  # past the longest first period (64) + margin
    qat = make_fake_quant(cfg, Q, quant_seed) if fake_quant else None

    def loss_fn(st, tokens):
        p = {**(qat(st["base"]) if qat else st["base"]), "rope_cache": rope}
        hd = st["heads"]
        B, T = tokens.shape
        x = train_forward(p, cfg, tokens, return_residual=True)
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(
            jnp.mean(x32 * x32, -1, keepdims=True) + cfg.rms_norm_eps)
        pos_mask = jnp.broadcast_to(jnp.arange(T - 1)[None] >= grade_from,
                                    (B, T - 1))

        # base LM loss (same grading as train_induction)
        base_logits = (normed * p["final_norm"].astype(jnp.float32)
                       ) @ p["lm_head"].astype(jnp.float32)
        lp = jax.nn.log_softmax(base_logits[:, :-1])
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        base_loss = (nll * pos_mask).sum() / pos_mask.sum()
        base_acc = ((base_logits[:, :-1].argmax(-1) == tgt)
                    & pos_mask).sum() / pos_mask.sum()

        z = normed @ Q                               # serving-basis hidden
        Tn = T - heads_k - 1                         # common graded width
        hmask = jnp.broadcast_to(jnp.arange(Tn)[None] >= grade_from, (B, Tn))

        def head_loss(j):
            # map over heads: avoids the [B, T, K, V] logits blow-up
            r = z + jax.nn.silu(z @ hd["w1"][j] + hd["b1"][j])
            lg = r @ hd["head"][j]                   # [B, T, V]
            off = j + 2
            lgj = jax.lax.dynamic_slice_in_dim(lg, 0, Tn, 1)
            tgtj = jax.lax.dynamic_slice_in_dim(tokens, off, Tn, 1)
            lpj = jax.nn.log_softmax(lgj)
            nllj = -jnp.take_along_axis(lpj, tgtj[..., None], -1)[..., 0]
            lj = (nllj * hmask).sum() / hmask.sum()
            aj = ((lgj.argmax(-1) == tgtj) & hmask).sum() / hmask.sum()
            return lj, aj

        hls, accs = jax.lax.map(head_loss, jnp.arange(heads_k))
        # per-head loss weights: a backbone that stashes every offset BUT
        # one (observed: +3 linear-probes at chance while +2/+4 probe high,
        # scratch/exp42_head1_probe.py) needs the missing head upweighted
        # or the joint loss keeps riding the offsets it already serves
        wts = jnp.ones((heads_k,), jnp.float32)
        if boost_head >= 0:
            wts = wts.at[boost_head].set(boost)
        return base_loss + head_weight * (wts * hls).sum(), (base_acc, accs)

    @jax.jit
    def step(st, s, tokens):
        (l, (bacc, accs)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(st, tokens)
        updates, s = tx.update(g, s, st)
        return optax.apply_updates(st, updates), s, l, bacc, accs

    rng = np.random.default_rng(seed + 17)
    t0 = time.time()
    accs, bacc = None, None
    for i in range(steps):
        tokens = jnp.asarray(make_batch(rng, batch, seq, V))
        state, opt_state, l, bacc, accs = step(state, opt_state, tokens)
        if i % log_every == 0 or i == steps - 1:
            l, b, a = jax.device_get((l, bacc, accs))
            print(f"step {i}: loss {float(l):.4f} base-acc {float(b):.3f} "
                  f"head-acc {[round(float(x), 3) for x in a]} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    base_out = {**state["base"], "rope_cache": rope}
    return (state["heads"], [float(x) for x in jax.device_get(accs)],
            float(jax.device_get(bacc)), base_out, base_name, cfg,
            min(seq, train_seq))


def self_distill(heads, base_params, cfg, rope, *, steps: int,
                 batch: int = 16, prompt_len: int = 384,
                 total_len: int = 736, lr: float = 1e-4,
                 quant_seed: int = 0, n_seqs: int = 768):
    """Phase 2 — Medusa self-distillation against the QUANTIZED engine's
    own greedy continuations (see benchmarks/_medusa_distill.py for the
    why and the corpus construction)."""
    from _medusa_distill import build_quant_corpus, distill_heads

    z, toks = build_quant_corpus(base_params, cfg, rope, n_seqs=n_seqs,
                                 prompt_len=prompt_len, total_len=total_len,
                                 quant_seed=quant_seed, seed=quant_seed)
    return distill_heads(heads, z, toks, prompt_len=prompt_len, steps=steps,
                         batch=batch, lr=lr, seed=quant_seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heads", type=int, default=7)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=768,
                    help="joint-training window; bench prompts must fit")
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--base-lr", type=float, default=5e-5)
    ap.add_argument("--head-weight", type=float, default=0.4)
    ap.add_argument("--base", default=None,
                    help="induction checkpoint basename (default: newest)")
    ap.add_argument("--init-heads", default=None,
                    help="warm-start heads from this .npz (escape a stuck "
                         "head without retraining the rest)")
    ap.add_argument("--boost-head", type=int, default=-1,
                    help="upweight this head's loss (stuck-offset rescue)")
    ap.add_argument("--boost", type=float, default=4.0)
    ap.add_argument("--quant-seed", type=int, default=0,
                    help="must match quantize_float's seed at serving time")
    ap.add_argument("--fake-quant", action="store_true",
                    help="QAT: run the joint phase through serving-exact "
                         "rotated-basis int4 fake-quant (see make_fake_quant)")
    ap.add_argument("--self-distill", type=int, default=0,
                    help="phase-2 steps: train heads on the base's OWN "
                         "greedy continuations (what serving accepts)")
    ap.add_argument("--distill-lr", type=float, default=1e-4)
    ap.add_argument("--distill-batch", type=int, default=16)
    ap.add_argument("--distill-only", action="store_true",
                    help="skip joint training: load --base + --init-heads "
                         "and run only the self-distill phase")
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--base-out", default=None,
                    help="where to save the jointly-tuned base (default: "
                         "checkpoints/induction_lm_v<next>)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qspec_tpu.ops.hadamard import random_hadamard_matrix

    if args.distill_only:
        assert args.init_heads, "--distill-only needs --init-heads"
        if not args.self_distill:
            args.self_distill = 1500
        params, cfg, meta, base_name = load_base(args.base)
        rope = params.pop("rope_cache")
        with np.load(args.init_heads) as z:
            heads = {k: jnp.asarray(z[k], jnp.float32)
                     for k in ("w1", "b1", "head")}
        base_params, base_acc = params, float(meta.get("copy_acc", 0.0))
        train_seq = int(meta.get("train_seq", 768))
    else:
        heads, accs, base_acc, base_out_p, base_name, cfg, train_seq = train(
            heads_k=args.heads, steps=args.steps, batch=args.batch,
            seq=args.seq, lr=args.lr, base_lr=args.base_lr, base=args.base,
            quant_seed=args.quant_seed, head_weight=args.head_weight,
            init_heads=args.init_heads, boost_head=args.boost_head,
            boost=args.boost, fake_quant=args.fake_quant)
        rope = base_out_p.pop("rope_cache")
        base_params = base_out_p

    if args.self_distill:
        heads, accs = self_distill(
            heads, base_params, cfg, rope, steps=args.self_distill,
            batch=args.distill_batch, lr=args.distill_lr,
            prompt_len=min(384, train_seq // 2),
            total_len=train_seq - 32, quant_seed=args.quant_seed)
    base_params = {**base_params, "rope_cache": rope}

    from train_induction import to_hf_state_dict

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.distill_only:
        # base unchanged — heads keep pointing at it
        base_out = os.path.join(here, "checkpoints", base_name)
    else:
        base_out = args.base_out
        if base_out is None:
            # the jointly-tuned base is the MEDUSA regime's base,
            # deliberately outside the induction_lm_v* namespace: bench.py
            # pairs it with the heads (load_medusa_regime) while the
            # ngram/qspec regimes keep the original base
            import re
            existing = [int(m.group(1)) for f in glob.glob(os.path.join(
                here, "checkpoints", "medusa_base_v*.npz"))
                if (m := re.search(r"_v(\d+)\.npz$", f))]
            n = max(existing, default=0) + 1
            base_out = os.path.join(here, "checkpoints", f"medusa_base_v{n}")
        sd = to_hf_state_dict(base_params, cfg)
        np.savez(base_out + ".npz", **{k: v.astype(np.float16)
                                       for k, v in sd.items()})
        with open(base_out + ".json", "w") as f:
            json.dump({"copy_acc": base_acc, "train_seq": args.seq,
                       "medusa_joint": True,
                       "cfg": {k: v for k, v in cfg.__dict__.items()
                               if not k.startswith("_")}}, f, indent=1)

    hd = {k: np.asarray(jax.device_get(v), np.float16)
          for k, v in heads.items()}
    os.makedirs(os.path.dirname(os.path.abspath(args.out + ".npz")),
                exist_ok=True)
    np.savez(args.out + ".npz", **hd)
    with open(args.out + ".json", "w") as f:
        json.dump({"base": os.path.basename(base_out),
                   "heads": int(hd["b1"].shape[0]),
                   "head_top1_acc": accs, "base_copy_acc": base_acc,
                   "self_distilled": bool(args.self_distill),
                   "quant_seed": args.quant_seed}, f, indent=1)
    print(f"saved heads -> {args.out}.npz (base {base_out}, "
          f"head accs {accs})")


if __name__ == "__main__":
    main()
