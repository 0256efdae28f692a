"""Train an MLPSpeculator net (in-image, on the TPU) for the induction LM.

The reference serves MLPSpeculator from downloaded checkpoints
(ibm-fms/ibm-granite hubs, vllm/model_executor/models/mlp_speculator.py);
this image has zero egress, so — like the Medusa heads
(train_medusa.py) — the net is trained here with a real loss on the real
task. Head j learns to predict the token at offset j+2 from position t,
given the running inner state (seeded by t's hidden) and the TRUE previous
token x_{t+j+1} (teacher forcing — at serving time that slot holds the
previously proposed/emitted token, spec_decode/mlp_speculator.py).

Training is JOINT like train_medusa.py (the frozen induction backbone's
hidden carries no x_{t+2} information — scratch/exp37_medusa_diag.py), so
the combined loss fine-tunes the backbone while its own LM loss preserves
next-token quality. Outputs BOTH a tuned base (mlpspec_base_v*) and the
matching net (induction_mlpspec_v*).

Basis note: as in train_medusa.py, the net trains directly on the
QuaRot-rotated serving-basis hidden z_t = rmsnorm_nogamma(x_t) @ Q, so it
drops into ``params["mlp_spec"]`` with no load-time fix-up.

Run: python benchmarks/train_mlp_speculator.py [--heads 5] [--steps 3000]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_induction import make_batch, train_forward  # noqa: E402
from train_medusa import load_base  # noqa: E402

DEFAULT_OUT = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                           "induction_mlpspec_v1")


def train(heads_k: int = 5, steps: int = 3000, batch: int = 16,
          seq: int = 768, lr: float = 2e-3, base_lr: float = 5e-5,
          seed: int = 0, quant_seed: int = 0, log_every: int = 200,
          base: str = None, head_weight: float = 0.4):
    import jax
    import jax.numpy as jnp
    import optax

    from qspec_tpu.ops.hadamard import random_hadamard_matrix

    params, cfg, meta, base_name = load_base(base)
    H, V = cfg.hidden_size, cfg.vocab_size
    D = H  # inner dim = hidden dim (reference inner_dim=0 default)
    train_seq = int(meta.get("train_seq", 768))
    rope = params.pop("rope_cache")
    Q = jnp.asarray(random_hadamard_matrix(H, seed=quant_seed), jnp.float32)

    def lm_rot_of(p):
        gfin = p["final_norm"].astype(jnp.float32)
        return Q.T @ (gfin[:, None] * p["lm_head"].astype(jnp.float32))

    rng0 = np.random.default_rng(seed + 99)

    def g(*shape, scale=0.02):
        return jnp.asarray(rng0.standard_normal(shape).astype(np.float32)
                           * scale)

    # head init: vocab projections cloned from the engine-basis lm_head
    # (reference ties them to the base head at init); projections
    # near-identity so state_0 ~ the serving hidden
    eye = jnp.eye(H, D, dtype=jnp.float32)
    net = {
        "emb": g(heads_k, V, D),
        "proj_first": eye + g(H, D),
        "proj_rest": jnp.broadcast_to(eye[None], (max(heads_k - 1, 0), D, D)
                                      ).copy() + g(max(heads_k - 1, 0), D, D),
        "ln_w": jnp.ones((heads_k, D), jnp.float32),
        "ln_b": jnp.zeros((heads_k, D), jnp.float32),
        "head": jnp.broadcast_to(lm_rot_of(params)[None],
                                 (heads_k, D, V)).copy(),
    }

    sw = 0.5 ** (0.5 / heads_k)
    ew = math.sqrt((1.0 - sw ** 2) * (D / 2.0))
    alpha = ew / sw

    warmup = min(100, max(1, steps // 10))
    tx = optax.multi_transform(
        {"net": optax.adamw(optax.warmup_cosine_decay_schedule(
             0.0, lr, warmup, max(steps, warmup + 1)), weight_decay=0.0),
         "base": optax.adamw(optax.warmup_cosine_decay_schedule(
             0.0, base_lr, warmup, max(steps, warmup + 1)),
             weight_decay=0.01)},
        {"net": jax.tree.map(lambda _: "net", net),
         "base": jax.tree.map(lambda _: "base", params)})
    state = {"net": net, "base": params}
    opt_state = tx.init(state)

    grade_from = 72  # past the longest first period (64) + margin

    def l2norm(x):
        return x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + 1e-6)

    def loss_fn(st, tokens):
        p = {**st["base"], "rope_cache": rope}
        nt = st["net"]
        B, T = tokens.shape
        x = train_forward(p, cfg, tokens, return_residual=True)
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(
            jnp.mean(x32 * x32, -1, keepdims=True) + cfg.rms_norm_eps)
        pos_mask = jnp.broadcast_to(jnp.arange(T - 1)[None] >= grade_from,
                                    (B, T - 1))
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

        # teacher-forced recurrence: state carries across heads, prev token
        # is the TRUE x_{t+j+1}
        st_j = jax.lax.dynamic_slice_in_dim(z, 0, Tn, 1)
        total, accs = jnp.float32(0), []
        for j in range(heads_k):
            prev = jax.lax.dynamic_slice_in_dim(tokens, j + 1, Tn, 1)
            zj = nt["emb"][j][prev]                   # [B, Tn, D]
            w = nt["proj_first"] if j == 0 else nt["proj_rest"][j - 1]
            s = st_j @ w + zj * alpha
            s = l2norm(s) * nt["ln_w"][j] + nt["ln_b"][j]
            st_j = jax.nn.gelu(s, approximate=False)
            lg = st_j @ nt["head"][j]                 # [B, Tn, V]
            tgtj = jax.lax.dynamic_slice_in_dim(tokens, j + 2, Tn, 1)
            lpj = jax.nn.log_softmax(lg)
            nllj = -jnp.take_along_axis(lpj, tgtj[..., None], -1)[..., 0]
            total = total + (nllj * hmask).sum() / hmask.sum()
            accs.append(((lg.argmax(-1) == tgtj) & hmask).sum() / hmask.sum())
        return base_loss + head_weight * total, (base_acc, jnp.stack(accs))

    @jax.jit
    def step(st, s, tokens):
        (l, (bacc, accs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st, tokens)
        updates, s = tx.update(grads, s, st)
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
    return (state["net"], [float(x) for x in jax.device_get(accs)],
            float(jax.device_get(bacc)), base_out, base_name, cfg,
            min(seq, train_seq))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heads", type=int, default=5)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=768)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--base-lr", type=float, default=5e-5)
    ap.add_argument("--head-weight", type=float, default=0.4)
    ap.add_argument("--base", default=None)
    ap.add_argument("--quant-seed", type=int, default=0)
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--base-out", default=None)
    args = ap.parse_args()

    net, accs, base_acc, base_params, base_name, cfg, train_seq = train(
        heads_k=args.heads, steps=args.steps, batch=args.batch, seq=args.seq,
        lr=args.lr, base_lr=args.base_lr, base=args.base,
        quant_seed=args.quant_seed, head_weight=args.head_weight)
    import jax

    from train_induction import to_hf_state_dict

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_out = args.base_out
    if base_out is None:
        existing = [int(m.group(1)) for f in glob.glob(os.path.join(
            here, "checkpoints", "mlpspec_base_v*.npz"))
            if (m := re.search(r"_v(\d+)\.npz$", f))]
        n = max(existing, default=0) + 1
        base_out = os.path.join(here, "checkpoints", f"mlpspec_base_v{n}")
    sd = to_hf_state_dict(base_params, cfg)
    np.savez(base_out + ".npz", **{k: v.astype(np.float16)
                                   for k, v in sd.items()})
    with open(base_out + ".json", "w") as f:
        json.dump({"copy_acc": base_acc, "train_seq": args.seq,
                   "mlpspec_joint": True,
                   "cfg": {k: v for k, v in cfg.__dict__.items()
                           if not k.startswith("_")}}, f, indent=1)

    nd = {k: np.asarray(jax.device_get(v), np.float16)
          for k, v in net.items()}
    os.makedirs(os.path.dirname(os.path.abspath(args.out + ".npz")),
                exist_ok=True)
    np.savez(args.out + ".npz", **nd)
    with open(args.out + ".json", "w") as f:
        json.dump({"base": os.path.basename(base_out), "heads": args.heads,
                   "head_top1_acc": accs, "base_copy_acc": base_acc,
                   "quant_seed": args.quant_seed}, f, indent=1)
    print(f"saved {base_out}.npz (base copy-acc {base_acc:.3f}) and "
          f"{args.out}.npz (head accs {accs})")


if __name__ == "__main__":
    main()
