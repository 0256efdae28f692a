"""Train the EAGLE draft net (in-image, on the TPU) for the induction LM.

The base stays FROZEN (unlike the Medusa joint fine-tune, so the serving
base keeps its quantization robustness): the one-layer draft transformer
has its own attention over the fused (embed, hidden) features and can learn
the induction copy circuit itself. Loss follows the EAGLE recipe: feature
regression on the next true hidden + cross-entropy through the frozen
lm_head (arXiv 2401.15077 §3.2), both in the rotated serving basis.

Run: python benchmarks/train_eagle.py [--steps 6000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_induction import make_batch, train_forward  # noqa: E402
from train_medusa import load_base  # noqa: E402

DEFAULT_OUT = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                           "induction_eagle_v1")


def eagle_dense_forward(eagle, cfg, feats, rope):
    """Dense-causal forward of the draft layer (training twin of the
    serving decoder_layer path, same structure as train_forward's layer)."""
    import jax
    import jax.numpy as jnp

    from qspec_tpu.ops.rotary import apply_rope

    B, T, H = feats.shape
    nh, dh = cfg.num_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    lp = jax.tree.map(lambda a: a[0], eagle["layers"])

    def rms(x, gamma):
        x32 = x.astype(jnp.float32)
        n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
        return n * gamma if gamma is not None else n

    x = feats
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1)).reshape(-1)
    causal = jnp.tril(jnp.ones((T, T), bool))
    h = rms(x, lp["input_norm"])
    qkv = h @ lp["qkv"]["w"]
    q, k, v = jnp.split(qkv, [cfg.q_size, cfg.q_size + cfg.kv_size], -1)
    q = q.reshape(B * T, nh, dh)
    k = k.reshape(B * T, cfg.num_kv_heads, dh)
    q, k = apply_rope(q, k, pos, rope)
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
    x = x + (jax.nn.silu(g) * u) @ lp["down"]["w"]
    return rms(x, None)       # the serving path rms-norms the layer output


def train(steps: int = 6000, batch: int = 16, seq: int = 512, lr: float = 1e-3,
          seed: int = 0, quant_seed: int = 0, log_every: int = 200,
          base: str = None, ce_weight: float = 0.1):
    import jax
    import jax.numpy as jnp
    import optax

    from qspec_tpu.ops.hadamard import random_hadamard_matrix
    from qspec_tpu.spec_decode.eagle import eagle_cfg_for, init_eagle_params

    params, cfg, meta, base_name = load_base(base)
    H, V = cfg.hidden_size, cfg.vocab_size
    Q = jnp.asarray(random_hadamard_matrix(H, seed=quant_seed), jnp.float32)
    gfin = params["final_norm"].astype(jnp.float32)
    lm_rot = Q.T @ (gfin[:, None] * params["lm_head"].astype(jnp.float32))
    embed_rot = params["embed"].astype(jnp.float32) @ Q
    rope = params["rope_cache"]

    ecfg = eagle_cfg_for(cfg)
    eagle = init_eagle_params(cfg, seed=seed, dtype=jnp.float32)
    erope = eagle.pop("rope_cache")
    tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, lr, min(200, steps // 10 + 1), max(steps, 202)),
        weight_decay=0.01)
    opt_state = tx.init(eagle)

    grade_from = 72

    def features_and_targets(tokens):
        """True serving-basis hiddens + fused features (teacher-forced)."""
        x = train_forward(params, cfg, tokens, return_residual=True)
        x32 = x.astype(jnp.float32)
        h = (x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True)
                                 + cfg.rms_norm_eps)) @ Q    # [B, T, H]
        return jax.lax.stop_gradient(h)

    def loss_fn(eagle, h, tokens):
        B, T = tokens.shape
        # f_t = fc([embed(x_{t+1}), h_t]) for t in 0..T-2
        e_next = embed_rot[tokens[:, 1:]]                    # [B, T-1, H]
        f = jnp.concatenate([e_next, h[:, :-1]], axis=-1) @ eagle["fc"]
        a = eagle_dense_forward(eagle, ecfg, f, erope)       # [B, T-1, H]
        # targets: a_t ~ h_{t+1} (regression) and lm_head(a_t) ~ x_{t+2}
        mask = jnp.broadcast_to(
            jnp.arange(T - 2)[None] >= grade_from, (B, T - 2))
        reg = jnp.abs(a[:, :-1] - h[:, 1:-1]).mean(-1)
        reg = (reg * mask).sum() / mask.sum()
        logits = a[:, :-1] @ lm_rot                          # [B, T-2, V]
        tgt = tokens[:, 2:]
        lp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        ce = (nll * mask).sum() / mask.sum()
        acc = ((logits.argmax(-1) == tgt) & mask).sum() / mask.sum()
        return reg + ce_weight * ce, (acc, reg, ce)

    @jax.jit
    def step(eagle, s, tokens):
        h = features_and_targets(tokens)
        (l, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            eagle, h, tokens)
        updates, s = tx.update(grads, s, eagle)
        return optax.apply_updates(eagle, updates), s, l, aux

    rng = np.random.default_rng(seed + 31)
    t0 = time.time()
    acc = None
    for i in range(steps):
        tokens = jnp.asarray(make_batch(rng, batch, seq, V))
        eagle, opt_state, l, (acc, reg, ce) = step(eagle, opt_state, tokens)
        if i % log_every == 0 or i == steps - 1:
            l, a, r, c = jax.device_get((l, acc, reg, ce))
            print(f"step {i}: loss {float(l):.4f} d1-acc {float(a):.3f} "
                  f"reg {float(r):.4f} ce {float(c):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return eagle, float(jax.device_get(acc)), base_name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--ce-weight", type=float, default=0.1)
    ap.add_argument("--base", default=None,
                    help="induction checkpoint basename (default: newest)")
    ap.add_argument("--quant-seed", type=int, default=0)
    ap.add_argument("--out", default=DEFAULT_OUT)
    args = ap.parse_args()

    eagle, acc, base_name = train(
        steps=args.steps, batch=args.batch, seq=args.seq, lr=args.lr,
        base=args.base, quant_seed=args.quant_seed, ce_weight=args.ce_weight)
    from qspec_tpu.spec_decode.eagle import save_eagle
    os.makedirs(os.path.dirname(os.path.abspath(args.out + ".npz")),
                exist_ok=True)
    save_eagle(args.out + ".npz", eagle)
    with open(args.out + ".json", "w") as f:
        json.dump({"base": base_name, "d1_top1_acc": acc,
                   "quant_seed": args.quant_seed}, f, indent=1)
    print(f"saved {args.out}.npz (teacher-forced d1 acc {acc:.3f})")


if __name__ == "__main__":
    main()
