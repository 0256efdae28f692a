"""Diagnose medusa head training failure: does z = rms_nogamma(x) @ Q with
head = lm_rot reproduce the base model's x_{t+1} accuracy? And can a linear
probe on z predict x_{t+2} at all?"""
import sys, os
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np
import jax, jax.numpy as jnp
from train_medusa import load_base
from train_induction import make_batch, train_forward
from qspec_tpu.ops.hadamard import random_hadamard_matrix

params, cfg, meta, name = load_base()
H, V = cfg.hidden_size, cfg.vocab_size
Q = jnp.asarray(random_hadamard_matrix(H, seed=0), jnp.float32)
gfin = params["final_norm"].astype(jnp.float32)
lm_rot = Q.T @ (gfin[:, None] * params["lm_head"].astype(jnp.float32))

rng = np.random.default_rng(123)
tokens = jnp.asarray(make_batch(rng, 16, 256, V))

@jax.jit
def feats(tokens):
    x = train_forward(params, cfg, tokens, return_residual=True)
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32*x32, -1, keepdims=True) + cfg.rms_norm_eps)
    return n @ Q

z = feats(tokens)
logits1 = z @ lm_rot
acc1 = ((logits1[:, :-1].argmax(-1) == tokens[:, 1:]) &
        (jnp.arange(255)[None] >= 72)).sum() / ((255-72)*16)
print("x_{t+1} acc via z@lm_rot:", float(acc1))

# linear probe for x_{t+2}: ridge-regression-free quick check — train a
# one-layer softmax probe with a few hundred adam steps
import optax
W = jnp.zeros((H, V), jnp.float32)
tx = optax.adam(1e-2)
st = tx.init(W)

def loss_fn(W, z, tokens, off):
    lg = z[:, :256-off] @ W
    tgt = tokens[:, off:]
    lp = jax.nn.log_softmax(lg)
    nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
    mask = jnp.arange(nll.shape[1])[None] >= 72
    acc = ((lg.argmax(-1) == tgt) & mask).sum() / mask.sum() / z.shape[0] * z.shape[0]
    return (nll*mask).sum()/mask.sum(), ((lg.argmax(-1) == tgt) & mask).sum()/mask.sum()

@jax.jit
def step(W, st, z, tokens):
    (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(W, z, tokens, 2)
    up, st = tx.update(g, st, W)
    return optax.apply_updates(W, up), st, l, a

for i in range(400):
    tk = jnp.asarray(make_batch(rng, 16, 256, V))
    zz = feats(tk)
    W, st, l, a = step(W, st, zz, tk)
    if i % 100 == 0 or i == 399:
        print(f"probe step {i}: loss {float(l):.3f} acc(x_t+2) {float(a):.3f}")
