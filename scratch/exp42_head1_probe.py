"""Why is medusa head 1 (offset t+3) stuck at ~0.17 while t+2 and t+4..t+8
heads reach 0.8+? Linear-probe medusa_base_v2's hidden for each offset.
If t+3 probes at chance while its neighbours probe high, the backbone
genuinely never stashed t+3 (training dynamics); if it probes high, the
head training for j=1 has a bug."""
import sys, os
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np
import jax, jax.numpy as jnp
import optax
from train_medusa import load_base
from train_induction import make_batch, train_forward
from qspec_tpu.ops.hadamard import random_hadamard_matrix

params, cfg, meta, name = load_base("checkpoints/medusa_base_v2")
print("base:", name)
H, V = cfg.hidden_size, cfg.vocab_size
Q = jnp.asarray(random_hadamard_matrix(H, seed=0), jnp.float32)

rng = np.random.default_rng(123)

@jax.jit
def feats(tokens):
    x = train_forward(params, cfg, tokens, return_residual=True)
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32*x32, -1, keepdims=True) + cfg.rms_norm_eps)
    return n @ Q

# linear probe per offset: W [H, V] trained by a few hundred adam steps
for off in (2, 3, 4):
    W = jnp.zeros((H, V), jnp.float32)
    tx = optax.adam(1e-2)
    st = tx.init(W)

    @jax.jit
    def step(W, st, z, tgt):
        def loss(W):
            lg = z @ W
            lp = jax.nn.log_softmax(lg)
            return -jnp.take_along_axis(lp, tgt[..., None], -1).mean()
        g = jax.grad(loss)(W)
        up, st2 = tx.update(g, st)
        return optax.apply_updates(W, up), st2

    for i in range(300):
        toks = jnp.asarray(make_batch(rng, 8, 256, V))
        z = feats(toks)
        Tn = 256 - off
        zt = z[:, 72:Tn].reshape(-1, H)
        tg = toks[:, 72 + off:].reshape(-1)
        W, st = step(W, st, zt, tg)
    # eval
    toks = jnp.asarray(make_batch(np.random.default_rng(7), 8, 256, V))
    z = feats(toks)
    Tn = 256 - off
    zt = z[:, 72:Tn].reshape(-1, H)
    tg = toks[:, 72 + off:].reshape(-1)
    acc = float(((zt @ W).argmax(-1) == tg).mean())
    print(f"offset +{off}: linear-probe top1 {acc:.3f}", flush=True)
