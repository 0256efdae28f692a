"""Probe: do the trained Medusa heads keep their top-1 accuracy when the
backbone runs QUANTIZED (the serving condition), vs the float joint-training
condition? Measures per-head accuracy on the induction copy distribution
through the real w4a16 forward (bench.py's exact loader)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from bench import load_medusa_regime, induction_prompts
from qspec_tpu.models.llama import AttentionBatch, model_forward
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.spec_decode.medusa import medusa_propose

cfg, params, train_seq = load_medusa_regime()
assert cfg is not None
K = int(params["medusa"]["b1"].shape[0])
T = 512
page = 128
n_pages_per_seq = (T + page - 1) // page

seqs = induction_prompts(4, T, cfg.vocab_size, seed=123)
hits = np.zeros(K)
tot = np.zeros(K)
chain = np.zeros(K + 1)  # chain[j] = P(first j proposals all correct)
nchain = 0
for si, toks in enumerate(seqs):
    toks = np.asarray(toks, np.int32)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim,
                               num_pages=n_pages_per_seq + 2, page_size=page)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + page)[None, :],
        block_tables=jnp.asarray([list(range(1, n_pages_per_seq + 1))],
                                 jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    logits, hidden, _ = model_forward(
        params, cfg, jnp.asarray(toks[None]), cache, batch,
        scheme="w4a16", return_hidden=True)
    hidden = np.asarray(hidden[0], np.float32)          # [T, H]
    base_pred = np.asarray(jnp.argmax(logits[0], -1))   # lm_head preds (t+1)

    # head j at position t predicts toks[t + 2 + j]
    ts = np.arange(64, T - (K + 2))
    props = np.asarray(medusa_propose(
        params["medusa"], jnp.asarray(hidden[ts])))     # [len(ts), K]
    base_acc = (base_pred[ts] == toks[ts + 1]).mean()
    for j in range(K):
        ok = props[:, j] == toks[ts + 2 + j]
        hits[j] += ok.sum(); tot[j] += len(ts)
    # chained acceptance (greedy): proposal j accepted iff all 0..j correct
    okm = props == toks[ts[:, None] + 2 + np.arange(K)[None]]
    prefix = np.cumprod(okm, axis=1)
    chain[1:] += prefix.sum(0); nchain += len(ts)
    print(f"seq{si}: base next-token acc {base_acc:.3f}")

print("per-head top-1 (quantized trunk):", np.round(hits / tot, 4))
print("expected accepted/round (chain):", (chain[1:] / nchain).sum().round(3))
print("train-time accs: [0.988, 0.908, 0.881, 0.925, 0.883]")
