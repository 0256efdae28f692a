"""Teacher-forced medusa head accuracy THROUGH THE SERVING STACK.

Training measured head-j top-1 acc ~0.8 on float features
z = rms_nogamma(x) @ Q. Here: same metric but with hidden from
model_forward(return_hidden) on quantize_float(bits=None) params.
If it reproduces ~0.8 -> decode-time distribution shift; if ~0.15 ->
feature/basis mismatch between train and serve."""
import sys
sys.path.insert(0, "/root/repo")
import json
import numpy as np
import jax.numpy as jnp

from qspec_tpu.config import ModelConfig
from qspec_tpu.model_loader.loader import quantize_float
from qspec_tpu.models.llama import AttentionBatch, model_forward
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.spec_decode.medusa import load_medusa, medusa_propose

base = "/root/repo/checkpoints/induction_lm_v3"
with open(base + ".json") as f:
    meta = json.load(f)
cfg0 = ModelConfig(**meta["cfg"])
sd = dict(np.load(base + ".npz"))

for bits in (None, 4):
    params, cfg = quantize_float(sd, cfg0, bits=bits)
    heads = load_medusa("/root/repo/checkpoints/induction_medusa_v1.npz")

    rng = np.random.default_rng(0)
    T = 512
    period = 48
    seg = rng.integers(2, cfg.vocab_size, size=period)
    tokens = np.tile(seg, T // period + 1)[:T].astype(np.int32)

    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                             num_pages=8, page_size=128)
    cache = kvc.allocate(kcfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None],
        slot_mapping=jnp.arange(T, dtype=jnp.int32)[None] + 128,
        block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    logits, hidden, _ = model_forward(params, cfg, jnp.asarray(tokens[None]),
                                      cache, batch, scheme="w4a16",
                                      return_hidden=True)
    hid = np.asarray(hidden[0], np.float32)         # [T, H]
    lm_acc = (np.asarray(logits[0]).argmax(-1)[72:-1]
              == tokens[73:]).mean()
    props = np.asarray(medusa_propose(heads, jnp.asarray(hid)))  # [T, K]
    K = props.shape[1]
    accs = []
    for j in range(K):
        off = j + 2
        idx = np.arange(72, T - off)
        accs.append(float((props[idx, j] == tokens[idx + off]).mean()))
    print(f"bits={bits}: lm_head acc={lm_acc:.3f} "
          f"head accs={[round(a, 3) for a in accs]}", flush=True)
