import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
from qspec_tpu.config import ModelConfig
from qspec_tpu.engine.model_runner import spec_rounds_step, draft_steps, verify_step
from qspec_tpu.models.llama import init_params
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.sampling import SamplingTensors

cfg = ModelConfig.tiny(quant="w4")
params = init_params(cfg, 0)
kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, num_pages=64, page_size=16)

def fresh():
    return kvc.allocate(kcfg), kvc.allocate(kcfg)

B, k = 2, 3
last = jnp.asarray([5, 9], jnp.int32)
pos = jnp.asarray([0, 0], jnp.int32)
tables = jnp.asarray([[1,2,3,4],[5,6,7,8]], jnp.int32)
st = SamplingTensors.greedy(B)
key = jax.random.PRNGKey(0)
maxnew = jnp.asarray([100, 100], jnp.int32)

# path A: two fused rounds
dc, tc = fresh()
toksA, accA, dc, tc = spec_rounds_step(params, dc, tc, last, pos, tables, maxnew, st, key,
    cfg=cfg, draft_scheme="w4a4", verify_scheme="w4a16", k=k, num_rounds=2)
print("A toks:", np.asarray(toksA), "acc:", np.asarray(accA))

# path B: manual two rounds via separate calls
dc, tc = fresh()
l, p = last, pos
out = []
for r in range(2):
    rk = jax.random.split(jax.random.split(key, 2)[r], 2) if False else key
    d_toks, d_probs, dc = draft_steps(params, dc, l, p, tables, st, key, cfg=cfg, scheme="w4a4", k=k)
    res, tc = verify_step(params, tc, l, d_toks, d_probs, p, tables, st, key, cfg=cfg, scheme="w4a16")
    acc = np.asarray(res.accepted_len)
    t = np.asarray(res.tokens)
    out.append((t, acc))
    l = jnp.asarray([t[i, acc[i]-1] for i in range(B)], jnp.int32)
    p = p + jnp.asarray(acc)
    print("B round", r, "toks:", t, "acc:", acc)
