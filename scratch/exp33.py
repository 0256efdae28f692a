"""exp33: isolate the greedy spec-vs-AR mismatch on TPU.

Causality says verify logits at query position 0 must equal decode logits
at the same state. Compare bitwise on chip, plus per-op row-determinism
across batch shapes (M=8 vs M=32): matmul, rmsnorm, hadamard, attention.
"""
import numpy as np, jax, jax.numpy as jnp
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from qspec_tpu.config import ModelConfig
import qspec_tpu.ops.kv_cache as kvc
from qspec_tpu.models.llama import (AttentionBatch, init_params_device,
                                    model_forward, _head_hadamard, _mlp_hadamard)
from qspec_tpu.ops.linear_kernels import matmul_w4a16
from qspec_tpu.ops.rmsnorm_quant import rmsnorm
import qspec_tpu.engine.model_runner as mr

cfg = ModelConfig.llama3_8b(quant="w4")
params = init_params_device(cfg, 0)
jax.device_get(jax.tree.leaves(params)[0][:1])
print("params ready", flush=True)

B, PPS, S = 8, 8, 128
kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                         num_pages=1 + B * PPS, page_size=S)
key = jax.random.PRNGKey(7)
cache = kvc.allocate(kcfg)
cache = cache._replace(kv_pages=(jax.random.normal(
    key, cache.kv_pages.shape, jnp.float32) * 0.3).astype(jnp.bfloat16))
tables = jnp.asarray(np.arange(1, 1 + B * PPS).reshape(B, PPS), jnp.int32)
pos = jnp.full((B,), 700, jnp.int32)
last = jnp.full((B,), 1234, jnp.int32)

def batch_for(tokens):
    Bq, Q = tokens.shape
    positions = pos[:, None] + jnp.arange(Q)[None, :]
    slot = (tables[jnp.arange(B)[:, None], positions // S] * S + positions % S)
    return AttentionBatch(positions=positions, slot_mapping=slot,
                          block_tables=tables, ctx_lens=pos + Q)

@jax.jit
def f_decode(params, cache):
    toks = last[:, None]
    lg, _ = model_forward(params, cfg, toks, cache, batch_for(toks), scheme="w4a16")
    return lg[:, 0]

@jax.jit
def f_verify(params, cache):
    toks = jnp.concatenate([last[:, None],
                            jnp.full((B, 3), 77, jnp.int32)], axis=1)
    lg, _ = model_forward(params, cfg, toks, cache, batch_for(toks), scheme="w4a16")
    return lg[:, 0]

a = jax.device_get(f_decode(params, cache))
b = jax.device_get(f_verify(params, cache))
d = np.abs(a - b)
print(f"logits Q1 vs Q4[:,0]: max|d|={d.max():.3e}  argmax match="
      f"{(a.argmax(-1) == b.argmax(-1)).sum()}/{B}", flush=True)

# --- per-op row determinism across M ---
H = cfg.hidden_size
x8 = jax.random.normal(jax.random.PRNGKey(1), (8, H), jnp.bfloat16)
x32 = jnp.concatenate([x8, jax.random.normal(jax.random.PRNGKey(2), (24, H), jnp.bfloat16)])

w = params["layers"]["qkv"]["qw"]
s = params["layers"]["qkv"]["qs"]
o8 = jax.device_get(matmul_w4a16(x8, w, s, layer_idx=jnp.int32(0)))
o32 = jax.device_get(matmul_w4a16(x32, w, s, layer_idx=jnp.int32(0)))[:8]
print("matmul M8 vs M32 row0-7 bit-equal:", np.array_equal(o8, o32), flush=True)

n8 = jax.device_get(jax.jit(lambda x: rmsnorm(x, None, eps=cfg.rms_norm_eps))(x8))
n32 = jax.device_get(jax.jit(lambda x: rmsnorm(x, None, eps=cfg.rms_norm_eps))(x32))[:8]
print("rmsnorm T8 vs T32 bit-equal:", np.array_equal(n8, n32), flush=True)

hh = params["hadamards"]["heads"]
a8 = x8.reshape(8, cfg.num_heads, cfg.head_dim)
a32 = x32.reshape(32, cfg.num_heads, cfg.head_dim)
h8 = jax.device_get(jax.jit(_head_hadamard)(a8, hh))
h32 = jax.device_get(jax.jit(_head_hadamard)(a32, hh))[:8]
print("head_hadamard T8 vs T32 bit-equal:", np.array_equal(h8, h32), flush=True)

hK, hP = params["hadamards"]["mlp_K"], params["hadamards"]["mlp_P"]
m8 = jax.random.normal(jax.random.PRNGKey(3), (8, cfg.intermediate_size), jnp.bfloat16)
m32 = jnp.concatenate([m8, jax.random.normal(jax.random.PRNGKey(4), (24, cfg.intermediate_size), jnp.bfloat16)])
g8 = jax.device_get(jax.jit(_mlp_hadamard)(m8, hK, hP))
g32 = jax.device_get(jax.jit(_mlp_hadamard)(m32, hK, hP))[:8]
print("mlp_hadamard T8 vs T32 bit-equal:", np.array_equal(g8, g32), flush=True)

# attention: Q=1 vs Q=4 with same query row
from qspec_tpu.ops.attention import paged_attention
q1 = jax.random.normal(jax.random.PRNGKey(5), (B, 1, cfg.num_heads, cfg.head_dim), jnp.bfloat16)
q4 = jnp.concatenate([q1, jax.random.normal(jax.random.PRNGKey(6), (B, 3, cfg.num_heads, cfg.head_dim), jnp.bfloat16)], axis=1)
scale = cfg.head_dim ** -0.5
p1 = pos[:, None]
p4 = pos[:, None] + jnp.arange(4)[None, :]
at1 = jax.device_get(jax.jit(lambda q: paged_attention(
    q, cache, 0, tables, pos + 1, scale, q_positions=p1))(q1))
at4 = jax.device_get(jax.jit(lambda q: paged_attention(
    q, cache, 0, tables, pos + 4, scale, q_positions=p4))(q4))[:, :1]
d = np.abs(at1.astype(np.float32) - at4.astype(np.float32))
print(f"attention Q1 vs Q4 row0: max|d|={d.max():.3e} bit-equal={np.array_equal(at1, at4)}", flush=True)

# lm_head w8a16 M8 vs M32
from qspec_tpu.ops.linear_kernels import matmul_w8a16
lw, ls = params["lm_head"]["qw8"], params["lm_head"]["qs"]
l8 = jax.device_get(matmul_w8a16(x8, lw, ls, out_dtype=jnp.float32))
l32 = jax.device_get(matmul_w8a16(x32, lw, ls, out_dtype=jnp.float32))[:8]
print("lm_head M8 vs M32 bit-equal:", np.array_equal(l8, l32), flush=True)
