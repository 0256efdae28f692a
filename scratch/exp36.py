"""exp36: 8B B=8 decode-step region breakdown on the chip (round 2).

Times, via chained differential loops:
  A. full decode body (model_forward + sample)     [= one decode step]
  B. trunk only (32x decoder_layer scan)
  C. lm_head + sampling only
  D. paged attention only (32 layers, ctx ~768)
  E. the four trunk GEMMs at M=8 (32 layers)
Reports each vs its HBM-floor estimate.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()
from tpu_timing import timed_chain

from qspec_tpu.config import ModelConfig
from qspec_tpu.models.llama import (init_params_device, model_forward,
                                    decoder_layer, compute_logits,
                                    AttentionBatch)
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.sampling import sample_with_logprob
from qspec_tpu.ops.rmsnorm_quant import rmsnorm
from qspec_tpu.engine.model_runner import _slot_of
from qspec_tpu.engine.model_runner import make_sampling_tensors
from qspec_tpu.core.sequence import Sequence
from qspec_tpu.sampling_params import SamplingParams

cfg = ModelConfig.llama3_8b(quant="w4")
B, CTX = 8, 760
params = init_params_device(cfg, 0)
jax.device_get(jax.tree.leaves(params)[0][:1])
print("params ready", flush=True)

kcfg = kvc.KVCacheConfig(num_layers=cfg.num_layers, num_pages=64, page_size=128,
                         num_kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
                         dtype=jnp.bfloat16)
cache = kvc.allocate(kcfg)
pages_per_seq = 8
bt = np.arange(B * pages_per_seq, dtype=np.int32).reshape(B, pages_per_seq) % kcfg.num_pages
block_tables = jnp.asarray(bt)
start_pos = jnp.full((B,), CTX, jnp.int32)
tok0 = jnp.full((B,), 17, jnp.int32)

# sampling tensors: greedy
seqs = [Sequence(i, list(range(4)), SamplingParams(temperature=0.0)) for i in range(B)]
st = make_sampling_tensors(seqs, vocab_size=cfg.vocab_size)
st = jax.tree.map(jnp.asarray, st)
key = jax.random.PRNGKey(0)

page_size = kcfg.page_size


def full_body(carry, _, params):
    cache, tok, pos = carry
    p = pos[:, None]
    slot = _slot_of(block_tables, p, page_size)
    batch = AttentionBatch(positions=p, slot_mapping=slot,
                           block_tables=block_tables, ctx_lens=pos + 1)
    logits, cache = model_forward(params, cfg, tok[:, None], cache, batch,
                                  scheme="w4a16")
    nxt, _ = sample_with_logprob(logits[:, 0], st, key)
    return (cache, nxt, pos), None


def mk_full(n):
    @jax.jit
    def run(params_, cache, tok):
        def body(c, _):
            return full_body(c, _, params_)
        (cache, tok, _), _ = jax.lax.scan(body, (cache, tok, start_pos),
                                          None, length=n)
        return tok + (cache.kv_pages.reshape(-1)[0] * 0).astype(jnp.int32)
    return lambda x: run(params, cache, x)


def trunk_body(carry, _, params):
    cache, x, pos = carry
    p = pos[:, None]
    slot = _slot_of(block_tables, p, page_size)
    batch = AttentionBatch(positions=p, slot_mapping=slot,
                           block_tables=block_tables, ctx_lens=pos + 1)
    L = cache.num_layers
    def body(c, li):
        xx, cc = c
        xx, cc = decoder_layer(xx, params["layers"], cc, li, cfg, batch,
                               params["rope_cache"], params.get("hadamards"),
                               "w4a16")
        return (xx, cc), None
    (x, cache), _ = jax.lax.scan(body, (x, cache),
                                 jnp.arange(L, dtype=jnp.int32))
    return (cache, x.astype(jnp.bfloat16), pos), None


def mk_trunk(n):
    @jax.jit
    def run(params_, cache, x):
        def body(c, _):
            return trunk_body(c, _, params_)
        (cache, x, _), _ = jax.lax.scan(body, (cache, x, start_pos),
                                        None, length=n)
        return x
    x0 = jnp.zeros((B, cfg.hidden_size), jnp.bfloat16)
    return lambda _: run(params, cache, x0)


def head_body(x, _, params):
    xn = rmsnorm(x, None, eps=cfg.rms_norm_eps)
    logits = compute_logits(xn, params["lm_head"])
    nxt, _ = sample_with_logprob(logits, st, key)
    x = x + params["embed"][nxt].astype(jnp.bfloat16) * 1e-30
    return x, None


def mk_head(n):
    @jax.jit
    def run(params_, x):
        def body(c, _):
            return head_body(c, _, params_)
        x, _ = jax.lax.scan(body, x, None, length=n)
        return x
    xh = jnp.ones((B, cfg.hidden_size), jnp.bfloat16)
    return lambda _: run(params, xh)


def attn_body(carry, _):
    from qspec_tpu.models.llama import paged_attention
    cache, q = carry
    ctx = start_pos + 1
    def body(qq, li):
        o = paged_attention(qq.reshape(B, 1, cfg.num_heads, cfg.head_dim),
                            cache, li, block_tables, ctx, cfg.head_dim ** -0.5,
                            q_positions=start_pos[:, None])
        return o.reshape(B, cfg.num_heads, cfg.head_dim).astype(jnp.bfloat16), None
    q, _ = jax.lax.scan(body, q, jnp.arange(cache.num_layers, dtype=jnp.int32))
    return (cache, q), None


def mk_attn(n):
    @jax.jit
    def run(cache, q):
        (cache, q), _ = jax.lax.scan(attn_body, (cache, q), None, length=n)
        return q
    q0 = jnp.zeros((B, cfg.num_heads, cfg.head_dim), jnp.bfloat16)
    return lambda _: run(cache, q0)


def gemm_body(x, _, params):
    from qspec_tpu.models.llama import _linear
    ly = params["layers"]
    def body(xx, li):
        qkv = _linear(xx, ly["qkv"], "w4a16", li=li)
        o = _linear(qkv[:, :cfg.hidden_size], ly["o"], "w4a16", li=li)
        gu = _linear(xx + o * 1e-30, ly["gate_up"], "w4a16", li=li)
        i_local = gu.shape[-1] // 2
        dn = _linear(gu[:, :i_local], ly["down"], "w4a16", li=li)
        return (xx + dn * 1e-30).astype(jnp.bfloat16), None
    x, _ = jax.lax.scan(body, x, jnp.arange(cfg.num_layers, dtype=jnp.int32))
    return x, None


def mk_gemm(n):
    @jax.jit
    def run(params_, x):
        def body(c, _):
            return gemm_body(c, _, params_)
        x, _ = jax.lax.scan(body, x, None, length=n)
        return x
    x0 = jnp.zeros((B, cfg.hidden_size), jnp.bfloat16)
    return lambda _: run(params, x0)


H, I, V, L = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size, cfg.num_layers
kvsz = cfg.num_kv_heads * cfg.head_dim
trunk_params = L * (H * (H + 2 * kvsz) + H * H + 2 * H * I + I * H)
trunk_gb = trunk_params * 0.5 / 1e9
lm_head_gb = H * V * 1 / 1e9  # int8 by default? check cfg.lm_head_quant
kv_gb = L * B * 768 * kvsz * 2 * 2 / 1e9
BW = 0.819  # TB/s v5e

x0 = tok0
for name, mk, floor_gb in [("head+sample", mk_head, lm_head_gb),
                           ("attn", mk_attn, kv_gb),
                           ("gemms", mk_gemm, trunk_gb),
                           ("trunk", mk_trunk, trunk_gb + kv_gb),
                           ("full", mk_full, trunk_gb + lm_head_gb + kv_gb)]:
    t = timed_chain(mk, x0, N=4)
    print(f"{name:12s}: {t*1e3:7.3f} ms  floor {floor_gb/BW:6.3f} ms "
          f"({floor_gb:.2f} GB -> {floor_gb/t:.0f} GB/s eff)", flush=True)
