"""Pipeline parallelism over a ("pipe", "model") mesh.

TPU-native analogue of the reference's PP support (virtual engines +
IntermediateTensors send/recv via get_pp_group(), vllm/distributed/
parallel_state.py:892, vllm/worker/worker_base.py). Instead of per-stage
worker processes exchanging tensors over NCCL, the layer scan is sharded
along a "pipe" mesh axis: each device owns a contiguous layer slab (and its
KV-cache slab), and activations move between stages with a single
`jax.lax.ppermute` per stage boundary.

The schedule is microbatched (GPipe/1F-style, the analogue of the
reference's virtual engines + IntermediateTensors pipelining,
vllm/worker/worker_base.py, vllm/distributed/parallel_state.py:892): the
batch splits into M microbatches and the tick loop runs M + S - 1 ticks; at
tick t, stage s runs ONLY its own layer slab on microbatch t - s, then a
single ppermute advances every in-flight activation one stage. Per-device
work per forward is (M + S - 1)/M slab passes (→ 1 as M grows) instead of
the naive schedule's S passes, and all stages compute concurrently.

Param/cache layout: every per-layer leaf keeps its stacked [L, ...] shape
and is sharded on the layer axis with L % num_stages == 0; shard_map then
hands each stage its local [L/S, ...] slab, and the existing single-chip
`model_forward` runs unchanged on the slab.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_pp_mesh(pp_size: int, tp_size: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = pp_size * tp_size
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(pp_size, tp_size)
    return Mesh(arr, ("pipe", "model"))


def pp_param_pspecs(cfg, params):
    """Layer-stacked leaves shard on axis 0 over 'pipe'; embeddings/head live
    on every stage (replicated) so stage boundaries carry only activations."""
    from qspec_tpu.parallel.tp import param_pspecs

    specs = param_pspecs(cfg, params)

    def add_pipe(spec):
        # prepend 'pipe' on the layer axis (axis 0 of stacked leaves)
        return P(*(("pipe",) + tuple(spec)[1:]))

    specs["layers"] = jax.tree.map(add_pipe, specs["layers"],
                                   is_leaf=lambda x: isinstance(x, P))
    return specs


def pp_cache_pspec():
    from qspec_tpu.ops.kv_cache import PagedKVCache
    return PagedKVCache(
        kv_pages=P("pipe", None, None, "model", None, None),
        kv_scales=None)


def shard_params_pp(params, cfg, mesh: Mesh):
    specs = pp_param_pspecs(cfg, params)
    return jax.tree.map(lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                        params, specs, is_leaf=lambda x: x is None)


def _forward_pp(params, cfg, token_ids, cache, batch, *, scheme,
                num_stages: int, num_micro: int, tp_axis):
    """Stage-sharded microbatched forward: runs inside shard_map with axes
    ('pipe', 'model'). params['layers'] and the cache hold this stage's
    layer slab; activations flow stage to stage with one ppermute per tick.

    The batch axis splits into ``num_micro`` microbatches. Tick t: stage s
    processes microbatch m = t - s (bubble when m is out of range — its
    KV writes are routed to the reserved null page 0 and its output is
    dropped). After M + S - 1 ticks every microbatch has crossed all
    stages; the last stage's activations are gathered and the shared head
    runs once over the full batch.
    """
    from qspec_tpu.models.llama import AttentionBatch, decoder_layer
    from qspec_tpu.ops.rmsnorm_quant import rmsnorm

    B, Q = token_ids.shape
    assert B % num_micro == 0, (B, num_micro)
    Bm = B // num_micro
    stage = jax.lax.axis_index("pipe")

    rope_cache = params["rope_cache"]
    hadamards = params.get("hadamards")
    L_local = cache.num_layers
    layer_ids = jnp.arange(L_local, dtype=jnp.int32)

    def mb(v):  # [B, ...] -> [num_micro, Bm, ...]
        return v.reshape((num_micro, Bm) + v.shape[1:])

    toks = mb(token_ids)
    pos = mb(batch.positions)
    slots = mb(batch.slot_mapping)
    tables = mb(batch.block_tables)
    ctx = mb(batch.ctx_lens)

    def run_slab(x, cache, bmeta):
        def body(carry, li):
            xc, cache = carry
            xc, cache = decoder_layer(xc, params["layers"], cache, li, cfg,
                                      bmeta, rope_cache, hadamards, scheme,
                                      tp_axis)
            return (xc, cache), None
        (y, cache), _ = jax.lax.scan(body, (x, cache), layer_ids)
        return y, cache

    n_ticks = num_micro + num_stages - 1
    fwd = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    def tick(carry, t):
        x_hold, cache, x_final = carry
        m = t - stage
        valid = (m >= 0) & (m < num_micro)
        mc = jnp.clip(m, 0, num_micro - 1)
        # stage 0 ingests a fresh microbatch; others keep what ppermute
        # delivered last tick
        x_in = jnp.where(stage == 0,
                         params["embed"][toks[mc].reshape(-1)].astype(jnp.bfloat16),
                         x_hold)
        bmeta = AttentionBatch(
            positions=pos[mc],
            slot_mapping=jnp.where(valid, slots[mc], 0),
            block_tables=tables[mc],
            ctx_lens=jnp.where(valid, ctx[mc], 0))
        y, cache = run_slab(x_in, cache, bmeta)
        # last stage banks the finished microbatch's activations
        done = valid & (stage == num_stages - 1)
        upd = jnp.where(done, y, x_final[mc])
        x_final = jax.lax.dynamic_update_index_in_dim(x_final, upd, mc, 0)
        if num_stages > 1:
            y = jax.lax.ppermute(y, "pipe", fwd)
        return (y, cache, x_final), None

    x0 = jnp.zeros((Bm * Q, cfg.hidden_size), jnp.bfloat16)
    xf0 = jnp.zeros((num_micro, Bm * Q, cfg.hidden_size), jnp.bfloat16)
    (_, cache, x_final), _ = jax.lax.scan(
        tick, (x0, cache, xf0), jnp.arange(n_ticks, dtype=jnp.int32))

    # broadcast-from-last for the replicated head (psum of the masked value)
    x = x_final.reshape(B * Q, cfg.hidden_size)
    if num_stages > 1:
        x = jax.lax.psum(jnp.where(stage == num_stages - 1, x, 0), "pipe")

    gamma = None if cfg.quant == "w4" else params["final_norm"]
    x = rmsnorm(x, gamma, eps=cfg.rms_norm_eps)
    from qspec_tpu.models.llama import compute_logits
    logits = compute_logits(x, params["lm_head"])
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=1, tiled=True)
    return logits.reshape(B, Q, -1), cache


def make_pp_prefill(mesh: Mesh, cfg, params, scheme: str = "w4a16",
                    num_micro: int | None = None):
    """Compile a PP-sharded prefill step (capability/dryrun entry point).

    ``num_micro``: pipeline microbatches (must divide the batch; default =
    the largest divisor of B that is <= 2*num_stages, so the bubble
    fraction (S-1)/(M+S-1) stays small without shrinking microbatches to
    nothing)."""
    import math
    from jax.experimental.shard_map import shard_map
    from qspec_tpu.models.llama import AttentionBatch
    from qspec_tpu.engine.model_runner import _slot_of

    num_stages = mesh.shape["pipe"]
    tp = mesh.shape["model"]
    pspecs = pp_param_pspecs(cfg, params)
    cspec = pp_cache_pspec()
    R = P()

    def impl(params, cache, token_ids, positions, block_tables, ctx_len):
        page_size = cache.page_size
        B, Q = token_ids.shape
        if num_micro is not None:
            M = num_micro
        else:
            M = max(d for d in range(1, B + 1)
                    if B % d == 0 and d <= 2 * num_stages)
        valid = positions < ctx_len[:, None]
        slot = jnp.where(valid, _slot_of(block_tables, positions, page_size), 0)
        batch = AttentionBatch(positions=positions, slot_mapping=slot,
                               block_tables=block_tables, ctx_lens=ctx_len)
        logits, cache = _forward_pp(params, cfg, token_ids, cache, batch,
                                    scheme=scheme, num_stages=num_stages,
                                    num_micro=M,
                                    tp_axis="model" if tp > 1 else None)
        last = jnp.clip(ctx_len - 1 - positions[:, 0], 0, Q - 1)
        return logits[jnp.arange(B), last], cache

    mapped = shard_map(impl, mesh=mesh,
                       in_specs=(pspecs, cspec, R, R, R, R),
                       out_specs=(P(), cspec), check_rep=False)
    return jax.jit(mapped, donate_argnums=(1,))
