"""Pipeline parallelism over a ("pipe", "model") mesh.

TPU-native analogue of the reference's PP support (virtual engines +
IntermediateTensors send/recv via get_pp_group(), vllm/distributed/
parallel_state.py:892, vllm/worker/worker_base.py). Instead of per-stage
worker processes exchanging tensors over NCCL, the layer scan is sharded
along a "pipe" mesh axis: each device owns a contiguous layer slab (and its
KV-cache slab), and activations move between stages with a single
`jax.lax.ppermute` per stage boundary.

Round-1 scope: correctness + compile validation (the driver's multi-chip
dryrun). The schedule is the naive sequential one — stage s computes while
the others idle — which is what one (B, Q) rectangle allows; interleaving
microbatches across stages (the reference's virtual-engine trick) is the
round-2 throughput work and slots into the same sharding.

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
                num_stages: int, tp_axis):
    """Stage-sharded forward: runs inside shard_map with axes
    ('pipe', 'model'). params['layers'] and the cache hold this stage's
    layer slab; x is threaded stage to stage with ppermute."""
    from qspec_tpu.models.llama import decoder_layer, model_forward
    from qspec_tpu.ops.rmsnorm_quant import rmsnorm

    B, Q = token_ids.shape
    stage = jax.lax.axis_index("pipe")
    x = params["embed"][token_ids.reshape(-1)].astype(jnp.bfloat16)

    rope_cache = params["rope_cache"]
    hadamards = params.get("hadamards")

    L_local = cache.num_layers
    layer_ids = jnp.arange(L_local, dtype=jnp.int32)

    def run_slab(x, cache):
        def body(carry, li):
            xc, cache = carry
            xc, cache = decoder_layer(xc, params["layers"], cache, li, cfg,
                                      batch, rope_cache, hadamards, scheme,
                                      tp_axis)
            return (xc, cache), None
        (y, cache), _ = jax.lax.scan(body, (x, cache), layer_ids)
        return y, cache

    # naive schedule: stages take turns; non-owners pass x through untouched
    # but still trace the same program (SPMD)
    new_kv = cache.kv_pages
    for s in range(num_stages):
        y, upd = run_slab(x, cache)
        mine = stage == s
        x = jnp.where(mine, y, x)
        new_kv = jnp.where(mine, upd.kv_pages, new_kv)
        if s < num_stages - 1:
            # move activations to the next stage
            x = jax.lax.ppermute(x, "pipe",
                                 [(i, (i + 1) % num_stages)
                                  for i in range(num_stages)])
    # bring the final activations back to every stage for the shared head
    # (broadcast-from-last = psum of the masked value)
    if num_stages > 1:
        x = jax.lax.psum(jnp.where(stage == num_stages - 1, x, 0.0), "pipe")

    cache = cache._replace(kv_pages=new_kv)
    gamma = None if cfg.quant == "w4" else params["final_norm"]
    x = rmsnorm(x, gamma, eps=cfg.rms_norm_eps)
    from qspec_tpu.models.llama import compute_logits
    logits = compute_logits(x, params["lm_head"])
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=1, tiled=True)
    return logits.reshape(B, Q, -1), cache


def make_pp_prefill(mesh: Mesh, cfg, params, scheme: str = "w4a16"):
    """Compile a PP-sharded prefill step (capability/dryrun entry point)."""
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
        Q = token_ids.shape[1]
        valid = positions < ctx_len[:, None]
        slot = jnp.where(valid, _slot_of(block_tables, positions, page_size), 0)
        batch = AttentionBatch(positions=positions, slot_mapping=slot,
                               block_tables=block_tables, ctx_lens=ctx_len)
        logits, cache = _forward_pp(params, cfg, token_ids, cache, batch,
                                    scheme=scheme, num_stages=num_stages,
                                    tp_axis="model" if tp > 1 else None)
        last = jnp.clip(ctx_len[0] - 1 - positions[0, 0], 0, Q - 1)
        return logits[:, last], cache

    mapped = shard_map(impl, mesh=mesh,
                       in_specs=(pspecs, cspec, R, R, R, R),
                       out_specs=(P(), cspec), check_rep=False)
    return jax.jit(mapped, donate_argnums=(1,))
