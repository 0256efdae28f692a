"""Tensor-parallel execution over a jax.sharding.Mesh.

TPU-native replacement for the reference's distributed stack
(vllm/distributed/parallel_state.py GroupCoordinator, PyNCCL, custom
all-reduce, shm broadcast — none of which is needed as code on TPU): the
mesh + shard_map express megatron-style TP and XLA emits the ICI collectives.

Sharding rules (axis name "model"):
  qkv / gate_up  : column-parallel (out axis sharded; columns pre-arranged
                   into per-shard (q,k,v)/(gate,up) blocks, see
                   models/llama.py pack_proj_weight)
  o / down       : row-parallel (packed in axis sharded; per-shard halves
                   pairing) + psum
  lm_head        : vocab-sharded + all-gather of logits
  kv cache       : kv-head sharded
  QuaRot extras  : head-Hadamard and MLP-Hadamard need the full activation,
                   so the layer all-gathers before rotating (the QuaRot TP
                   tax; volume = one activation per layer, rides ICI)

The step functions in engine/model_runner.py take `axis_name`; here we wrap
them in shard_map over the mesh and jit the result.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qspec_tpu.config import ModelConfig


def make_mesh(tp_size: int, dp_size: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = tp_size * dp_size
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(arr, ("data", "model"))


def param_pspecs(cfg: ModelConfig, params) -> dict:
    """PartitionSpec pytree matching a params pytree from init_params."""
    quant = cfg.quant == "w4"

    def proj_col(p):  # shard out axis
        if "qo_g" in p:   # grouped (AWQ/GPTQ): scales/offsets follow N
            d = {"qw": P(None, None, "model"), "qs_g": P(None, None, "model"),
                 "qo_g": P(None, None, "model")}
        elif quant:
            d = {"qw": P(None, None, "model"), "qs": P(None, "model")}
        else:
            d = {"w": P(None, None, "model")}
        if "b" in p:
            d["b"] = P(None, "model")
        return d

    def proj_row(p):  # shard (packed) in axis
        if "qo_g" in p:   # grouped: the group axis follows K
            return {"qw": P(None, "model", None),
                    "qs_g": P(None, "model", None),
                    "qo_g": P(None, "model", None)}
        if quant:
            return {"qw": P(None, "model", None), "qs": P(None, None)}
        return {"w": P(None, "model", None)}

    lm = params["lm_head"]
    if isinstance(lm, dict):
        # quantized head: vocab axis (axis 1) sharded, per-channel scales too
        lm_spec = {("qw8" if "qw8" in lm else "qw"): P(None, "model"),
                   "qs": P("model")}
    else:
        lm_spec = P(None, "model")
    layer_p = params["layers"]
    specs = {
        "embed": P(None, None),
        "lm_head": lm_spec,
        "rope_cache": P(None, None, None),
        "layers": {
            "qkv": proj_col(layer_p["qkv"]),
            "o": proj_row(layer_p["o"]),
        },
    }
    if "router" in layer_p:
        # MoE: expert parallelism — the expert dim (axis 1 of every expert
        # leaf [L, E, ...]) is sharded; the router is replicated
        def proj_ep(p):
            return jax.tree.map(
                lambda a: P(*([None, "model"] + [None] * (a.ndim - 2))), p)
        specs["layers"]["router"] = P(None, None, None)
        specs["layers"]["experts_gate_up"] = proj_ep(layer_p["experts_gate_up"])
        specs["layers"]["experts_down"] = proj_ep(layer_p["experts_down"])
        if "shared_gate" in layer_p:
            # qwen2-moe shared expert: replicated (models/llama._moe_block
            # divides its contribution by the shard count before the psum)
            for name in ("shared_gate_up", "shared_down", "shared_gate"):
                specs["layers"][name] = jax.tree.map(lambda x: P(),
                                                     layer_p[name])
    else:
        specs["layers"]["gate_up"] = proj_col(layer_p["gate_up"])
        specs["layers"]["down"] = proj_row(layer_p["down"])
    for qk in ("q_norm", "k_norm"):
        # qwen3 per-head q/k norm gammas [L, head_dim]: replicated (applied
        # per head after the projection; every shard holds whole heads)
        if qk in layer_p:
            specs["layers"][qk] = P(None, None)
    if quant:
        specs["hadamards"] = jax.tree.map(lambda x: P(None, None),
                                          params["hadamards"])
    else:
        specs["final_norm"] = P(None)
        specs["layers"]["input_norm"] = P(None, None)
        specs["layers"]["post_norm"] = P(None, None)
        for extra in ("post_attn_norm", "post_ffw_norm"):  # gemma2
            if extra in layer_p:
                specs["layers"][extra] = P(None, None)
    if "lora" in params:
        # adapters stay replicated (MBs; sharding buys nothing on TPU);
        # models/llama.py _maybe_lora shards the DELTA math per projection
        specs["lora"] = jax.tree.map(lambda x: P(), params["lora"])
    if "medusa" in params:
        # Medusa heads replicated: they read the (replicated) hidden and
        # their argmax must agree on every shard (spec_decode/medusa.py)
        specs["medusa"] = jax.tree.map(lambda x: P(), params["medusa"])
    if "mlp_spec" in params:
        # same contract for the MLPSpeculator recurrent chain
        specs["mlp_spec"] = jax.tree.map(lambda x: P(), params["mlp_spec"])
    if "eagle" in params:
        # EAGLE draft net replicated (draft-TP=1): every chip runs the full
        # one-layer draft with zero collectives over a replicated draft KV,
        # like the separate-draft-model mode; only the verify pass is
        # TP-sharded (token choice synchronised via _vocab_argmax)
        specs["eagle"] = jax.tree.map(lambda x: P(), params["eagle"])
    return specs


def cache_pspec():
    from qspec_tpu.ops.kv_cache import PagedKVCache
    # [L, pages, Hkv, page, D]: shard the kv heads
    return PagedKVCache(
        kv_pages=P(None, None, None, "model", None, None),
        kv_scales=None)


def shard_params(params, cfg: ModelConfig, mesh: Mesh):
    specs = param_pspecs(cfg, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: x is None)


def shard_cache(cache, mesh: Mesh):
    spec = cache_pspec()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)) if x is not None else None,
        cache, spec, is_leaf=lambda x: x is None)


def replicate(tree, mesh: Mesh):
    """Place every leaf fully replicated on the mesh (draft-TP=1 weights)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, sh) if x is not None else None, tree,
        is_leaf=lambda x: x is None)


def _wrap(fn_impl, mesh: Mesh, cfg: ModelConfig, params, extra_in_specs, out_specs,
          donate_cache_index: int, **static):
    """shard_map a step impl over the mesh. Cache arg is sharded; everything
    else (tokens, tables, sampling, keys) is replicated."""
    from jax.experimental.shard_map import shard_map

    pspecs = param_pspecs(cfg, params)
    cspec = cache_pspec()
    in_specs = (pspecs, cspec) + extra_in_specs

    inner = functools.partial(fn_impl, cfg=cfg, axis_name="model", **static)
    mapped = shard_map(inner, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       check_rep=False)
    return jax.jit(mapped, donate_argnums=(donate_cache_index,))


def make_tp_step_fns(mesh: Mesh, cfg: ModelConfig, params, scheme: str,
                     draft_scheme: str = "w4a4", k: int = 3, num_rounds: int = 1,
                     decode_steps: int = 1, nmin: int = 1, nmax: int = 4,
                     draft_cfg: Optional[ModelConfig] = None,
                     draft_params=None, draft_ring_cap: Optional[int] = None):
    """Build shard_mapped analogues of the model_runner step functions.

    Returns dict with keys prefill / decode / draft / verify whose call
    signatures match the single-chip jitted versions (minus the static
    kwargs, already bound).

    ``draft_cfg``/``draft_params``: separate-draft-model mode. The draft's
    weights and KV cache are REPLICATED and its forward runs with
    axis_name=None — every chip computes the full (small) draft with zero
    collectives while the target stays TP-sharded: the TPU analogue of the
    reference's smaller_tp_proposer_worker.py draft-TP=1 split.
    """
    from jax.experimental.shard_map import shard_map

    from qspec_tpu.engine import model_runner as mr

    R = P()  # replicated
    cspec = cache_pspec()
    # a draft_cfg WITHOUT draft_params is the shared-weights windowed draft
    # (SpeculativeConfig.draft_kv_window): same sharded params, capped window
    sep_draft = draft_params is not None
    shared_draft_cfg = draft_cfg if draft_cfg is not None else cfg
    if sep_draft:
        dpspecs = jax.tree.map(lambda x: P(), draft_params,
                               is_leaf=lambda x: x is None)
        from qspec_tpu.ops.kv_cache import PagedKVCache
        dcspec = PagedKVCache(kv_pages=P(), kv_scales=None)

    fns = {}
    fns["prefill"] = _wrap(
        mr.prefill_step.__wrapped__, mesh, cfg, params,
        (R, R, R, R, R), (P(), cspec), 1, scheme=scheme)
    # prompt-embeds variant (two extra replicated operands: embeds + mask)
    fns["prefill_embeds"] = _wrap(
        mr.prefill_step.__wrapped__, mesh, cfg, params,
        (R, R, R, R, R, R, R), (P(), cspec), 1, scheme=scheme)
    fns["prefill_hidden_embeds"] = _wrap(
        mr.prefill_step.__wrapped__, mesh, cfg, params,
        (R, R, R, R, R, R, R), (P(), P(), cspec), 1, scheme=scheme,
        with_hidden=True)
    if sep_draft:
        # replicated draft prefill: no collectives, replicated cache
        d_inner = functools.partial(mr.prefill_step.__wrapped__,
                                    cfg=draft_cfg, axis_name=None,
                                    scheme=draft_scheme)
        fns["prefill_draft"] = jax.jit(shard_map(
            d_inner, mesh=mesh,
            in_specs=(dpspecs, dcspec, R, R, R, R, R),
            out_specs=(P(), dcspec), check_rep=False),
            donate_argnums=(1,))
    else:
        fns["prefill_draft"] = _wrap(
            mr.prefill_step.__wrapped__, mesh, shared_draft_cfg, params,
            (R, R, R, R, R), (P(), cspec), 1, scheme=draft_scheme,
            ring_cap=draft_ring_cap) if cfg.quant == "w4" else None
        fns["prefill_draft_embeds"] = _wrap(
            mr.prefill_step.__wrapped__, mesh, shared_draft_cfg, params,
            (R, R, R, R, R, R, R), (P(), cspec), 1,
            scheme=draft_scheme,
            ring_cap=draft_ring_cap) if cfg.quant == "w4" else None
    fns["prefill_hidden"] = _wrap(
        mr.prefill_step.__wrapped__, mesh, cfg, params,
        (R, R, R, R, R), (P(), P(), cspec), 1, scheme=scheme,
        with_hidden=True)
    fns["decode"] = _wrap(
        mr.decode_step.__wrapped__, mesh, cfg, params,
        (R, R, R, mr_st_spec(), R, R), (P(), P(), cspec), 1, scheme=scheme)
    fns["decode_top"] = _wrap(
        mr.decode_step.__wrapped__, mesh, cfg, params,
        (R, R, R, mr_st_spec(), R, R), (P(), P(), P(), P(), cspec), 1,
        scheme=scheme, num_top=mr.TOPN)
    fns["multi_decode"] = _wrap(
        mr.multi_decode_step.__wrapped__, mesh, cfg, params,
        (R, R, R, R, mr_st_spec(), R, R), (P(), P(), (P(), P(), P()), cspec),
        1, scheme=scheme, num_steps=decode_steps)
    fns["multi_decode_top"] = _wrap(
        mr.multi_decode_step.__wrapped__, mesh, cfg, params,
        (R, R, R, R, mr_st_spec(), R, R),
        (P(), P(), P(), P(), (P(), P(), P()), cspec), 1,
        scheme=scheme, num_steps=decode_steps, num_top=mr.TOPN)
    fns["verify_onehot"] = _wrap(
        mr.verify_step_onehot.__wrapped__, mesh, cfg, params,
        (R, R, R, R, mr_st_spec(), R), (rr_spec(), cspec), 1, scheme=scheme)
    if sep_draft:
        dr_inner = functools.partial(mr.draft_steps.__wrapped__,
                                     cfg=draft_cfg, axis_name=None,
                                     scheme=draft_scheme, k=k)
        fns["draft"] = jax.jit(shard_map(
            dr_inner, mesh=mesh,
            in_specs=(dpspecs, dcspec, R, R, R, mr_st_spec(), R),
            out_specs=(P(), P(), dcspec), check_rep=False),
            donate_argnums=(1,))
    else:
        fns["draft"] = _wrap(
            mr.draft_steps.__wrapped__, mesh, shared_draft_cfg, params,
            (R, R, R, mr_st_spec(), R), (P(), P(), cspec), 1,
            scheme=draft_scheme, k=k)
    fns["verify"] = _wrap(
        mr.verify_step.__wrapped__, mesh, cfg, params,
        (R, R, R, R, R, mr_st_spec(), R), (rr_spec(), cspec), 1, scheme=scheme)

    # fused multi-round spec step: two sharded caches in/out (draft cache and
    # draft params replicated instead when a separate draft model is set)
    pspecs = param_pspecs(cfg, params)
    inner = functools.partial(mr.spec_rounds_step.__wrapped__, cfg=cfg,
                              draft_scheme=draft_scheme, verify_scheme=scheme,
                              k=k, num_rounds=num_rounds, axis_name="model",
                              draft_cfg=draft_cfg,  # windowed shared draft OK
                              draft_axis_name=None if sep_draft else "inherit")
    if sep_draft:
        in_specs = (pspecs, dcspec, cspec, R, R, R, R, R, R, R, mr_st_spec(),
                    R, R, dpspecs)
        out_specs = (P(), P(), P(), (P(), P(), P(), P()), dcspec, cspec)
    else:
        in_specs = (pspecs, cspec, cspec, R, R, R, R, R, R, R, mr_st_spec(),
                    R, R)
        out_specs = (P(), P(), P(), (P(), P(), P(), P()), cspec, cspec)
    mapped = shard_map(inner, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)
    fns["spec_rounds"] = jax.jit(mapped, donate_argnums=(1, 2))

    # fused ngram/null proposer rounds (device-side prompt lookup)
    ng = functools.partial(mr.ngram_rounds_step.__wrapped__, cfg=cfg,
                           scheme=scheme, k=k, num_rounds=num_rounds,
                           nmin=nmin, nmax=nmax, axis_name="model")
    ng_mapped = shard_map(ng, mesh=mesh,
                          in_specs=(pspecs, cspec, R, R, R, R, R, R, R, R,
                                    mr_st_spec(), R),
                          out_specs=(P(), P(), P(), (P(), P(), P(), P()),
                                     P(), cspec),
                          check_rep=False)
    fns["ngram_rounds"] = jax.jit(ng_mapped, donate_argnums=(1, 2))

    # fused Medusa-head proposer rounds (proposal store replicated like the
    # ngram history; heads replicated per param_pspecs)
    md = functools.partial(mr.medusa_rounds_step.__wrapped__, cfg=cfg,
                           scheme=scheme, k=k, num_rounds=num_rounds,
                           axis_name="model")
    md_mapped = shard_map(md, mesh=mesh,
                          in_specs=(pspecs, cspec, R, R, R, R, R, R, R,
                                    mr_st_spec(), R),
                          out_specs=(P(), P(), P(), (P(), P(), P()),
                                     P(), cspec),
                          check_rep=False)
    fns["medusa_rounds"] = jax.jit(md_mapped, donate_argnums=(1, 2))

    if "eagle" in params:
        # EAGLE under TP: draft net + draft KV replicated (param_pspecs),
        # target cache sharded; the fused-feature prefill and the multi-round
        # draft/verify both run in one shard_mapped executable
        from qspec_tpu.ops.kv_cache import PagedKVCache
        from qspec_tpu.spec_decode.eagle import eagle_cfg_for
        ecfg = eagle_cfg_for(cfg)
        ecspec = PagedKVCache(kv_pages=P(), kv_scales=None)
        pe = functools.partial(mr.prefill_eagle_step.__wrapped__, cfg=cfg,
                               ecfg=ecfg, scheme=scheme, axis_name="model")
        fns["prefill_eagle"] = jax.jit(shard_map(
            pe, mesh=mesh,
            in_specs=(pspecs, cspec, ecspec, R, R, R, R, R, R),
            out_specs=(P(), P(), cspec, ecspec), check_rep=False),
            donate_argnums=(1, 2))
        er = functools.partial(mr.eagle_rounds_step.__wrapped__, cfg=cfg,
                               ecfg=ecfg, scheme=scheme, k=k,
                               num_rounds=num_rounds, axis_name="model")
        # span BANK form (espan_h/t/pos/len + rows): replicated like the
        # draft net — every chip holds the full bank and scatters the same
        # rows (see eagle_rounds_step)
        fns["eagle_rounds"] = jax.jit(shard_map(
            er, mesh=mesh,
            in_specs=(pspecs, ecspec, cspec, R, R, R, R, R, R, R,
                      mr_st_spec(), R),
            out_specs=(P(), P(), P(), P(), (P(), P(), P(), P()),
                       ecspec, cspec),
            check_rep=False), donate_argnums=(1, 2, 3, 4, 5, 6))
    return fns


def mr_st_spec():
    from qspec_tpu.ops.sampling import SamplingTensors
    # one replicated spec per field (built from the NamedTuple itself so new
    # fields can't silently fall out of sync): batches carrying guided
    # vocab masks, penalty biases, or grammar FSM tables must match the
    # pytree too (None fields are empty subtrees, so extra specs are inert)
    return SamplingTensors(*([P()] * len(SamplingTensors._fields)))


def rr_spec():
    from qspec_tpu.ops.sampling import RejectionResult
    return RejectionResult(P(), P(), P(), P())
