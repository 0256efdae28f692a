"""LoRA x TP: sharded-projection deltas must equal the single-chip adapter
math (reference intent: punica wrapper under TP, vllm/lora/punica_wrapper).

Adapters stay replicated on the mesh; models/llama.py _maybe_lora slices the
delta per projection (column blocks for qkv/gate_up, A-row stripes joining
the psum for o/down)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qspec_tpu.config import ModelConfig
from qspec_tpu.engine.model_runner import prefill_step
from qspec_tpu.lora import LoRAConfig, init_lora_params
from qspec_tpu.models.llama import init_params
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.parallel.tp import (make_mesh, make_tp_step_fns, shard_cache,
                                   shard_params)


def _fill_adapters(rng, lora, scale=0.05):
    """Random nonzero values in adapter slots 1..n-1 (slot 0 stays base)."""
    out = {"layers": {}}
    for t, ab in lora["layers"].items():
        A, B = np.asarray(ab["A"], np.float32), np.asarray(ab["B"], np.float32)
        A[:, 1:] = rng.standard_normal(A[:, 1:].shape) * scale
        B[:, 1:] = rng.standard_normal(B[:, 1:].shape) * scale
        out["layers"][t] = {"A": jnp.asarray(A, ab["A"].dtype),
                            "B": jnp.asarray(B, ab["B"].dtype)}
    return out


@pytest.mark.parametrize("tp", [2, 4])
def test_lora_tp_prefill_matches_single(rng, tp):
    if len(jax.devices()) < tp:
        pytest.skip("needs virtual device mesh")
    cfg = ModelConfig.tiny(quant="w4", num_layers=2, num_heads=4,
                           num_kv_heads=4, head_dim=64, hidden_size=256,
                           intermediate_size=448)
    lcfg = LoRAConfig(max_loras=3, max_rank=4)
    lora = _fill_adapters(rng, init_lora_params(cfg, lcfg))

    params_1 = {**init_params(cfg, seed=0, tp_size=1), "lora": lora}
    params_tp = {**init_params(cfg, seed=0, tp_size=tp), "lora": lora}

    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                             num_pages=16, page_size=16)
    T = 12
    toks = np.zeros((1, 32), np.int32)
    toks[0, :T] = rng.integers(1, 500, size=T)
    positions = np.arange(32, dtype=np.int32)[None]
    tables = np.zeros((1, 8), np.int32)
    tables[0, :2] = [1, 2]
    ctx = np.asarray([T], np.int32)
    lora_ids = jnp.asarray([2], jnp.int32)  # use a non-base adapter

    ref, _ = prefill_step(params_1, kvc.allocate(kcfg), jnp.asarray(toks),
                          jnp.asarray(positions), jnp.asarray(tables),
                          jnp.asarray(ctx), lora_ids, cfg=cfg, scheme="w4a16")

    mesh = make_mesh(tp_size=tp)
    sp = shard_params(params_tp, cfg, mesh)
    cache1 = shard_cache(kvc.allocate(kcfg), mesh)
    fns = make_tp_step_fns(mesh, cfg, sp, "w4a16", draft_scheme="w4a4", k=2)
    out, _ = fns["prefill"](sp, cache1, jnp.asarray(toks),
                            jnp.asarray(positions), jnp.asarray(tables),
                            jnp.asarray(ctx), lora_ids)

    out = np.asarray(out, np.float32)
    ref = np.asarray(ref, np.float32)
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=5e-2)
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.999

    # and the adapter must actually change the logits (vs slot 0)
    base, _ = fns["prefill"](sp, shard_cache(kvc.allocate(kcfg), mesh),
                             jnp.asarray(toks), jnp.asarray(positions),
                             jnp.asarray(tables), jnp.asarray(ctx),
                             jnp.asarray([0], jnp.int32))
    assert np.abs(np.asarray(base, np.float32) - out).max() > 1e-3
