"""Pipeline parallelism: stage-sharded forward == single-chip forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qspec_tpu.config import ModelConfig
from qspec_tpu.engine.model_runner import prefill_step
from qspec_tpu.models.llama import init_params
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.parallel.pp import make_pp_mesh, make_pp_prefill, shard_params_pp


@pytest.mark.parametrize("pp,tp", [(2, 1), (2, 2)])
def test_pp_prefill_matches_single(rng, pp, tp):
    if len(jax.devices()) < pp * tp:
        pytest.skip("needs virtual device mesh")
    cfg = ModelConfig.tiny(quant="w4", num_layers=4, num_heads=4, num_kv_heads=2,
                           head_dim=64, hidden_size=256, intermediate_size=448)
    params = init_params(cfg, seed=0, tp_size=tp)
    # the single-chip reference must use unpermuted (tp_size=1) packing
    params_ref = init_params(cfg, seed=0, tp_size=1)

    kcfg = kvc.KVCacheConfig(cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                             num_pages=32, page_size=16)
    # 4 sequences -> the microbatched schedule runs 4 microbatches through
    # the 2-stage pipe (5 ticks, incl. 2 bubble slots routed to null page 0)
    B, T = 4, 12
    toks = np.zeros((B, 32), np.int32)
    positions = np.tile(np.arange(32, dtype=np.int32)[None], (B, 1))
    tables = np.zeros((B, 8), np.int32)
    ctx = np.zeros((B,), np.int32)
    for b in range(B):
        t = T - b  # staggered lengths exercise per-microbatch metadata
        toks[b, :t] = rng.integers(1, 500, size=t)
        tables[b, :2] = [1 + 2 * b, 2 + 2 * b]
        ctx[b] = t

    # single chip reference
    cache0 = kvc.allocate(kcfg)
    ref, _ = prefill_step(params_ref, cache0, jnp.asarray(toks), jnp.asarray(positions),
                          jnp.asarray(tables), jnp.asarray(ctx),
                          cfg=cfg, scheme="w4a16")

    mesh = make_pp_mesh(pp, tp)
    sharded = shard_params_pp(params, cfg, mesh)
    from qspec_tpu.parallel.pp import pp_cache_pspec
    from jax.sharding import NamedSharding
    cache1 = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)) if x is not None else None,
        kvc.allocate(kcfg), pp_cache_pspec(), is_leaf=lambda v: v is None)

    fn = make_pp_prefill(mesh, cfg, sharded, scheme="w4a16")
    out, _ = fn(sharded, cache1, jnp.asarray(toks), jnp.asarray(positions),
                jnp.asarray(tables), jnp.asarray(ctx))

    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=5e-2, rtol=5e-2)
