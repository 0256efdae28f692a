"""Mixtral sparse-MoE family: HF golden + engine-level invariants
(reference: vllm mixtral.py + fused_moe tests)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qspec_tpu.config import ModelConfig  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402
from qspec_tpu.ops.rotary import make_rope_cache  # noqa: E402


def build_pair(seed=0, E=4, k=2):
    hf_cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, num_local_experts=E, num_experts_per_tok=k,
        tie_word_embeddings=False, sliding_window=None)
    torch.manual_seed(seed)
    hf = transformers.MixtralForCausalLM(hf_cfg).eval()

    cfg = ModelConfig(arch="mixtral", vocab_size=256, hidden_size=128,
                      intermediate_size=224, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=32, rope_theta=10000.0,
                      max_position_embeddings=128, quant="none",
                      weightless_norm=False, num_experts=E,
                      num_experts_per_tok=k)

    sd = {kk: v.detach().numpy() for kk, v in hf.state_dict().items()}

    def t(name):
        return jnp.asarray(sd[name].T, jnp.float32)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        m = p + "block_sparse_moe."
        qkv = jnp.concatenate([t(p + "self_attn.q_proj.weight"),
                               t(p + "self_attn.k_proj.weight"),
                               t(p + "self_attn.v_proj.weight")], axis=1)
        gu = jnp.stack([jnp.concatenate([t(f"{m}experts.{e}.w1.weight"),
                                         t(f"{m}experts.{e}.w3.weight")], 1)
                        for e in range(E)])
        dn = jnp.stack([t(f"{m}experts.{e}.w2.weight") for e in range(E)])
        layers.append({
            "qkv": {"w": qkv},
            "o": {"w": t(p + "self_attn.o_proj.weight")},
            "router": t(m + "gate.weight"),
            "experts_gate_up": {"w": gu},
            "experts_down": {"w": dn},
            "input_norm": jnp.asarray(sd[p + "input_layernorm.weight"],
                                      jnp.float32),
            "post_norm": jnp.asarray(sd[p + "post_attention_layernorm.weight"],
                                     jnp.float32),
        })
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"], jnp.float32),
        "lm_head": jnp.asarray(sd["lm_head.weight"].T, jnp.float32),
        "final_norm": jnp.asarray(sd["model.norm.weight"], jnp.float32),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "rope_cache": make_rope_cache(cfg.head_dim,
                                      cfg.max_position_embeddings,
                                      cfg.rope_theta),
    }
    return hf, cfg, params


def test_mixtral_prefill_logits_match_hf(rng):
    hf, cfg, params = build_pair()
    T = 16
    tokens = rng.integers(1, 256, size=T).astype(np.int32)

    with torch.no_grad():
        hf_logits = hf(torch.tensor(tokens[None].astype(np.int64))).logits[0].numpy()

    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8, page_size=16)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    ours, _ = model_forward(params, cfg, jnp.asarray(tokens[None]), cache,
                            batch, scheme="bf16")
    ours = np.asarray(ours[0], np.float32)

    hf_lp = hf_logits - hf_logits.max(-1, keepdims=True)
    our_lp = ours - ours.max(-1, keepdims=True)
    agree = (hf_logits.argmax(-1) == ours.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"
    np.testing.assert_allclose(our_lp, hf_lp, atol=0.35)


def _engine_outputs(cfg, params, prompts, spec, mesh=None):
    from qspec_tpu.config import (CacheConfig, EngineConfig, SchedulerConfig,
                                  SpeculativeConfig)
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    ec = EngineConfig(
        model=cfg, cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=256,
                                  prefill_chunk_size=64,
                                  decode_batch_buckets=(4,),
                                  prefill_token_buckets=(64,)),
        speculative=SpeculativeConfig(num_speculative_tokens=3)
        if spec else None)
    eng = LLMEngine(ec, params, mesh=mesh)
    for p in prompts:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12,
                                          ignore_eos=True))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.output_token_ids
    return outs


@pytest.fixture(scope="module")
def moe_w4():
    from qspec_tpu.models.llama import init_params
    cfg = ModelConfig.tiny(quant="w4", num_experts=4, num_experts_per_tok=2)
    return cfg, init_params(cfg, seed=0)


def test_moe_engine_greedy_spec_equals_ar(moe_w4):
    """The QSpec dual-scheme invariant holds through the MoE MLP too."""
    cfg, params = moe_w4
    rng = np.random.default_rng(17)
    prompts = [list(map(int, rng.integers(1, 500, size=int(rng.integers(8, 30)))))
               for _ in range(3)]
    ar = _engine_outputs(cfg, params, prompts, spec=False)
    sp = _engine_outputs(cfg, params, prompts, spec=True)
    assert ar == sp


def test_moe_expert_parallel_matches_single(moe_w4):
    """EP over a 2-device mesh (experts sharded, router replicated) must
    reproduce the single-chip transcripts under the same mesh-free math."""
    from qspec_tpu.models.llama import init_params
    from qspec_tpu.parallel.tp import make_mesh

    cfg, params = moe_w4
    rng = np.random.default_rng(21)
    prompts = [list(map(int, rng.integers(1, 500, size=16))) for _ in range(2)]
    mesh = make_mesh(tp_size=2)
    # attention projections must be packed per shard (same rule as test_tp);
    # expert weights pack whole regardless (EP shards the expert dim)
    params_tp = init_params(cfg, seed=0, tp_size=2)
    ar_mesh = _engine_outputs(cfg, params_tp, prompts, spec=False, mesh=mesh)
    ar_single = _engine_outputs(cfg, params, prompts, spec=False)
    # both greedy; ULP-level psum reordering can flip near-ties on random
    # weights, so require agreement on the overwhelming majority of tokens
    agree = np.mean([t1 == t2
                     for r in ar_single
                     for t1, t2 in zip(ar_single[r], ar_mesh[r])])
    assert agree >= 0.8, f"token agreement {agree}"
