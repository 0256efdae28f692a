"""EAGLE-style proposer: a one-layer draft transformer over fused
(token-embedding, target-hidden) features.

TPU-native redesign of the reference's EAGLE integration
(/root/reference/vllm/model_executor/models/eagle.py + the spec-decode
draft-worker machinery): the draft net is

    f_t   = fc(concat(embed(x_{t+1}), h_t))          # fused feature
    a_t   = rmsnorm(decoder_layer(f_{<=t}))          # ~ h_{t+1}
    p(x_{t+2}) = lm_head(a_t)                        # target's own head

where h_t is the TARGET's post-final-norm hidden at position t. The draft
keeps its own single-layer paged KV cache over feature positions. Unlike
Medusa (heads limited to what one frozen hidden encodes), the draft layer
ATTENDS over the whole context, so it can learn e.g. induction copying on a
frozen base.

Engine shape (engine/model_runner.py):
- prefill_eagle: the target prefill additionally returns per-position
  hidden states; features for the prompt (tokens shifted by one) stream
  through the draft layer in the same executable, building the draft KV.
- eagle_rounds_step: each round (a) re-feeds the previous round's ACCEPTED
  span through the draft layer with TRUE hiddens (from verify) — drafted
  KV entries for those positions are overwritten, which is the EAGLE
  rollback; (b) drafts k tokens autoregressively on predicted hiddens;
  (c) verifies through the one-hot rejection path (greedy spec == greedy
  AR holds for any draft quality).

Params live at ``params["eagle"]``: {"fc": [2H, H], "layers": single-layer
llama dict (bf16)}; trained in-image by benchmarks/train_eagle.py on the
rotated serving basis (same convention as the Medusa heads).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def eagle_cfg_for(cfg):
    """Draft-layer ModelConfig: one bf16 llama layer with the target's
    dims (the draft KV cache geometry comes from this)."""
    from qspec_tpu.config import ModelConfig
    return ModelConfig(**{**cfg.__dict__, "num_layers": 1, "quant": "none",
                          "weightless_norm": False, "num_experts": 0,
                          "shared_expert_intermediate_size": 0,
                          "sliding_window": None, "post_norms": False,
                          "lm_head_quant": "bf16"})


def fuse_features(eagle: dict, embeds: jnp.ndarray,
                  hidden: jnp.ndarray) -> jnp.ndarray:
    """f = fc(concat(e, h)): [..., H] x [..., H] -> [..., H] bf16."""
    f = jnp.concatenate([embeds.astype(jnp.float32),
                         hidden.astype(jnp.float32)], axis=-1)
    out = jnp.dot(f.reshape(-1, f.shape[-1]).astype(jnp.bfloat16),
                  eagle["fc"].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return out.reshape(f.shape[:-1] + (out.shape[-1],)).astype(jnp.bfloat16)


def eagle_layer_step(eagle: dict, ecfg, draft_cache, feats, batch):
    """Run the draft decoder layer over a feature block.

    feats [B, Q, H] bf16; batch: AttentionBatch for the feature positions.
    Returns (a [B, Q, H] — rms-normed layer output, the ~h_{t+1}
    prediction — and the updated draft cache)."""
    from qspec_tpu.models.llama import decoder_layer
    from qspec_tpu.ops.rmsnorm_quant import rmsnorm

    B, Q, H = feats.shape
    x, draft_cache = decoder_layer(
        feats.reshape(B * Q, H), eagle["layers"], draft_cache,
        jnp.asarray(0, jnp.int32), ecfg, batch, eagle["rope_cache"],
        None, "bf16")
    a = rmsnorm(x, None, eps=ecfg.rms_norm_eps)
    return a.reshape(B, Q, H), draft_cache


def init_eagle_params(cfg, seed: int = 0, dtype=jnp.bfloat16) -> dict:
    """Random draft-layer params (tests / training init)."""
    from qspec_tpu.models.llama import init_params
    from qspec_tpu.ops.rotary import make_rope_cache

    ecfg = eagle_cfg_for(cfg)
    rng = np.random.default_rng(seed)
    base = init_params(ecfg, seed=seed, dtype=dtype)
    H = cfg.hidden_size
    fc = rng.standard_normal((2 * H, H)).astype(np.float32) * (2 * H) ** -0.5
    return {
        "fc": jnp.asarray(fc, dtype),
        "layers": base["layers"],
        "rope_cache": make_rope_cache(cfg.head_dim,
                                      cfg.max_position_embeddings,
                                      cfg.rope_theta,
                                      rope_scaling=cfg.rope_scaling),
    }


def load_eagle(path: str, cfg, dtype=jnp.bfloat16) -> dict:
    """Load a trained draft net saved by benchmarks/train_eagle.py."""
    from qspec_tpu.ops.rotary import make_rope_cache

    with np.load(path) as z:
        flat = {k: jnp.asarray(v, dtype) for k, v in z.items()}
    layers = {}
    for k, v in flat.items():
        if k.startswith("layers."):
            parts = k.split(".")[1:]
            d = layers
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = v
    return {"fc": flat["fc"], "layers": layers,
            "rope_cache": make_rope_cache(cfg.head_dim,
                                          cfg.max_position_embeddings,
                                          cfg.rope_theta,
                                          rope_scaling=cfg.rope_scaling)}


def save_eagle(path: str, eagle: dict):
    import jax

    flat = {"fc": np.asarray(jax.device_get(eagle["fc"]), np.float16)}

    def walk(prefix, d):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(f"{prefix}.{k}", v)
            else:
                flat[f"{prefix}.{k}"] = np.asarray(jax.device_get(v),
                                                   np.float16)
    walk("layers", eagle["layers"])
    np.savez(path, **flat)
