"""BERT-family encoder-only models for embedding serving, TPU-first.

Reference surface: vllm's embedding-model classes (BertEmbeddingModel in
vllm/model_executor/models/bert.py) serving bge/e5-style retrievers
through /v1/embeddings.

One bidirectional rectangle per request: word + learned-position +
token-type embeddings -> post-LN encoder blocks (biased projections,
GELU) -> pooled vector (cls | mean | last). No KV cache, no decode —
the engine's task="embed" path finishes the request at prefill.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig
from qspec_tpu.models.bart import _ln, _lin, _mha_dense


def bert_forward(params, cfg: ModelConfig, token_ids: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
    """[B, T] + valid mask -> final hidden states [B, T, H]."""
    B, T = token_ids.shape
    x = params["embed"][token_ids.reshape(-1)].reshape(B, T, -1)
    # RoBERTa family offsets position ids by padding_idx+1 (reference
    # models/roberta.py create_position_ids_from_input_ids)
    off = cfg.bert_pos_offset
    x = x + params["pos_embed"][off:off + T][None]
    x = (x + params["type_embed"][0][None, None]).astype(jnp.bfloat16)
    x = _ln(x, params["embed_ln"], eps=cfg.rms_norm_eps)
    nh = cfg.num_heads

    def layer(x, lp):
        qkv = _lin(x, lp["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = _lin(_mha_dense(q, k, v, nh, valid), lp["out"])
        x = _ln(x + o, lp["ln1"], eps=cfg.rms_norm_eps)
        f = jax.nn.gelu(_lin(x, lp["fc1"]).astype(jnp.float32),
                        approximate=False).astype(jnp.bfloat16)
        x = _ln(x + _lin(f, lp["fc2"]), lp["ln2"], eps=cfg.rms_norm_eps)
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return x


def bert_pool(hidden: jnp.ndarray, valid: jnp.ndarray,
              pooling: str) -> jnp.ndarray:
    """[B, T, H] -> [B, H] (cls = position 0; mean over valid; last)."""
    if pooling == "cls":
        return hidden[:, 0]
    if pooling == "mean":
        m = valid[..., None].astype(jnp.float32)
        return (jnp.sum(hidden.astype(jnp.float32) * m, axis=1)
                / jnp.maximum(jnp.sum(m, axis=1), 1.0)).astype(hidden.dtype)
    n = jnp.maximum(jnp.sum(valid.astype(jnp.int32), axis=1) - 1, 0)
    return jnp.take_along_axis(hidden, n[:, None, None], axis=1)[:, 0]


import functools  # noqa: E402


@functools.partial(jax.jit, static_argnames=("cfg", "pooling"))
def embed_bert_step(params, token_ids, valid, *, cfg, pooling="cls"):
    hidden = bert_forward(params, cfg, token_ids, valid)
    return bert_pool(hidden, valid, pooling)


def convert_bert(sd: dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """HF BertModel state dict -> our pytree (with or without the
    'bert.' task-model prefix)."""
    def a(name):
        return np.asarray(sd[name], np.float32)

    root = ""
    for cand in ("bert.", "roberta."):
        if cand + "embeddings.word_embeddings.weight" in sd:
            root = cand

    def lin_t(prefix):
        return {"w": jnp.asarray(a(prefix + ".weight").T, dtype),
                "b": jnp.asarray(a(prefix + ".bias"), jnp.float32)}

    def ln(prefix):
        return {"w": jnp.asarray(a(prefix + ".weight"), jnp.float32),
                "b": jnp.asarray(a(prefix + ".bias"), jnp.float32)}

    layers = []
    for i in range(cfg.num_layers):
        p = f"{root}encoder.layer.{i}."
        qkv_w = np.concatenate([a(p + "attention.self.query.weight").T,
                                a(p + "attention.self.key.weight").T,
                                a(p + "attention.self.value.weight").T],
                               axis=1)
        qkv_b = np.concatenate([a(p + "attention.self.query.bias"),
                                a(p + "attention.self.key.bias"),
                                a(p + "attention.self.value.bias")])
        layers.append({
            "qkv": {"w": jnp.asarray(qkv_w, dtype),
                    "b": jnp.asarray(qkv_b, jnp.float32)},
            "out": lin_t(p + "attention.output.dense"),
            "ln1": ln(p + "attention.output.LayerNorm"),
            "fc1": lin_t(p + "intermediate.dense"),
            "fc2": lin_t(p + "output.dense"),
            "ln2": ln(p + "output.LayerNorm"),
        })
    e = root + "embeddings."
    params = {
        "embed": jnp.asarray(a(e + "word_embeddings.weight"), jnp.float32),
        "pos_embed": jnp.asarray(a(e + "position_embeddings.weight"),
                                 jnp.float32),
        "type_embed": jnp.asarray(a(e + "token_type_embeddings.weight"),
                                  jnp.float32),
        "embed_ln": ln(e + "LayerNorm"),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }
    # sequence-classification heads over the CLS vector (reference
    # models/{bert,roberta}.py + cross-encoder serving,
    # serving_score.py): RoBERTa = classifier.dense -> tanh -> out_proj;
    # BERT = pooler.dense -> tanh -> classifier. Stored in the
    # cross_encoder_score head format ({"w1","b1","act","w","b"}).
    if root + "classifier.out_proj.weight" in sd or \
            "classifier.out_proj.weight" in sd:
        c = root + "classifier." if root + "classifier.dense.weight" in sd \
            else "classifier."
        params["score_head"] = {
            "w1": jnp.asarray(a(c + "dense.weight").T, jnp.float32),
            "b1": jnp.asarray(a(c + "dense.bias"), jnp.float32),
            "act": jnp.asarray(1, jnp.int32),  # 1 = tanh (0 = relu)
            "w": jnp.asarray(a(c + "out_proj.weight").T, jnp.float32),
            "b": jnp.asarray(a(c + "out_proj.bias"), jnp.float32)}
    elif "classifier.weight" in sd and root + "pooler.dense.weight" in sd:
        params["score_head"] = {
            "w1": jnp.asarray(a(root + "pooler.dense.weight").T,
                              jnp.float32),
            "b1": jnp.asarray(a(root + "pooler.dense.bias"), jnp.float32),
            "act": jnp.asarray(1, jnp.int32),  # 1 = tanh (0 = relu)
            "w": jnp.asarray(a("classifier.weight").T, jnp.float32),
            "b": jnp.asarray(a("classifier.bias"), jnp.float32)}
    return params
