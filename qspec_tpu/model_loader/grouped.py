"""AWQ / GPTQ checkpoint ingestion -> grouped-int4 TPU params.

The reference serves AWQ and GPTQ checkpoints through dedicated CUDA
kernels (vllm/model_executor/layers/quantization/{awq.py,gptq.py,
gptq_marlin.py} + csrc/quantization/{awq,gptq,gptq_marlin}); on TPU both
formats repack into ONE representation consumed by the Pallas grouped
dequant GEMM (ops/linear_kernels.matmul_w4a16_g):

    qw    int32 [K//8, N]   SWAR nibbles holding the ORIGINAL unsigned q
                            (pack_int4 stores q-8 in excess-8 form, so the
                            stored nibble equals q)
    qs_g  f32  [K//g, N]    per-(group, out-channel) scales
    qo_g  f32  [K//g, N]    precomputed zp*s offsets (dequant w = q*s - zp*s)

Bit layouts handled (verified against the de-facto AutoAWQ/AutoGPTQ
packing; the reference's kernels consume the same):

* AWQ (gemm format): qweight int32 [K, N//8], 8 nibbles along N in the
  interleaved order [0, 2, 4, 6, 1, 3, 5, 7]; qzeros int32 [K//g, N//8]
  same order; scales f16 [K//g, N]. Dequant w = (q - zp) * s.
* GPTQ: qweight int32 [K//8, N], 8 nibbles along K in sequential order;
  qzeros int32 [K//g, N//8], nibbles along N sequential, stored as zp - 1
  (kernels re-add the 1); scales f16 [K//g, N]; g_idx [K] (only trivial
  row->group maps are supported — act-order checkpoints need a K
  permutation that would also permute the preceding layer's outputs).

Models served this way keep their gamma norms and have no QuaRot rotations
(quant="w4g"): only the W4A16 verify scheme applies; speculation still
works through ngram / medusa / separate-draft-model proposers.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig
from qspec_tpu.ops.packing import pack_int4_np

AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)


# ---------------------------------------------------------------------------
# format unpacking (numpy, offline)
# ---------------------------------------------------------------------------


def _nibbles(words: np.ndarray) -> np.ndarray:
    """int32 [..., W] -> uint8 [..., W, 8] nibble planes (shift order)."""
    u = words.view(np.uint32) if words.dtype == np.int32 else words.astype(np.uint32)
    shifts = (4 * np.arange(8, dtype=np.uint32)).reshape((1,) * words.ndim + (8,))
    return ((u[..., None] >> shifts) & 0xF).astype(np.uint8)


def unpack_awq(qweight: np.ndarray, qzeros: np.ndarray,
               scales: np.ndarray):
    """AWQ gemm-format tensors -> (q [K, N] uint8, zp [K//g, N] uint8,
    s [K//g, N] f32)."""
    K, Wn = qweight.shape
    N = Wn * 8
    # output column 8j+i holds nibble 8j + AWQ_ORDER[i] (AutoAWQ
    # reverse_awq_order)
    order = np.arange(N).reshape(-1, 8)[:, list(AWQ_ORDER)].reshape(-1)
    q = _nibbles(qweight).reshape(K, N)[:, order]
    zp = _nibbles(qzeros).reshape(qzeros.shape[0], N)[:, order]
    return q, zp, np.asarray(scales, np.float32)


def unpack_gptq(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray,
                g_idx: Optional[np.ndarray] = None):
    """GPTQ tensors -> (q [K, N] uint8, zp [K//g, N] uint8, s [K//g, N] f32).

    Rejects non-trivial ``g_idx`` (act-order / desc_act=True): honouring it
    needs a contraction-dim permutation that must also permute the previous
    layer's output — the reference's gptq_marlin repacks those offline too.
    """
    Wk, N = qweight.shape
    K = Wk * 8
    G = qzeros.shape[0]
    g = K // G
    if g_idx is not None:
        want = (np.arange(K) // g).astype(np.int64)
        if not np.array_equal(np.asarray(g_idx, np.int64), want):
            raise NotImplementedError(
                "GPTQ act-order (desc_act=True) checkpoints are not "
                "supported; re-quantize with desc_act=False")
    # qweight nibbles run along K: row 8r+i = nibble i of word r
    q = _nibbles(qweight).transpose(0, 2, 1).reshape(K, N)
    # qzeros nibbles run along N, stored as zp - 1
    zp = (_nibbles(qzeros).reshape(G, N) + 1) & 0xF
    return q, zp, np.asarray(scales, np.float32)


# ---------------------------------------------------------------------------
# packing into the TPU layout
# ---------------------------------------------------------------------------


def pack_grouped_proj(q: np.ndarray, zp: np.ndarray, s: np.ndarray, *,
                      shard_in: bool = False, col_blocks=None,
                      tp_size: int = 1,
                      bias: Optional[np.ndarray] = None) -> Dict:
    """One projection's grouped-quant param dict with TP-aware layout.

    q [K, N] uint (0..15), zp/s [K//g, N]. Layout rules mirror
    models/llama.pack_proj_weight: ``col_blocks`` rearranges heterogeneous
    output blocks (qkv / gate_up) into per-shard stripes; ``shard_in``
    (row-parallel) packs each K-chunk independently so a shard's packed rows
    unpack exactly its local activation slice (requires g | K/tp).
    """
    K, N = q.shape
    G = s.shape[0]
    g = K // G
    if col_blocks and tp_size > 1:
        def rearrange(a):
            parts = np.split(a, np.cumsum(col_blocks)[:-1], axis=1)
            chunks = []
            for r in range(tp_size):
                for p in parts:
                    psz = p.shape[1] // tp_size
                    chunks.append(p[:, r * psz:(r + 1) * psz])
            return np.concatenate(chunks, axis=1)
        q, zp, s = rearrange(q), rearrange(zp), rearrange(s)
        if bias is not None:
            bparts = np.split(bias, np.cumsum(col_blocks)[:-1])
            bias = np.concatenate(
                [bp[r * (len(bp) // tp_size):(r + 1) * (len(bp) // tp_size)]
                 for r in range(tp_size) for bp in bparts])
    qs = q.astype(np.int16) - 8          # excess-8 storage => nibble == q
    if shard_in and tp_size > 1:
        if (K // tp_size) % max(g, 8) != 0:
            raise ValueError(f"group size {g} must divide K/tp = {K//tp_size}")
        packed = np.concatenate([pack_int4_np(c) for c in
                                 np.split(qs, tp_size, axis=0)], axis=0)
    else:
        packed = pack_int4_np(qs)
    d = {"qw": jnp.asarray(packed),
         "qs_g": jnp.asarray(s, jnp.float32),
         "qo_g": jnp.asarray(zp.astype(np.float32) * s, jnp.float32)}
    if bias is not None:
        d["b"] = jnp.asarray(bias, jnp.bfloat16)
    return d


# ---------------------------------------------------------------------------
# full-model loaders
# ---------------------------------------------------------------------------


def _load_grouped(sd: dict, cfg: ModelConfig, fmt: str, tp_size: int,
                  dtype=jnp.bfloat16, proj_reader=None):
    """``proj_reader(prefix) -> (q [K,N], zp [G,N], s [G,N])`` overrides the
    AWQ/GPTQ tensor-name unpacking (compressed-tensors ingestion, ct.py)."""
    from qspec_tpu.model_loader.loader import _common

    cfg = ModelConfig(**{**cfg.__dict__, "quant": "w4g",
                         "weightless_norm": False})
    unpack = unpack_awq if fmt == "awq" else unpack_gptq

    def proj(prefix):
        if proj_reader is not None:
            return proj_reader(prefix)
        args = [np.asarray(sd[prefix + ".qweight"]),
                np.asarray(sd[prefix + ".qzeros"]),
                np.asarray(sd[prefix + ".scales"])]
        if fmt == "gptq" and prefix + ".g_idx" in sd:
            args.append(np.asarray(sd[prefix + ".g_idx"]))
        return unpack(*args)

    def cat(parts):
        qs, zps, ss = zip(*parts)
        return (np.concatenate(qs, 1), np.concatenate(zps, 1),
                np.concatenate(ss, 1))

    def norm_w(name):
        w = np.asarray(sd[name], np.float32) + cfg.norm_weight_offset
        return jnp.asarray(w, dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}.self_attn."
        mp = f"model.layers.{i}.mlp."
        q, zp, s = cat([proj(p + "q_proj"), proj(p + "k_proj"),
                        proj(p + "v_proj")])
        bias = None
        if cfg.qkv_bias:
            bias = np.concatenate([np.asarray(sd[p + n + ".bias"], np.float32)
                                   for n in ("q_proj", "k_proj", "v_proj")])
        layer = {
            "qkv": pack_grouped_proj(
                q, zp, s, col_blocks=(cfg.q_size, cfg.kv_size, cfg.kv_size),
                tp_size=tp_size, bias=bias),
            "o": pack_grouped_proj(*proj(p + "o_proj"), shard_in=True,
                                   tp_size=tp_size),
            "gate_up": pack_grouped_proj(
                *cat([proj(mp + "gate_proj"), proj(mp + "up_proj")]),
                col_blocks=(cfg.intermediate_size, cfg.intermediate_size),
                tp_size=tp_size),
            "down": pack_grouped_proj(*proj(mp + "down_proj"), shard_in=True,
                                      tp_size=tp_size),
            "input_norm": norm_w(f"model.layers.{i}.input_layernorm.weight"),
            "post_norm": norm_w(
                f"model.layers.{i}."
                + ("pre_feedforward_layernorm.weight" if cfg.post_norms
                   else "post_attention_layernorm.weight")),
        }
        if cfg.post_norms:   # gemma2 post-block norms
            layer["post_attn_norm"] = norm_w(
                f"model.layers.{i}.post_attention_layernorm.weight")
            layer["post_ffw_norm"] = norm_w(
                f"model.layers.{i}.post_feedforward_layernorm.weight")
        layers.append(layer)

    from qspec_tpu.models.llama import pack_lm_head
    lm = np.asarray(sd.get("lm_head.weight",
                           sd["model.embed_tokens.weight"]), np.float32).T
    params = {
        "embed": jnp.asarray(np.asarray(sd["model.embed_tokens.weight"],
                                        np.float32), dtype),
        "lm_head": pack_lm_head(lm, cfg, dtype),
        "final_norm": norm_w("model.norm.weight"),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        **_common(cfg),
    }
    return params, cfg


def load_awq(path_or_sd, cfg: Optional[ModelConfig] = None, tp_size: int = 1,
             dtype=jnp.bfloat16):
    """AWQ (gemm-format) checkpoint -> grouped-int4 TPU params.
    Reference: vllm quantization/awq.py + csrc/quantization/awq."""
    sd, cfg = _resolve(path_or_sd, cfg)
    return _load_grouped(sd, cfg, "awq", tp_size, dtype)


def load_gptq(path_or_sd, cfg: Optional[ModelConfig] = None, tp_size: int = 1,
              dtype=jnp.bfloat16):
    """GPTQ checkpoint (desc_act=False) -> grouped-int4 TPU params.
    Reference: vllm quantization/gptq.py + csrc/quantization/gptq."""
    sd, cfg = _resolve(path_or_sd, cfg)
    return _load_grouped(sd, cfg, "gptq", tp_size, dtype)


def _resolve(path_or_sd, cfg):
    if isinstance(path_or_sd, dict):
        assert cfg is not None
        return path_or_sd, cfg
    from qspec_tpu.model_loader.loader import (_read_safetensors,
                                               config_from_hf_dir)
    if cfg is None:
        cfg = config_from_hf_dir(path_or_sd)
    return _read_safetensors(path_or_sd), cfg


# ---------------------------------------------------------------------------
# synthetic-checkpoint writers (tests + tooling; also document the formats)
# ---------------------------------------------------------------------------


def make_awq_tensors(w: np.ndarray, group_size: int = 128, seed: int = 0):
    """Quantize a float [K, N] weight into AWQ gemm-format tensors
    (asymmetric, per-group). Returns dict(qweight, qzeros, scales)."""
    q, zp, s = _group_quantize(w, group_size, seed)
    order = np.arange(w.shape[1]).reshape(-1, 8)[:, list(AWQ_ORDER)].reshape(-1)
    inv = np.argsort(order)
    return {"qweight": _pack_words(q[:, inv].reshape(w.shape[0], -1, 8)),
            "qzeros": _pack_words(zp[:, inv].reshape(zp.shape[0], -1, 8)),
            "scales": s.astype(np.float16)}


def make_gptq_tensors(w: np.ndarray, group_size: int = 128, seed: int = 0,
                      with_g_idx: bool = True):
    """Quantize a float [K, N] weight into GPTQ-format tensors."""
    q, zp, s = _group_quantize(w, group_size, seed)
    K, N = w.shape
    out = {"qweight": _pack_words(q.reshape(-1, 8, N).transpose(0, 2, 1)
                                  ).reshape(K // 8, N),
           "qzeros": _pack_words(((zp.astype(np.int16) - 1) & 0xF
                                  ).reshape(zp.shape[0], -1, 8)),
           "scales": s.astype(np.float16)}
    if with_g_idx:
        out["g_idx"] = (np.arange(K) // group_size).astype(np.int32)
    return out


def _pack_words(nibbles: np.ndarray) -> np.ndarray:
    """uint nibble array [..., 8] -> int32 words (shift order)."""
    n = nibbles.astype(np.uint32)
    word = np.zeros(nibbles.shape[:-1], np.uint32)
    for i in range(8):
        word |= (n[..., i] & 0xF) << np.uint32(4 * i)
    return word.view(np.int32)


def _group_quantize(w: np.ndarray, g: int, seed: int):
    """Asymmetric per-group quantization (AWQ/GPTQ semantics):
    w ~ (q - zp) * s with q, zp in [0, 15]."""
    K, N = w.shape
    assert K % g == 0
    wg = w.reshape(K // g, g, N)
    lo, hi = wg.min(axis=1), wg.max(axis=1)        # [G, N]
    s = np.maximum((hi - lo) / 15.0, 1e-8)
    zp = np.clip(np.rint(-lo / s), 0, 15)
    q = np.clip(np.rint(wg / s[:, None]) + zp[:, None], 0, 15)
    return (q.reshape(K, N).astype(np.uint8), zp.astype(np.uint8),
            s.astype(np.float32))
