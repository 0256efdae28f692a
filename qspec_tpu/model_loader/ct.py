"""compressed-tensors checkpoint ingestion (llm-compressor output).

The reference serves these through per-scheme CUDA kernels
(vllm/model_executor/layers/quantization/compressed_tensors/
compressed_tensors.py dispatching W4A16 -> marlin, W8A16 -> marlin,
W8A8 -> cutlass int8). On TPU every supported scheme lands on an existing
Pallas path:

* ``pack-quantized`` int4 (group or channel, symmetric or asymmetric)
  -> the grouped-int4 representation (quant="w4g",
  ops/linear_kernels.matmul_w4a16_g) shared with AWQ/GPTQ.
* ``int-quantized`` int8 weights, per-channel/per-tensor symmetric
  (W8A16 / W8A8 recipes) -> quant="w8" params
  (ops/linear_kernels.matmul_w8a16). W8A8 checkpoints serve with bf16
  activations: activation quantization is a runtime choice the TPU engine
  reserves for QuaRot (quant="w4") checkpoints, and serving a W8A8
  checkpoint at A16 only ever *raises* fidelity.

Tensor layout (compressed_tensors.compressors pack_to_int32 / the
de-facto llm-compressor output):

* ``<proj>.weight_packed`` int32 [N, K//8] — eight 4-bit values per word,
  little-endian along K, stored as (signed q + 8) unsigned nibbles.
* ``<proj>.weight_scale`` [N, G] (G = K//group_size; 1 for channel/tensor
  strategies), fp16/bf16/f32.
* ``<proj>.weight_zero_point`` — absent or all-zero for symmetric; int
  [N, G], or packed int32 [ceil(N/8), G] (packed_dim=0), for asymmetric.
  compressed-tensors zero points are SIGNED offsets in q-space:
  dequant w = (q_signed - zp) * s with q_signed = nibble - 8.
* ``<proj>.weight_shape`` [2] = (N, K) (pack padding disambiguation).
* ``int-quantized``: ``<proj>.weight`` int8 [N, K] + ``weight_scale``
  [N, 1] or scalar.

* ``float-quantized`` fp8 weights (e4m3, per-channel or per-tensor scale;
  llm-compressor FP8 / FP8_DYNAMIC recipes and fbgemm_fp8 checkpoints,
  reference quantization/compressed_tensors/schemes/
  compressed_tensors_w8a8_fp8.py + fbgemm_fp8.py) -> quant="w8" params
  whose "w8" leaf *is* float8_e4m3fn: the matmul_w8a16 Pallas kernel
  upcasts the weight tile to bf16 in-VMEM regardless of storage dtype, so
  fp8 streams half the HBM bytes of bf16 through the same kernel. W8A8-fp8
  dynamic-activation recipes serve at A16 (same fidelity-raising policy as
  int8 W8A8 above).

Scope notes: per-group int8 raises NotImplementedError with a pointer to
the supported recipes; attention ignores the ``ignore`` list beyond
lm_head (the only module the common recipes exclude).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig
from qspec_tpu.model_loader.grouped import _load_grouped, _nibbles


def _unpack_packed_int4(packed: np.ndarray, n: int, k: int) -> np.ndarray:
    """weight_packed int32 [N, K//8] -> unsigned nibbles [K, N] (0..15,
    excess-8: nibble == signed q + 8)."""
    rows = packed.shape[0]
    q = _nibbles(packed).reshape(rows, -1)[:n, :k]        # [N, K]
    return q.T.copy()                                      # [K, N]


def _unpack_zero_point(zp_t: Optional[np.ndarray], n: int, G: int):
    """-> SIGNED zero points [G, N] (0 when symmetric)."""
    if zp_t is None:
        return np.zeros((G, n), np.int16)
    zp_t = np.asarray(zp_t)
    if zp_t.dtype == np.int32 and zp_t.shape[0] != n:
        # packed along N (packed_dim=0): int32 [ceil(N/8), G], excess-8
        zp = _nibbles(zp_t.T).reshape(G, -1)[:, :n].astype(np.int16) - 8
        return zp
    return np.asarray(zp_t, np.int16).reshape(n, G).T     # [G, N]


def _ct_reader(sd: dict, group_size_hint: Optional[int] = None):
    """Returns proj_reader(prefix) -> (q [K,N] unsigned, zp [G,N] unsigned,
    s [G,N] f32) in the AWQ/GPTQ triple convention of grouped.py
    (dequant w = (q - zp) * s with unsigned q and zp)."""

    def reader(prefix: str):
        packed = np.asarray(sd[prefix + ".weight_packed"])
        scale = np.asarray(sd[prefix + ".weight_scale"], np.float32)
        if prefix + ".weight_shape" in sd:
            n, k = (int(v) for v in np.asarray(sd[prefix + ".weight_shape"]))
        else:
            n, k = packed.shape[0], packed.shape[1] * 8
        gi = sd.get(prefix + ".weight_g_idx")
        if gi is not None:
            g = k // max(scale.reshape(n, -1).shape[1], 1)
            want = (np.arange(k) // g).astype(np.int64)
            if not np.array_equal(np.asarray(gi, np.int64), want):
                raise NotImplementedError(
                    "compressed-tensors act-order (g_idx) checkpoints are "
                    "not supported; re-quantize without activation ordering")
        q = _unpack_packed_int4(packed, n, k)              # [K, N] excess-8
        scale = scale.reshape(n, -1).T                     # [G, N]
        G = scale.shape[0]
        zp_signed = _unpack_zero_point(
            sd.get(prefix + ".weight_zero_point"), n, G)   # [G, N] signed
        if k % G:
            raise ValueError(f"scale groups {G} do not divide K={k}")
        if G == 1:
            # channel/tensor strategy: expand to g=128-style groups so the
            # grouped kernel's (even G, g | K/2) block constraints hold
            G2 = max(2, k // 128) if k % 128 == 0 else 2
            scale = np.repeat(scale, G2, axis=0)
            zp_signed = np.repeat(zp_signed, G2, axis=0)
        # grouped.py convention: unsigned q, unsigned zp, w = (q - zp) * s.
        # CT dequant is (q_signed - zp_signed) * s = ((q_u - 8) - zp_s) * s,
        # so the unsigned zp is zp_signed + 8.
        zp = (zp_signed + 8).astype(np.uint8)
        return q, zp, scale

    return reader


def load_ct_packed(path_or_sd, cfg: Optional[ModelConfig] = None,
                   tp_size: int = 1, dtype=jnp.bfloat16):
    """pack-quantized int4 compressed-tensors checkpoint -> grouped-int4
    TPU params (quant="w4g"). Reference: vllm compressed_tensors W4A16
    (CompressedTensorsWNA16 -> marlin kernels)."""
    sd, cfg = _resolve(path_or_sd, cfg)
    return _load_grouped(sd, cfg, "ct", tp_size, dtype,
                         proj_reader=_ct_reader(sd))


def _pack_w8_proj(w_q: np.ndarray, s: np.ndarray, *, shard_in: bool = False,
                  col_blocks=None, tp_size: int = 1,
                  bias: Optional[np.ndarray] = None,
                  store_dtype=jnp.int8) -> Dict:
    """One channelwise projection's param dict. w_q [K, N] int8 (or fp8
    when ``store_dtype`` is a float8 type), s [N] f32. Layout rules mirror
    grouped.pack_grouped_proj (TP stripes for heterogeneous output
    blocks); byte-wide rows need no packing, so shard_in is layout-free."""
    if col_blocks and tp_size > 1:
        def rearrange(a):
            parts = np.split(a, np.cumsum(col_blocks)[:-1], axis=-1)
            chunks = []
            for r in range(tp_size):
                for p in parts:
                    psz = p.shape[-1] // tp_size
                    chunks.append(p[..., r * psz:(r + 1) * psz])
            return np.concatenate(chunks, axis=-1)
        w_q, s = rearrange(w_q), rearrange(s)
        if bias is not None:
            bias = rearrange(bias)
    d = {"w8": jnp.asarray(w_q, store_dtype),
         "s8": jnp.asarray(s, jnp.float32)}
    if bias is not None:
        d["b"] = jnp.asarray(bias, jnp.bfloat16)
    return d


def load_ct_int8(path_or_sd, cfg: Optional[ModelConfig] = None,
                 tp_size: int = 1, dtype=jnp.bfloat16):
    """int-quantized int8 compressed-tensors checkpoint -> quant="w8"
    TPU params (per-out-channel symmetric; W8A16 serving through
    ops/linear_kernels.matmul_w8a16). Reference: vllm compressed_tensors
    W8A16/W8A8 (CompressedTensorsW8A16Fp8 sibling int path)."""
    sd, cfg = _resolve(path_or_sd, cfg)

    def proj(prefix):
        w = np.asarray(sd[prefix + ".weight"], np.int8)       # [N, K]
        s = np.asarray(sd[prefix + ".weight_scale"],
                       np.float32).reshape(-1)                # [N] or [1]
        if s.shape[0] == 1:
            s = np.broadcast_to(s, (w.shape[0],)).copy()
        if s.shape[0] != w.shape[0]:
            raise NotImplementedError(
                "per-group int8 weights are not supported; use per-channel "
                "or per-tensor scales (or the pack-quantized int4 format)")
        return w.T.copy(), s                                  # [K, N], [N]

    return _load_channelwise(sd, cfg, proj, tp_size, dtype, jnp.int8)


def load_ct_fp8(path_or_sd, cfg: Optional[ModelConfig] = None,
                tp_size: int = 1, dtype=jnp.bfloat16):
    """float-quantized (fp8 e4m3) checkpoint -> quant="w8" params whose
    weight leaves are float8_e4m3fn. Covers llm-compressor FP8 recipes and
    fbgemm_fp8 (same tensors, per-channel scale). Reference:
    vllm quantization/compressed_tensors/schemes/compressed_tensors_w8a8_fp8
    .py and quantization/fbgemm_fp8.py."""
    import ml_dtypes

    sd, cfg = _resolve(path_or_sd, cfg)

    def proj(prefix):
        w = np.asarray(sd[prefix + ".weight"])                # [N, K] fp8
        if w.dtype not in (ml_dtypes.float8_e4m3fn, ml_dtypes.float8_e4m3):
            raise ValueError(
                f"{prefix}.weight has dtype {w.dtype}, expected fp8 e4m3 "
                "for a float-quantized checkpoint")
        s = np.asarray(sd[prefix + ".weight_scale"],
                       np.float32).reshape(-1)                # [N] or [1]
        if s.shape[0] == 1:
            s = np.broadcast_to(s, (w.shape[0],)).copy()
        if s.shape[0] != w.shape[0]:
            raise NotImplementedError(
                "per-group fp8 scales are not supported; use per-channel "
                "or per-tensor weight_scale")
        return w.astype(ml_dtypes.float8_e4m3fn).T.copy(), s  # [K, N], [N]

    return _load_channelwise(sd, cfg, proj, tp_size, dtype,
                             jnp.float8_e4m3fn)


def _load_channelwise(sd: dict, cfg: ModelConfig, proj, tp_size: int,
                      dtype, store_dtype):
    """Shared body for byte-per-weight channelwise recipes (int8 / fp8):
    ``proj(prefix) -> (w [K, N] storage-typed, s [N] f32)``."""
    from qspec_tpu.model_loader.loader import _common

    cfg = ModelConfig(**{**cfg.__dict__, "quant": "w8",
                         "weightless_norm": False})

    def cat(parts):
        ws, ss = zip(*parts)
        return np.concatenate(ws, 1), np.concatenate(ss, 0)

    def norm_w(name):
        w = np.asarray(sd[name], np.float32) + cfg.norm_weight_offset
        return jnp.asarray(w, dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}.self_attn."
        mp = f"model.layers.{i}.mlp."
        w, s = cat([proj(p + "q_proj"), proj(p + "k_proj"),
                    proj(p + "v_proj")])
        bias = None
        if cfg.qkv_bias:
            bias = np.concatenate([np.asarray(sd[p + n + ".bias"], np.float32)
                                   for n in ("q_proj", "k_proj", "v_proj")])
        layer = {
            "qkv": _pack_w8_proj(
                w, s, col_blocks=(cfg.q_size, cfg.kv_size, cfg.kv_size),
                tp_size=tp_size, bias=bias, store_dtype=store_dtype),
            "o": _pack_w8_proj(*proj(p + "o_proj"), shard_in=True,
                               tp_size=tp_size, store_dtype=store_dtype),
            "gate_up": _pack_w8_proj(
                *cat([proj(mp + "gate_proj"), proj(mp + "up_proj")]),
                col_blocks=(cfg.intermediate_size, cfg.intermediate_size),
                tp_size=tp_size, store_dtype=store_dtype),
            "down": _pack_w8_proj(*proj(mp + "down_proj"), shard_in=True,
                                  tp_size=tp_size, store_dtype=store_dtype),
            "input_norm": norm_w(f"model.layers.{i}.input_layernorm.weight"),
            "post_norm": norm_w(
                f"model.layers.{i}.post_attention_layernorm.weight"),
        }
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


def load_compressed_tensors(path_or_sd, cfg: Optional[ModelConfig] = None,
                            qconfig: Optional[dict] = None, tp_size: int = 1,
                            dtype=jnp.bfloat16):
    """Dispatch on the checkpoint's quantization_config format
    (reference: compressed_tensors.py get_quant_method)."""
    sd, cfg = _resolve(path_or_sd, cfg)
    fmt = (qconfig or {}).get("format")
    if fmt is None:
        # sniff from tensor names / dtypes
        if any(k.endswith(".weight_packed") for k in sd):
            fmt = "pack-quantized"
        else:
            import ml_dtypes
            fp8 = any(k.endswith("proj.weight")
                      and np.asarray(v).dtype in (ml_dtypes.float8_e4m3fn,
                                                  ml_dtypes.float8_e4m3)
                      for k, v in sd.items())
            fmt = "float-quantized" if fp8 else "int-quantized"
    if fmt == "pack-quantized":
        return load_ct_packed(sd, cfg, tp_size, dtype)
    if fmt == "int-quantized":
        return load_ct_int8(sd, cfg, tp_size, dtype)
    if fmt in ("float-quantized", "naive-quantized", "fbgemm_fp8"):
        return load_ct_fp8(sd, cfg, tp_size, dtype)
    raise NotImplementedError(
        f"compressed-tensors format {fmt!r} is not supported (supported: "
        "pack-quantized int4, int-quantized int8, float-quantized fp8)")


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
# synthetic-checkpoint writers (tests + tooling; also document the format)
# ---------------------------------------------------------------------------


def _pack_to_int32(vals: np.ndarray) -> np.ndarray:
    """unsigned nibbles [..., K] -> int32 [..., K//8], little-endian along
    the last axis (compressed_tensors pack_to_int32)."""
    v = vals.astype(np.uint32).reshape(*vals.shape[:-1], -1, 8)
    word = np.zeros(v.shape[:-1], np.uint32)
    for i in range(8):
        word |= (v[..., i] & 0xF) << np.uint32(4 * i)
    return word.view(np.int32)


def make_ct_packed_tensors(w: np.ndarray, group_size: int = 64,
                           symmetric: bool = True, pack_zp: bool = False):
    """Quantize a float [K, N] weight into pack-quantized compressed-tensors
    format (weight_packed [N, K//8] + weight_scale [N, G] (+ zero point)).
    ``group_size`` <= 0 means channel strategy (one group)."""
    K, N = w.shape
    g = K if group_size <= 0 else group_size
    wg = w.reshape(K // g, g, N)
    if symmetric:
        s = np.maximum(np.abs(wg).max(axis=1) / 7.0, 1e-8)    # [G, N]
        q = np.clip(np.rint(wg / s[:, None]), -8, 7)
        zp_s = np.zeros_like(s, dtype=np.int16)
    else:
        lo, hi = wg.min(axis=1), wg.max(axis=1)
        s = np.maximum((hi - lo) / 15.0, 1e-8)
        zp_s = np.clip(np.rint(-lo / s) - 8, -8, 7).astype(np.int16)
        q = np.clip(np.rint(wg / s[:, None]) + zp_s[:, None], -8, 7)
    q = q.reshape(K, N).astype(np.int16)
    out = {"weight_packed": _pack_to_int32((q.T + 8).astype(np.uint8)),
           "weight_scale": s.T.astype(np.float16),            # [N, G]
           "weight_shape": np.asarray([N, K], np.int64)}
    if not symmetric:
        if pack_zp:
            zpt = zp_s.T                                       # [N, G]
            pad = (-zpt.shape[0]) % 8
            zpt = np.pad(zpt + 8, ((0, pad), (0, 0)))
            out["weight_zero_point"] = _pack_to_int32(zpt.T).T  # [N//8, G]
        else:
            out["weight_zero_point"] = zp_s.T.astype(np.int32)  # [N, G]
    # dequantized twin for oracle models
    deq = ((q.reshape(K // g, g, N).astype(np.float32)
            - zp_s[:, None].astype(np.float32)) * s[:, None]).reshape(K, N)
    return out, deq


def make_ct_fp8_tensors(w: np.ndarray, per_tensor: bool = False):
    """Quantize a float [K, N] weight into float-quantized fp8 format
    (weight fp8 e4m3 [N, K] + weight_scale [N, 1]); scale maps the channel
    absmax to e4m3's 448 top-of-range (llm-compressor FP8 recipe)."""
    import ml_dtypes

    if per_tensor:
        s = np.maximum(np.abs(w).max() / 448.0, 1e-12) * np.ones(1, np.float32)
        q = (w / s[0]).astype(ml_dtypes.float8_e4m3fn)
    else:
        s = np.maximum(np.abs(w).max(axis=0) / 448.0, 1e-12)  # [N]
        q = (w / s[None, :]).astype(ml_dtypes.float8_e4m3fn)
    out = {"weight": q.T.copy(),
           "weight_scale": (s.reshape(-1, 1).astype(np.float32)
                            if not per_tensor else s.astype(np.float32))}
    deq = q.astype(np.float32) * (s if not per_tensor else s[0])
    return out, deq


def make_ct_int8_tensors(w: np.ndarray, per_tensor: bool = False):
    """Quantize a float [K, N] weight into int-quantized compressed-tensors
    format (weight int8 [N, K] + weight_scale [N, 1])."""
    if per_tensor:
        s = np.maximum(np.abs(w).max() / 127.0, 1e-8) * np.ones((1,), np.float32)
        q = np.clip(np.rint(w / s[0]), -127, 127).astype(np.int8)
    else:
        s = np.maximum(np.abs(w).max(axis=0) / 127.0, 1e-8)   # [N]
        q = np.clip(np.rint(w / s[None, :]), -127, 127).astype(np.int8)
    out = {"weight": q.T.copy(),
           "weight_scale": s.reshape(-1, 1).astype(np.float32)
           if not per_tensor else s.astype(np.float32)}
    deq = q.astype(np.float32) * (s if not per_tensor else s[0])
    return out, deq
