"""Mamba (selective state space) family, TPU-first.

Reference surfaces: /root/reference/csrc/mamba/ (selective_scan_fwd +
causal_conv1d CUDA kernels, ~1.8k LoC) and
vllm/model_executor/models/mamba.py (MambaForCausalLM) +
vllm/model_executor/layers/mamba/ (mamba_cache manager).

TPU-native redesign, not a port:

* The selective scan h_t = exp(dt_t A) h_{t-1} + (dt_t B_t) x_t is a
  first-order linear recurrence, so prefill runs it as a LOG-DEPTH
  ``jax.lax.associative_scan`` over the time axis ((a, b) pairs compose
  as (a2*a1, a2*b1 + b2)) — the XLA-friendly replacement for the
  reference's hand-written sequential CUDA kernel. Decode is the closed
  one-step update. All state math in fp32, streams in bf16.

* The causal depthwise conv (k = d_conv) is an unfold + einsum — four
  shifted adds, which XLA fuses; no kernel needed.

* Recurrent state lives in the sequence's FIRST paged-KV page
  ("state-in-page"): the cache tensor [L, P, 2, H, S, D] is viewed per
  layer as [P, page_floats] rows, and each sequence's row packs
  [conv_tail (d_conv-1, d_inner) | ssm_state (d_inner, d_state)] bf16.
  The reference needs a dedicated MambaCacheManager with its own
  tensors, copy-on-preemption and CUDA-graph slotting
  (vllm/model_executor/models/mamba_cache.py); here block tables,
  refcounts, swap and KV-transfer apply to state pages unchanged.
  The engine sizes the page once via ``state_page_geometry``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig


def d_inner_of(cfg: ModelConfig) -> int:
    return cfg.mamba_expand * cfg.hidden_size


def dt_rank_of(cfg: ModelConfig) -> int:
    return cfg.mamba_dt_rank or -(-cfg.hidden_size // 16)


def state_floats(cfg: ModelConfig) -> int:
    di = d_inner_of(cfg)
    return di * (cfg.mamba_d_conv - 1) + di * cfg.mamba_d_state


def state_page_geometry(cfg: ModelConfig):
    """(num_kv_heads, page_rows, head_dim) for a cache page that holds one
    layer's per-sequence state: [2, H, S, D] bf16 with H=1, D=128 lanes."""
    n = state_floats(cfg)
    rows = -(-n // (2 * 128))
    return 1, rows, 128


# ---- state pack/unpack over the paged cache ---------------------------

def read_state(kv_pages, layer, page_ids, cfg: ModelConfig):
    """kv_pages [L, P, 2, H, S, D]; page_ids [B] -> (conv [B, k-1, di] f32,
    ssm [B, di, ds] f32)."""
    L, P = kv_pages.shape[0], kv_pages.shape[1]
    page_floats = int(np.prod(kv_pages.shape[2:]))
    flat = jax.lax.dynamic_index_in_dim(
        kv_pages.reshape(L, P, page_floats), layer, axis=0,
        keepdims=False)[page_ids]                      # [B, page_floats]
    di, ds, k = d_inner_of(cfg), cfg.mamba_d_state, cfg.mamba_d_conv
    n_conv = di * (k - 1)
    conv = flat[:, :n_conv].astype(jnp.float32).reshape(-1, k - 1, di)
    ssm = flat[:, n_conv:n_conv + di * ds].astype(jnp.float32) \
        .reshape(-1, di, ds)
    return conv, ssm


def write_state(kv_pages, layer, page_ids, conv, ssm, cfg: ModelConfig):
    """Scatter updated state rows back; returns the new kv_pages."""
    L, P = kv_pages.shape[0], kv_pages.shape[1]
    shape = kv_pages.shape
    page_floats = int(np.prod(shape[2:]))
    B = page_ids.shape[0]
    row = jnp.concatenate([conv.reshape(B, -1), ssm.reshape(B, -1)], axis=1)
    pad = page_floats - row.shape[1]
    row = jnp.pad(row, ((0, 0), (0, pad))).astype(kv_pages.dtype)
    flat = kv_pages.reshape(L * P, page_floats)
    flat = flat.at[layer * P + page_ids].set(row)
    return flat.reshape(shape)


# ---- mixer ------------------------------------------------------------

def _causal_conv(xc: jnp.ndarray, w: jnp.ndarray, b, k: int) -> jnp.ndarray:
    """xc [B, k-1+Q, di] (conv tail prepended); depthwise kernel
    w [k, di] -> [B, Q, di]."""
    Q = xc.shape[1] - (k - 1)
    out = 0.0
    for j in range(k):
        out = out + xc[:, j:j + Q] * w[j][None, None]
    if b is not None:
        out = out + b[None, None]
    return out


def mamba_mixer(lp: dict, cfg: ModelConfig, x: jnp.ndarray,
                conv_state: jnp.ndarray, ssm_state: jnp.ndarray,
                valid: jnp.ndarray, last_idx: jnp.ndarray):
    """One mixer over a (possibly padded) chunk.

    x [B, Q, d_model] bf16; conv_state [B, k-1, di] f32; ssm_state
    [B, di, ds] f32; valid [B, Q] marks real positions (padded tail must
    not advance state); last_idx [B] = index of each row's final valid
    position. Returns (y [B, Q, d_model], new_conv, new_ssm).
    """
    B, Q, _ = x.shape
    di, ds, k = d_inner_of(cfg), cfg.mamba_d_state, cfg.mamba_d_conv
    dtr = dt_rank_of(cfg)
    f32 = jnp.float32

    xz = jnp.dot(x.astype(jnp.bfloat16), lp["in_proj"],
                 preferred_element_type=f32)           # [B, Q, 2*di]
    x1, z = xz[..., :di], xz[..., di:]
    x1 = jnp.where(valid[..., None], x1, 0.0)

    xc = jnp.concatenate([conv_state, x1], axis=1)     # [B, k-1+Q, di]
    xconv = _causal_conv(xc, lp["conv_w"], lp.get("conv_b"), k)
    xconv = jax.nn.silu(xconv)
    # next conv tail = last k-1 VALID inputs per row: gather windows
    # ending at last_idx (positions beyond it are padding)
    tail_idx = last_idx[:, None] + 1 + jnp.arange(k - 1)[None, :]  # in xc
    new_conv = jnp.take_along_axis(xc, tail_idx[..., None], axis=1)

    xdb = jnp.dot(xconv.astype(jnp.bfloat16), lp["x_proj"],
                  preferred_element_type=f32)          # [B, Q, dtr+2*ds]
    dt = xdb[..., :dtr]
    Bm = xdb[..., dtr:dtr + ds]                        # [B, Q, ds]
    Cm = xdb[..., dtr + ds:]
    if cfg.mamba_mixer_rms_eps is not None:
        # FalconMamba: weightless RMSNorm on (dt, B, C) (HF rms_forward)
        def _wrms(v):
            return v * jax.lax.rsqrt(
                jnp.mean(v * v, -1, keepdims=True)
                + cfg.mamba_mixer_rms_eps)
        dt, Bm, Cm = _wrms(dt), _wrms(Bm), _wrms(Cm)
    if "dt_norm" in lp:
        # Jamba: LEARNED RMSNorms on (dt, B, C) (HF Jamba dt/b/c_layernorm)
        def _lrms(v, g):
            return v * jax.lax.rsqrt(
                jnp.mean(v * v, -1, keepdims=True)
                + cfg.rms_norm_eps) * g.astype(f32)
        dt = _lrms(dt, lp["dt_norm"])
        Bm = _lrms(Bm, lp["b_norm"])
        Cm = _lrms(Cm, lp["c_norm"])
    dt = jnp.dot(dt.astype(jnp.bfloat16), lp["dt_w"],
                 preferred_element_type=f32) + lp["dt_b"]
    dt = jax.nn.softplus(dt)                           # [B, Q, di]
    dt = jnp.where(valid[..., None], dt, 0.0)          # padding: a=1, b=0

    A = -jnp.exp(lp["A_log"].astype(f32))              # [di, ds]
    a = jnp.exp(dt[..., None] * A[None, None])         # [B, Q, di, ds]
    bx = (dt * xconv)[..., None] * Bm[:, :, None, :]   # [B, Q, di, ds]

    def comb(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    a_sc, b_sc = jax.lax.associative_scan(comb, (a, bx), axis=1)
    h = a_sc * ssm_state[:, None] + b_sc               # [B, Q, di, ds]
    y = jnp.sum(h * Cm[:, :, None, :], axis=-1)        # [B, Q, di]
    y = y + lp["D"][None, None] * xconv
    y = y * jax.nn.silu(z)
    new_ssm = jnp.take_along_axis(
        h, last_idx[:, None, None, None].repeat(di, 2).repeat(ds, 3),
        axis=1)[:, 0]
    out = jnp.dot(y.astype(jnp.bfloat16), lp["out_proj"],
                  preferred_element_type=f32)
    return out.astype(jnp.bfloat16), new_conv, new_ssm


def mamba_forward(params, cfg: ModelConfig, token_ids: jnp.ndarray,
                  kv_pages: jnp.ndarray, page_ids: jnp.ndarray,
                  ctx_len: jnp.ndarray, positions: jnp.ndarray,
                  logits_indices: Optional[jnp.ndarray] = None,
                  return_hidden: bool = False):
    """Full forward over a chunk. token_ids [B, Q]; page_ids [B] = each
    row's state page; ctx_len [B] counts tokens incl. this chunk;
    positions [B, Q] absolute positions (padded tail >= ctx_len).

    Returns (logits, kv_pages) — kv_pages carries the updated states.
    """
    B, Q = token_ids.shape
    x = params["embed"][token_ids.reshape(-1)].astype(jnp.bfloat16)
    x = x.reshape(B, Q, -1)
    valid = positions < ctx_len[:, None]
    last_idx = jnp.clip(ctx_len - 1 - positions[:, 0], 0, Q - 1)

    def rms(v, gamma):
        v32 = v.astype(jnp.float32)
        n = v32 * jax.lax.rsqrt(
            jnp.mean(v32 * v32, -1, keepdims=True) + cfg.rms_norm_eps)
        return (n * gamma).astype(jnp.bfloat16)

    def layer_fn(carry, lp_i):
        x, kv_pages, li = carry
        conv, ssm = read_state(kv_pages, li, page_ids, cfg)
        h = rms(x, lp_i["norm"])
        y, conv, ssm = mamba_mixer(lp_i, cfg, h, conv, ssm, valid, last_idx)
        kv_pages = write_state(kv_pages, li, page_ids, conv, ssm, cfg)
        return (x + y, kv_pages, li + 1), None

    (x, kv_pages, _), _ = jax.lax.scan(
        layer_fn, (x, kv_pages, jnp.asarray(0, jnp.int32)),
        params["layers"])
    x = rms(x, params["final_norm"])
    if return_hidden:
        hidden = x
    if logits_indices is not None:
        x = jnp.take_along_axis(x, logits_indices[:, None, None], axis=1)
    logits = jnp.dot(x.astype(jnp.bfloat16), params["lm_head"],
                     preferred_element_type=jnp.float32)
    if return_hidden:
        return logits, hidden, kv_pages
    return logits, kv_pages


# ---- params -----------------------------------------------------------

def convert_mamba(sd: dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """HF MambaForCausalLM state dict -> our param pytree."""
    def a(name):
        return np.asarray(sd[name], np.float32)

    layers = []
    for i in range(cfg.num_layers):
        p = f"backbone.layers.{i}."
        m = p + "mixer."
        lp = {
            "norm": jnp.asarray(a(p + "norm.weight"), dtype),
            "in_proj": jnp.asarray(a(m + "in_proj.weight").T, dtype),
            "conv_w": jnp.asarray(a(m + "conv1d.weight")[:, 0].T, dtype),
            "x_proj": jnp.asarray(a(m + "x_proj.weight").T, dtype),
            "dt_w": jnp.asarray(a(m + "dt_proj.weight").T, dtype),
            "dt_b": jnp.asarray(a(m + "dt_proj.bias"), jnp.float32),
            "A_log": jnp.asarray(a(m + "A_log"), jnp.float32),
            "D": jnp.asarray(a(m + "D"), jnp.float32),
            "out_proj": jnp.asarray(a(m + "out_proj.weight").T, dtype),
        }
        if m + "conv1d.bias" in sd:
            lp["conv_b"] = jnp.asarray(a(m + "conv1d.bias"), jnp.float32)
        layers.append(lp)
    embed = a("backbone.embeddings.weight")
    lm_head = sd.get("lm_head.weight", embed)
    return {
        "embed": jnp.asarray(embed, dtype),
        "lm_head": jnp.asarray(np.asarray(lm_head, np.float32).T, dtype),
        "final_norm": jnp.asarray(a("backbone.norm_f.weight"), dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }


def init_mamba_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16):
    """Random params in the converted layout (tests)."""
    rng = np.random.default_rng(seed)
    H, di, ds, k = (cfg.hidden_size, d_inner_of(cfg), cfg.mamba_d_state,
                    cfg.mamba_d_conv)
    dtr = dt_rank_of(cfg)

    def g(*shape, scale=None):
        s = scale or (shape[0] ** -0.5)
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s,
                           dtype)

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "norm": jnp.ones((H,), dtype),
            "in_proj": g(H, 2 * di),
            "conv_w": g(k, di, scale=0.3),
            "conv_b": jnp.zeros((di,), jnp.float32),
            "x_proj": g(di, dtr + 2 * ds),
            "dt_w": g(dtr, di),
            "dt_b": jnp.asarray(
                np.log(np.expm1(rng.uniform(1e-3, 0.1, di))), jnp.float32),
            "A_log": jnp.asarray(
                np.log(np.tile(np.arange(1, ds + 1, dtype=np.float32),
                               (di, 1))), jnp.float32),
            "D": jnp.ones((di,), jnp.float32),
            "out_proj": g(di, H),
        })
    return {
        "embed": g(cfg.vocab_size, H, scale=0.02),
        "lm_head": g(H, cfg.vocab_size),
        "final_norm": jnp.ones((H,), dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }
