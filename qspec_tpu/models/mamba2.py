"""Mamba2 (State Space Duality) family, TPU-first.

Reference surfaces: vllm/model_executor/models/mamba2.py +
layers/mamba/ops (the chunked-SSD Triton kernels).

TPU-native redesign: because the SSD decay is a SCALAR per (head, step)
(A per head x dt_t), the recurrence

    h_t = exp(dt_t A_h) h_{t-1} + (dt_t x_t) (x) B_t

is a first-order linear recurrence with a broadcast multiplier, so
prefill runs the SAME log-depth ``jax.lax.associative_scan`` as Mamba-1
(models/mamba.py) — no chunked off-diagonal factorization needed for
correctness; XLA fuses the scan. Decode is the closed one-step update.
Grouped B/C expand to heads, the short conv runs over the fused
[x | B | C] block, and a GATED RMSNorm precedes out_proj, matching HF
``Mamba2Mixer.torch_forward`` exactly (golden-tested).

State rides the sequence's first cache page like Mamba-1:
[conv tail (k-1, conv_dim) | ssm (heads, head_dim, d_state)] bf16.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig
from qspec_tpu.models.mamba import _causal_conv


def dims_of(cfg: ModelConfig):
    di = cfg.mamba_expand * cfg.hidden_size
    nh = cfg.mamba_heads
    hd = di // nh
    G, ds, k = cfg.mamba_n_groups, cfg.mamba_d_state, cfg.mamba_d_conv
    conv_dim = di + 2 * G * ds
    return di, nh, hd, G, ds, k, conv_dim


def state_floats2(cfg: ModelConfig) -> int:
    di, nh, hd, G, ds, k, conv_dim = dims_of(cfg)
    return conv_dim * (k - 1) + nh * hd * ds


def state_page_geometry2(cfg: ModelConfig):
    n = state_floats2(cfg)
    rows = -(-n // (2 * 128))
    return 1, rows, 128


def read_state2(kv_pages, layer, page_ids, cfg: ModelConfig):
    L, P = kv_pages.shape[0], kv_pages.shape[1]
    page_floats = int(np.prod(kv_pages.shape[2:]))
    flat = jax.lax.dynamic_index_in_dim(
        kv_pages.reshape(L, P, page_floats), layer, axis=0,
        keepdims=False)[page_ids]
    di, nh, hd, G, ds, k, conv_dim = dims_of(cfg)
    n_conv = conv_dim * (k - 1)
    conv = flat[:, :n_conv].astype(jnp.float32).reshape(-1, k - 1, conv_dim)
    ssm = flat[:, n_conv:n_conv + nh * hd * ds].astype(jnp.float32) \
        .reshape(-1, nh, hd, ds)
    return conv, ssm


def write_state2(kv_pages, layer, page_ids, conv, ssm, cfg: ModelConfig):
    L, P = kv_pages.shape[0], kv_pages.shape[1]
    shape = kv_pages.shape
    page_floats = int(np.prod(shape[2:]))
    B = page_ids.shape[0]
    row = jnp.concatenate([conv.reshape(B, -1), ssm.reshape(B, -1)], axis=1)
    row = jnp.pad(row, ((0, 0), (0, page_floats - row.shape[1]))) \
        .astype(kv_pages.dtype)
    flat = kv_pages.reshape(L * P, page_floats)
    flat = flat.at[layer * P + page_ids].set(row)
    return flat.reshape(shape)


def mamba2_mixer(lp: dict, cfg: ModelConfig, x: jnp.ndarray,
                 conv_state: jnp.ndarray, ssm_state: jnp.ndarray,
                 valid: jnp.ndarray, last_idx: jnp.ndarray):
    """x [B, Q, d_model]; conv_state [B, k-1, conv_dim] f32; ssm_state
    [B, nh, hd, ds] f32. Returns (y [B, Q, d_model], conv, ssm)."""
    Bsz, Q, _ = x.shape
    di, nh, hd, G, ds, k, conv_dim = dims_of(cfg)
    f32 = jnp.float32

    proj = jnp.dot(x.astype(jnp.bfloat16), lp["in_proj"],
                   preferred_element_type=f32)  # [B, Q, 2*di+2*G*ds+nh]
    gate = proj[..., :di]
    xbc = proj[..., di:di + conv_dim]
    dt = proj[..., di + conv_dim:]              # [B, Q, nh]
    xbc = jnp.where(valid[..., None], xbc, 0.0)

    xc = jnp.concatenate([conv_state, xbc], axis=1)
    xbc_c = jax.nn.silu(_causal_conv(xc, lp["conv_w"], lp.get("conv_b"), k))
    tail_idx = last_idx[:, None] + 1 + jnp.arange(k - 1)[None, :]
    new_conv = jnp.take_along_axis(xc, tail_idx[..., None], axis=1)
    xbc_c = jnp.where(valid[..., None], xbc_c, 0.0)

    xs = xbc_c[..., :di].reshape(Bsz, Q, nh, hd)
    Bm = xbc_c[..., di:di + G * ds].reshape(Bsz, Q, G, ds)
    Cm = xbc_c[..., di + G * ds:].reshape(Bsz, Q, G, ds)
    rep = nh // G
    Bm = jnp.repeat(Bm, rep, axis=2)            # [B, Q, nh, ds]
    Cm = jnp.repeat(Cm, rep, axis=2)

    dt = jax.nn.softplus(dt + lp["dt_b"])       # [B, Q, nh]
    dt = jnp.clip(dt, cfg.mamba_dt_min, cfg.mamba_dt_max)
    dt = jnp.where(valid[..., None], dt, 0.0)   # padding: a=1, b=0

    A = -jnp.exp(lp["A_log"].astype(f32))       # [nh]
    a = jnp.exp(dt * A[None, None])[..., None, None]   # [B, Q, nh, 1, 1]
    bx = (dt[..., None] * xs)[..., None] * Bm[:, :, :, None, :]
    # bx: [B, Q, nh, hd, ds]

    def comb(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    a_sc, b_sc = jax.lax.associative_scan(
        comb, (jnp.broadcast_to(a, bx.shape), bx), axis=1)
    h = a_sc * ssm_state[:, None] + b_sc        # [B, Q, nh, hd, ds]
    y = jnp.sum(h * Cm[:, :, :, None, :], axis=-1)     # [B, Q, nh, hd]
    y = y + lp["D"][None, None, :, None] * xs
    y = y.reshape(Bsz, Q, di)
    new_ssm = jnp.take_along_axis(
        h, last_idx[:, None, None, None, None]
        .repeat(nh, 2).repeat(hd, 3).repeat(ds, 4), axis=1)[:, 0]

    # gated RMSNorm before out_proj (HF MambaRMSNormGated)
    g = y * jax.nn.silu(gate)
    g = g * jax.lax.rsqrt(jnp.mean(g * g, -1, keepdims=True)
                          + cfg.rms_norm_eps)
    g = g * lp["norm_g"].astype(f32)
    out = jnp.dot(g.astype(jnp.bfloat16), lp["out_proj"],
                  preferred_element_type=f32)
    return out.astype(jnp.bfloat16), new_conv, new_ssm


def mamba2_forward(params, cfg: ModelConfig, token_ids: jnp.ndarray,
                   kv_pages: jnp.ndarray, page_ids: jnp.ndarray,
                   ctx_len: jnp.ndarray, positions: jnp.ndarray,
                   logits_indices: Optional[jnp.ndarray] = None,
                   return_hidden: bool = False):
    """Same contract as models/mamba.mamba_forward."""
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
        conv, ssm = read_state2(kv_pages, li, page_ids, cfg)
        h = rms(x, lp_i["norm"])
        y, conv, ssm = mamba2_mixer(lp_i, cfg, h, conv, ssm, valid, last_idx)
        kv_pages = write_state2(kv_pages, li, page_ids, conv, ssm, cfg)
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


def convert_mamba2(sd: dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """HF Mamba2ForCausalLM state dict -> our pytree."""
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
            "dt_b": jnp.asarray(a(m + "dt_bias"), jnp.float32),
            "A_log": jnp.asarray(a(m + "A_log"), jnp.float32),
            "D": jnp.asarray(a(m + "D"), jnp.float32),
            "norm_g": jnp.asarray(a(m + "norm.weight"), jnp.float32),
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
