"""Dual-scheme Llama for TPU: one packed-int4 param pytree, three forwards.

TPU-native reimplementation of the reference's QuaRot Llama
(/root/reference/vllm/model_executor/models/quarot_llama.py) and, with
``quant="none"``, of its standard Llama. The QSpec property — W4A4 draft and
W4A16 verify sharing the *same* weight buffers with "nearly cost-free"
switching (spec_decode_worker.py:795-812) — maps here to a static ``scheme``
argument: two jitted step functions closed over one param pytree. Switching
schemes is literally calling the other compiled executable on the same
buffers; nothing is copied.

Structure per layer (quarot checkpoints; reference quarot_llama.py:319-433):

    x ─ rmsnorm[+int4 quant] ─ qkv(w4) ─ rope ─ paged KV write ─ attention
      ─ head-Hadamard(H_heads) ─ [quant] ─ o(w4) ─ +residual
      ─ rmsnorm[+quant] ─ gate_up(w4) ─ silu*up ─ Hadamard(H_I) ─ [quant]
      ─ down(w4) ─ +residual

Norms are weightless for quant="w4" (gammas folded offline, see
rmsnorm_quant.py); standard models use gamma norms and skip the Hadamards.

All functions take *local* (per-shard) params and activations and are meant
to run either directly (single chip) or inside ``shard_map`` with
``axis_name`` set, in which case the row-parallel projections psum and the
Hadamard mixes run on gathered activations (see parallel/tp.py for the
sharding rules).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import ModelConfig
from qspec_tpu.ops import kv_cache as kvc
from qspec_tpu.ops.attention import paged_attention
from qspec_tpu.ops.hadamard import hadamard_matrix
from qspec_tpu.ops.linear_kernels import (matmul_w4a4, matmul_w4a4_ref, matmul_w4a16,
                                          matmul_w4a16_ref, matmul_w8a16,
                                          matmul_w8a16_ref)
from qspec_tpu.ops.packing import quantize_weight_int4, quantize_weight_int8
from qspec_tpu.ops.quant import sym_quant_int4
from qspec_tpu.ops.rmsnorm_quant import rmsnorm, rmsnorm_quant
from qspec_tpu.ops.rotary import apply_rope, make_rope_cache
from qspec_tpu.ops._kernel_utils import backend_is_tpu

SCHEMES = ("w4a4", "w4a8", "w4a16", "bf16")
QUANT_ACT_SCHEMES = ("w4a4", "w4a8")  # draft schemes with quantized activations


class AttentionBatch(NamedTuple):
    """Static-shape attention metadata for one (B, Q) token block.

    The TPU analogue of the reference's AttentionMetadata
    (vllm/attention/backends/abstract.py:242): positions/slots are
    precomputed host-side by the scheduler, ctx_lens include the Q new
    tokens, and padded slots carry ctx_len 0 and slot 0 (the reserved null
    page).
    """

    positions: jnp.ndarray     # [B, Q] int32
    slot_mapping: jnp.ndarray  # [B, Q] int32 flat kv slots
    block_tables: jnp.ndarray  # [B, max_pages] int32
    ctx_lens: jnp.ndarray      # [B] int32, includes the Q new tokens
    # Qwen2-VL M-RoPE (reference qwen2_vl.py:66 uses_mrope): 3-channel
    # (temporal, height, width) ROPE positions [3, B, Q]; None = standard
    # rope at `positions`. Attention masking/slots always use `positions`.
    mrope: Optional[jnp.ndarray] = None


def _linear(x, w, scheme, xq=None, li=None):
    """Dispatch one projection by scheme. w: dict with keys per scheme.

    With ``li`` the weight leaves are layer-stacked [L, ...]: the Pallas
    kernels stream tiles of layer ``li`` straight from the stacked HBM array
    (scalar-prefetch index — see linear_kernels.py module docstring; a
    scan-sliced operand would copy the whole ~100 MB slab every layer)."""
    def _take(name):
        v = w[name]
        return v if li is None else v[li]

    def _fast_ok():
        # the Pallas GEMMs require K % 256 == 0 and a 128-multiple N tile
        # (Mosaic block constraints); all production dims qualify — tiny
        # test models fall back to the jnp reference path
        kdim = (x.shape[-1] if x is not None else xq.values.shape[-1])
        return backend_is_tpu() and kdim % 256 == 0

    if scheme == "bf16" or (scheme == "w4a16" and "qw" not in w
                            and "w8" not in w):
        # second case: rotated-but-unquantized params (algebra testing)
        if x is None:
            from qspec_tpu.ops.quant import sym_dequant
            x = sym_dequant(xq)
        out = jnp.dot(x, _take("w"), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    elif scheme == "w4a16" and "qo_g" in w:
        # grouped asymmetric int4 (AWQ/GPTQ ingestion, model_loader/grouped.py)
        from qspec_tpu.ops.linear_kernels import (matmul_w4a16_g,
                                                  matmul_w4a16_g_ref)
        if _fast_ok():
            out = matmul_w4a16_g(x, w["qw"], w["qs_g"], w["qo_g"],
                                 layer_idx=li)
        else:
            out = matmul_w4a16_g_ref(x, _take("qw"), _take("qs_g"),
                                     _take("qo_g"))
    elif scheme == "w4a16" and "w8" in w:
        # per-channel int8 weights (compressed-tensors int-quantized
        # ingestion, model_loader/ct.py)
        from qspec_tpu.ops.linear_kernels import (matmul_w8a16,
                                                  matmul_w8a16_g_ref)
        if _fast_ok():
            out = matmul_w8a16(x, w["w8"], w["s8"], layer_idx=li)
        else:
            out = matmul_w8a16_g_ref(x, _take("w8"), _take("s8"))
    elif scheme == "w4a16":
        if _fast_ok():
            out = matmul_w4a16(x, w["qw"], w["qs"], layer_idx=li)
        else:
            out = matmul_w4a16_ref(x, _take("qw"), _take("qs"))
    else:  # w4a4 / w4a8: int activations on the int8 MXU pipe
        if _fast_ok():
            out = matmul_w4a4(xq.values, xq.scales, w["qw"], w["qs"], layer_idx=li)
        else:
            out = matmul_w4a4_ref(xq.values, xq.scales, _take("qw"), _take("qs"))
    if "b" in w:
        out = out + _take("b").astype(out.dtype)[None, :]
    return out


def _mla_attention(xn, layers, li, cfg, cache, layer_idx, batch, rope_cache):
    """DeepSeek-V2 Multi-head Latent Attention, weight-absorbed decode form
    (reference vllm/model_executor/models/deepseek_v2.py DeepseekV2Attention
    + the paper's §2.1.2 absorption identity).

    The cache stores ONE latent row per position — [c_kv (kv_lora_rank),
    k_pe (qk_rope_head_dim)] padded to the kernel's 128-lane multiple — so
    paged attention runs as MQA over the latent: per head,

        score = (q_nope @ W_UK) . c_kv + q_pe . k_pe
        out   = (sum softmax * c_kv) @ W_UV

    W_UK folds into the query side and W_UV applies after attention, so
    the per-head K/V up-projections never materialize at decode and the
    KV cache is ~(r + dr) / (2 * Hkv * D) of an equivalent MHA's (on
    DeepSeek-V2: 576 vs 2*128*128 floats per token). bf16 serving only
    (QuaRot's rotation algebra does not extend to the latent
    factorization); yarn-mscale rope scaling is not applied (golden test
    pins the base-rope behaviour). Rope on the decoupled dims uses
    DeepSeek's interleaved pairing (HF permutes to half-split then
    rotates; equivalent to rope_style='gptj')."""
    T = xn.shape[0]
    B, Q = batch.positions.shape
    nh = cfg.num_heads
    dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    r = cfg.kv_lora_rank
    Dc = cfg.cache_head_dim

    from qspec_tpu.ops import kv_cache as kvc
    from qspec_tpu.ops.attention import paged_attention
    from qspec_tpu.ops.rotary import apply_rope

    if cfg.q_lora_rank:
        qa = _linear(xn, layers["mla_q_a"], "bf16", li=li)
        qa = rmsnorm(qa, layers["mla_q_norm"][li], eps=cfg.rms_norm_eps)
        q = _linear(qa, layers["mla_q_b"], "bf16", li=li)
    else:
        q = _linear(xn, layers["mla_q"], "bf16", li=li)
    q = q.reshape(T, nh, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]

    kv_a = _linear(xn, layers["mla_kv_a"], "bf16", li=li)      # [T, r+dr]
    c_kv, k_pe = kv_a[:, :r], kv_a[:, r:]
    c_kv = rmsnorm(c_kv.astype(jnp.bfloat16), layers["mla_kv_norm"][li],
                   eps=cfg.rms_norm_eps).astype(jnp.float32)

    pos = batch.positions.reshape(-1)
    q_pe, k_pe = apply_rope(q_pe, k_pe[:, None, :], pos, rope_cache,
                            style="gptj")

    # absorb W_UK into the query; keep f32 through the small einsums
    w_kb = layers["mla_kv_b"][li].astype(jnp.float32)  # [r, nh, dn+dv]
    q_abs = jnp.einsum("thd,rhd->thr", q_nope.astype(jnp.float32),
                       w_kb[..., :dn])                 # [T, nh, r]
    qk = jnp.concatenate(
        [q_abs, q_pe.astype(jnp.float32),
         jnp.zeros((T, nh, Dc - r - dr), jnp.float32)], axis=-1)
    k_row = jnp.concatenate(
        [c_kv, k_pe[:, 0].astype(jnp.float32),
         jnp.zeros((T, Dc - r - dr), jnp.float32)], axis=-1)
    v_row = jnp.concatenate(
        [c_kv, jnp.zeros((T, Dc - r), jnp.float32)], axis=-1)

    cache = kvc.update_layer(cache, layer_idx,
                             k_row[:, None, :].astype(jnp.bfloat16),
                             v_row[:, None, :].astype(jnp.bfloat16),
                             batch.slot_mapping.reshape(-1))
    scale = (dn + dr) ** -0.5
    attn = paged_attention(qk.reshape(B, Q, nh, Dc).astype(jnp.bfloat16),
                           cache, layer_idx, batch.block_tables,
                           batch.ctx_lens, scale,
                           q_positions=batch.positions)
    lat = attn.reshape(T, nh, Dc)[..., :r]
    out = jnp.einsum("thr,rhd->thd", lat.astype(jnp.float32), w_kb[..., dn:])
    o = _linear(out.reshape(T, nh * dv).astype(jnp.bfloat16),
                layers["o"], "bf16", li=li)
    return o, cache


def layernorm(x, gamma, beta, eps):
    """Mean-subtracting LayerNorm with optional bias (OPT/GPT-2/Starcoder2
    pre-RMSNorm families; reference models/opt.py et al. use nn.LayerNorm).
    XLA fuses this chain; no Pallas needed at bf16."""
    x32 = x.astype(jnp.float32)
    xc = x32 - jnp.mean(x32, axis=-1, keepdims=True)
    n = xc * jax.lax.rsqrt(jnp.mean(xc * xc, axis=-1, keepdims=True) + eps)
    out = n * gamma.astype(jnp.float32)
    if beta is not None:
        out = out + beta.astype(jnp.float32)
    return out.astype(jnp.bfloat16)


def _norm_maybe_quant(x, gamma, eps, scheme, beta=None, norm_type="rmsnorm"):
    """Returns (normed bf16 or None, quantized or None)."""
    if norm_type == "layernorm":
        # LayerNorm families serve bf16/w4g only (no QuaRot folding), so
        # the fused norm->quant path never applies
        assert scheme not in QUANT_ACT_SCHEMES
        return layernorm(x, gamma, beta, eps), None
    if scheme in QUANT_ACT_SCHEMES:
        bits = 4 if scheme == "w4a4" else 8
        if gamma is None:
            return None, rmsnorm_quant(x, eps=eps, bits=bits)
        from qspec_tpu.ops.rmsnorm_quant import rmsnorm_quant_ref
        return None, rmsnorm_quant_ref(x, gamma, eps=eps, bits=bits)
    return rmsnorm(x, gamma, eps=eps), None


def _act_quant(x, scheme):
    """Per-token activation quant matching the scheme's bit width
    (reference Quantizer: quarot fuse_sym_quant / _i8)."""
    from qspec_tpu.ops.quant import sym_quant_int8
    return sym_quant_int4(x) if scheme == "w4a4" else sym_quant_int8(x)


def _qk_full_norm(v, gamma, eps, axis_name, width_global):
    """Full-projection-width RMSNorm on q or k (OLMo2). v [T, h_l, d];
    gamma [width_global] replicated; under TP the sum of squares psums
    across shards and each shard applies its gamma slice."""
    T = v.shape[0]
    flat = v.reshape(T, -1).astype(jnp.float32)
    ss = jnp.sum(flat * flat, axis=-1, keepdims=True)
    if axis_name is not None:
        ss = jax.lax.psum(ss, axis_name)
    n = flat * jax.lax.rsqrt(ss / width_global + eps)
    g = gamma.astype(jnp.float32)
    if axis_name is not None and g.shape[0] != flat.shape[1]:
        idx = jax.lax.axis_index(axis_name)
        g = jax.lax.dynamic_slice_in_dim(g, idx * flat.shape[1],
                                         flat.shape[1], 0)
    return (n * g).reshape(v.shape).astype(v.dtype)


def _plain_act(x, hidden_act: str):
    """Non-gated MLP activation (OPT relu, GPT-2 gelu_new, Starcoder2 /
    Falcon gelu)."""
    x32 = x.astype(jnp.float32)
    if hidden_act == "relu":
        a = jax.nn.relu(x32)
    elif hidden_act == "gelu":
        a = jax.nn.gelu(x32, approximate=False)
    elif hidden_act in ("gelu_tanh", "gelu_new"):
        a = jax.nn.gelu(x32, approximate=True)
    elif hidden_act == "relu2":
        # squared ReLU (Nemotron, reference models/nemotron.py ReLUSquared)
        a = jnp.square(jax.nn.relu(x32))
    else:
        a = jax.nn.silu(x32)
    return a.astype(jnp.bfloat16)


def _glu_act(gate, up, hidden_act: str):
    """Gated-MLP activation: silu (llama family) or tanh-approx gelu
    (gemma's GeGLU, reference GemmaMLP / hf gelu_pytorch_tanh)."""
    g32 = gate.astype(jnp.float32)
    a = (jax.nn.silu(g32) if hidden_act == "silu"
         else jax.nn.gelu(g32, approximate=True))
    return (a * up.astype(jnp.float32)).astype(jnp.bfloat16)


def _head_hadamard(attn, h_heads):
    """Mix across the head axis: reference applies H_{num_heads}/sqrt(nh) to
    [.., heads] slices (quarot_llama.py:230-233, hadamard_dim=num_heads)."""
    nh = attn.shape[1]
    out = jnp.einsum("jh,thd->tjd", h_heads, attn.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return (out * (1.0 / math.sqrt(nh))).astype(attn.dtype)


def _mlp_hadamard(x, hK, hP):
    """H_K (x) H_P over the intermediate dim (see ops/hadamard.py)."""
    n = x.shape[-1]
    K = hK.shape[0]
    P = n // K
    xf = x.astype(jnp.float32).reshape(x.shape[0], K, P)
    xf = jnp.einsum("tkp,pq->tkq", xf, hP, preferred_element_type=jnp.float32)
    if K > 1:
        xf = jnp.einsum("jk,tkp->tjp", hK, xf, preferred_element_type=jnp.float32)
    return (xf.reshape(x.shape) * (1.0 / math.sqrt(n))).astype(x.dtype)


def _moe_block(xn, xq, layers, li, cfg: ModelConfig, scheme, hadamards,
               axis_name):
    """Mixtral-style sparse-MoE MLP (reference MixtralForCausalLM +
    fused_moe triton kernels, vllm/model_executor/layers/fused_moe/).

    TPU shape of the computation: a lax.scan over the (local) experts —
    every expert's stacked weights stream from HBM exactly once per step
    (the bandwidth floor at decode, where nearly every expert has >= 1
    routed token), computing all T tokens and masking by the router's
    combine weight. No gather/scatter bookkeeping, static shapes, and the
    same Pallas stacked-weight kernels as the dense path (expert index
    rides the scalar-prefetched leading dim, flattened to [L*E_local, ...]).

    Expert parallelism under a mesh: the expert dim is sharded
    (param_pspecs), each shard runs its local experts over ALL tokens with
    the combine matrix sliced to its stripe, and one psum joins the dense
    row-parallel projections' reduction — no all_to_all needed because
    activations are replicated under TP.

    Returns the residual delta [T, H] (f32)."""
    quarot = cfg.quant == "w4"
    E, k = cfg.num_experts, cfg.num_experts_per_tok

    def _fp(xn, xq):
        if xn is not None:
            return xn
        from qspec_tpu.ops.quant import sym_dequant
        return sym_dequant(xq)

    x_fp = _fp(xn, xq)
    T = x_fp.shape[0]
    # router on the float hidden (reference gate: nn.Linear on hidden_states)
    logits = jnp.dot(x_fp, layers["router"][li].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)      # [T, E]
    if cfg.moe_routing == "sparsemixer":
        # Phi-3.5-MoE sparsemixer (reference models/phimoe.py:163-215,
        # inference path): per pick, experts within a 2*eps relative band
        # of the max survive a mask, the weight is the survivor-softmax
        # prob at the argmax; the second pick repeats with the first
        # expert's score removed. Exactly two picks.
        assert k == 2, "sparsemixer routing is top-2"
        eps = 0.01
        i1 = jnp.argmax(logits, axis=-1)                       # [T]
        mx1 = jnp.max(logits, axis=-1, keepdims=True)
        factor1 = jnp.maximum(jnp.abs(logits), mx1)
        m1 = ((mx1 - logits) / factor1) > (2 * eps)
        g1 = jax.nn.softmax(jnp.where(m1, -jnp.inf, logits), axis=-1)
        w1 = jnp.take_along_axis(g1, i1[:, None], axis=-1)     # [T, 1]
        masked = logits.at[jnp.arange(T), i1].set(-jnp.inf)
        i2 = jnp.argmax(masked, axis=-1)
        mx2 = jnp.max(masked, axis=-1, keepdims=True)
        factor2 = jnp.maximum(jnp.abs(logits), mx2)
        m2 = ((mx2 - logits) / factor2) > (2 * eps)
        g2 = jax.nn.softmax(jnp.where(m2, -jnp.inf, masked), axis=-1)
        w2 = jnp.take_along_axis(g2, i2[:, None], axis=-1)
        w = jnp.concatenate([w1, w2], axis=-1)                 # [T, 2]
        topi = jnp.stack([i1, i2], axis=-1)
    elif cfg.moe_routing == "noaux_tc":
        # DeepSeek-V3 (reference deepseek_v2.py V3 path + HF
        # DeepseekV3TopkRouter): sigmoid scores + per-expert bias for
        # SELECTION only; groups ranked by their top-2 biased scores,
        # top-k chosen inside the surviving groups; combine weights are
        # the UNBIASED sigmoid scores renormalized
        scores = jax.nn.sigmoid(logits)
        biased = scores + layers["router_bias"][li][None].astype(jnp.float32)
        n_group = cfg.moe_n_group
        gsz = E // n_group
        bg = biased.reshape(T, n_group, gsz)
        g_rank = jnp.sum(jax.lax.top_k(bg, 2)[0], axis=-1)     # [T, G]
        _, gi = jax.lax.top_k(g_rank, cfg.moe_topk_group)
        gmask = jnp.zeros((T, n_group), bool).at[
            jnp.arange(T)[:, None], gi].set(True)
        allowed = jnp.repeat(gmask, gsz, axis=-1)
        sel = jnp.where(allowed, biased, -jnp.inf)
        _, topi = jax.lax.top_k(sel, k)
        w = jnp.take_along_axis(scores, topi, axis=-1)
        if cfg.moe_norm_topk_prob:
            w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-20)
        # routed_scaling_factor applies once, on the routed delta below
    elif cfg.moe_softmax_before_topk:
        # qwen2-moe: softmax over ALL experts, then top-k (+ optional
        # renormalization, reference Qwen2MoeSparseMoeBlock)
        probs = jax.nn.softmax(logits, axis=-1)
        w, topi = jax.lax.top_k(probs, k)                      # [T, k]
        if cfg.moe_norm_topk_prob:
            w = w / jnp.sum(w, axis=-1, keepdims=True)
    else:
        # mixtral: top-k first, softmax over the k winners
        topv, topi = jax.lax.top_k(logits, k)
        w = jax.nn.softmax(topv, axis=-1)                      # [T, k]
    combine = jnp.zeros((T, E), jnp.float32)
    combine = combine.at[jnp.arange(T)[:, None], topi].add(w)

    ntp = 1 if axis_name is None else jax.lax.axis_size(axis_name)
    E_local = E // ntp
    if ntp > 1:
        shift = jax.lax.axis_index(axis_name) * E_local
        combine = jax.lax.dynamic_slice_in_dim(combine, shift, E_local, 1)

    # [L, E_local, ...] -> [L*E_local, ...] so the stacked-weight kernels
    # index (layer, expert) through one scalar-prefetched leading dim
    gu_w = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]),
                        layers["experts_gate_up"])
    dn_w = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]),
                        layers["experts_down"])

    def _expert_mlp(gu_w_, dn_w_, idx, hK, hP):
        gu = _linear(xn, gu_w_, scheme, xq, li=idx)            # [T, 2I]
        i_sz = gu.shape[-1] // 2
        gate, up = gu[:, :i_sz], gu[:, i_sz:]
        act = _glu_act(gate, up, cfg.hidden_act)
        if quarot:
            act = _mlp_hadamard(act, hK, hP)
            if scheme in QUANT_ACT_SCHEMES:
                return _linear(None, dn_w_, scheme, _act_quant(act, scheme),
                               li=idx)
            return _linear(act, dn_w_, scheme, li=idx)
        return _linear(act, dn_w_, scheme, li=idx)

    def body(acc, e):
        idx = li * E_local + e
        d = _expert_mlp(gu_w, dn_w, idx,
                        hadamards["mlp_K"] if quarot else None,
                        hadamards["mlp_P"] if quarot else None)
        return acc + d.astype(jnp.float32) * combine[:, e][:, None], None

    delta, _ = jax.lax.scan(body, jnp.zeros((T, cfg.hidden_size), jnp.float32),
                            jnp.arange(E_local, dtype=jnp.int32))
    if cfg.routed_scaling_factor != 1.0:
        # deepseek-v2 scales the ROUTED output only; the shared expert
        # adds unscaled (reference deepseek_v2.py routed_scaling_factor)
        delta = delta * cfg.routed_scaling_factor

    if cfg.shared_expert_intermediate_size:
        # qwen2-moe always-on shared expert, output gated by
        # sigmoid(x @ w_gate) (reference Qwen2MoeSparseMoeBlock). Its
        # weights are REPLICATED under a mesh (it is ~one expert's worth of
        # compute); divide by the shard count so the single psum that joins
        # the expert partials nets exactly one contribution.
        se = _expert_mlp(layers["shared_gate_up"], layers["shared_down"], li,
                         hadamards["shared_K"] if quarot else None,
                         hadamards["shared_P"] if quarot else None)
        if cfg.shared_expert_gated:
            sgate = jax.nn.sigmoid(jnp.dot(
                x_fp, layers["shared_gate"][li].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32))           # [T, 1]
            delta = delta + sgate * se.astype(jnp.float32) / ntp
        else:
            # deepseek shared experts add their output directly (reference
            # deepseek.py DeepseekMoE: no gate on shared_experts)
            delta = delta + se.astype(jnp.float32) / ntp
    return delta


def decoder_layer(x, layers, cache, layer_idx, cfg: ModelConfig, batch: AttentionBatch,
                  rope_cache, hadamards, scheme: str, axis_name: Optional[str] = None,
                  lora=None, lora_ids=None, weight_idx=None, tree=None):
    """One decoder layer. x: [T, hidden] bf16 (replicated across the model
    axis); ``layers`` is the layer-STACKED param dict (leaves [L, ...]) and
    ``layer_idx`` selects both the weight layer (in-kernel, no slab copy)
    and the KV-cache layer.

    Returns (x_out, cache).
    """
    B, Q = batch.positions.shape
    T = B * Q
    # weight_idx: index into THIS stacked tree when it is a segment of the
    # model (deepseek's dense-prefix/moe-rest split scans); layer_idx stays
    # the GLOBAL layer for the KV cache and sliding-window alternation
    li = layer_idx if weight_idx is None else weight_idx
    quarot = cfg.quant == "w4"
    gamma_in = (None if quarot or not cfg.pre_norms
                else layers["input_norm"][li])
    # falcon/phi/gptj/cohere parallel blocks have no post-attention norm at
    # all; GPT-NeoX parallel blocks (parallel_norms=2) keep one as the
    # MLP's own input norm over the SAME residual input
    gamma_post = (None if quarot or not cfg.pre_norms
                  or (cfg.parallel_block and cfg.parallel_norms == 1)
                  else layers["post_norm"][li])
    beta_in = (layers["input_norm_b"][li]
               if "input_norm_b" in layers else None)
    beta_post = (layers["post_norm_b"][li]
                 if "post_norm_b" in layers else None)

    def _maybe_lora(name, x_fp, out):
        """Add the per-token LoRA delta (see qspec_tpu/lora/layers.py).

        TP design: the adapters stay REPLICATED (they are MBs; sharding them
        would trade negligible HBM for extra collectives — reference punica
        shards because GPU kernels demand it, an MXU matmul does not), but
        the delta math must match the projection's sharding:
        - column-parallel (qkv / gate_up): full delta computed everywhere,
          then this shard's column blocks are sliced out to mirror
          pack_proj_weight's per-shard (q|k|v) / (gate|up) layout;
        - row-parallel (o / down): A's rows (and a full gathered input) are
          sliced to this shard's input stripe so the partial delta joins the
          SAME psum as the base projection (adding the full delta would
          count it ntp times)."""
        if lora is None:
            return out
        from qspec_tpu.lora.layers import lora_delta
        A, Bm = lora[name]["A"], lora[name]["B"]
        if axis_name is None or ntp == 1:
            d = lora_delta(x_fp, A, Bm, lora_ids)
            return out + d.astype(out.dtype)
        idx = jax.lax.axis_index(axis_name)
        if name in ("o", "down"):
            in_full = A.shape[1]
            in_l = in_full // ntp
            x_loc = (jax.lax.dynamic_slice_in_dim(x_fp, idx * in_l, in_l, 1)
                     if x_fp.shape[-1] == in_full else x_fp)
            A_loc = jax.lax.dynamic_slice_in_dim(A, idx * in_l, in_l, 1)
            d = lora_delta(x_loc, A_loc, Bm, lora_ids)
            return out + d.astype(out.dtype)
        # column-parallel: slice each global block's shard stripe
        d = lora_delta(x_fp, A, Bm, lora_ids)
        blocks = ((cfg.q_size, cfg.kv_size, cfg.kv_size) if name == "qkv"
                  else (cfg.intermediate_size, cfg.intermediate_size))
        parts, off = [], 0
        for blk in blocks:
            blk_l = blk // ntp
            parts.append(jax.lax.dynamic_slice_in_dim(
                d, off + idx * blk_l, blk_l, 1))
            off += blk
        d = jnp.concatenate(parts, axis=-1)
        return out + d.astype(out.dtype)

    def _fp_input(xn, xq):
        if xn is not None:
            return xn
        from qspec_tpu.ops.quant import sym_dequant
        return sym_dequant(xq)

    rope_local = None
    if isinstance(rope_cache, tuple):
        # gemma3 dual rope: (global theta cache, local theta cache)
        rope_cache, rope_local = rope_cache
    ntp = 1 if axis_name is None else jax.lax.axis_size(axis_name)
    heads_l = cfg.num_heads // ntp
    kv_heads_l = cfg.num_kv_heads // ntp
    q_size_l = heads_l * cfg.head_dim
    kv_size_l = kv_heads_l * cfg.head_dim

    # gemma2: per-layer sliding/global alternation (traced window riding
    # the layer scan), score softcap, query_pre_attn_scalar scale
    window = cfg.sliding_window
    if window is not None and cfg.sliding_window_pattern > 1:
        from qspec_tpu.ops.attention_pallas import NO_WINDOW
        if cfg.sliding_global_every:
            # gemma3: every pattern-th layer is GLOBAL, the rest sliding
            window = jnp.where(
                (layer_idx + 1) % cfg.sliding_window_pattern == 0,
                NO_WINDOW, window)
        else:
            window = jnp.where(layer_idx % cfg.sliding_window_pattern == 0,
                               window, NO_WINDOW)

    # ALiBi position-encoding class (BLOOM/MPT/JAIS/Baichuan-13B/Falcon-rw;
    # reference bloom.py:49): per-head slopes bias the attention scores, no
    # rope is applied. Under TP each shard passes its heads' slope slice.
    alibi = None
    if cfg.position_embedding == "alibi":
        from qspec_tpu.ops.attention import alibi_slopes
        sl = jnp.asarray(alibi_slopes(cfg.num_heads))
        if axis_name is not None and ntp > 1:
            sl = jax.lax.dynamic_slice_in_dim(
                sl, jax.lax.axis_index(axis_name) * heads_l, heads_l, 0)
        alibi = sl

    # --- attention block ---
    if cfg.pre_norms:
        xn, xq = _norm_maybe_quant(x, gamma_in, cfg.rms_norm_eps, scheme,
                                   beta=beta_in, norm_type=cfg.norm_type)
    else:
        # OLMo2 norm-after-block: the block reads the raw residual stream
        assert scheme not in QUANT_ACT_SCHEMES
        xn, xq = x.astype(jnp.bfloat16), None
    if cfg.attention_type == "mla":
        # DeepSeek-V2 latent attention (bf16 path; see _mla_attention)
        o, cache = _mla_attention(xn, layers, li, cfg, cache, layer_idx,
                                  batch, rope_cache)
    else:
        qkv = _linear(xn, layers["qkv"], scheme, xq, li)  # [T, (q+2kv) local]
        if lora is not None:
            qkv = _maybe_lora("qkv", _fp_input(xn, xq), qkv)
        if cfg.clip_qkv is not None:
            # OLMo clamps qkv activations (reference olmo.py clip_qkv)
            qkv = jnp.clip(qkv, -cfg.clip_qkv, cfg.clip_qkv)
        q, k, v = jnp.split(qkv, [q_size_l, q_size_l + kv_size_l], axis=-1)
        q = q.reshape(T, heads_l, cfg.head_dim)
        k = k.reshape(T, kv_heads_l, cfg.head_dim)
        v = v.reshape(T, kv_heads_l, cfg.head_dim).astype(jnp.bfloat16)
        if cfg.qk_norm:
            if cfg.qk_norm_style == "head_ln":
                # persimmon/phi-2-family qk_layernorm: per-head LayerNorm
                # with affine+bias over head_dim (reference persimmon.py)
                def _hln(v, g, b):
                    v32 = v.astype(jnp.float32)
                    mu = jnp.mean(v32, -1, keepdims=True)
                    var = jnp.mean(jnp.square(v32 - mu), -1, keepdims=True)
                    return ((v32 - mu) * jax.lax.rsqrt(
                        var + cfg.rms_norm_eps) * g + b).astype(v.dtype)
                q = _hln(q, layers["q_norm"][li], layers["q_norm_b"][li])
                k = _hln(k, layers["k_norm"][li], layers["k_norm_b"][li])
            elif cfg.qk_norm_style == "full":
                # OLMo2: RMSNorm over the WHOLE projection width; under TP
                # the mean spans shards (psum) and each shard applies its
                # slice of the replicated full-width gamma
                q = _qk_full_norm(q, layers["q_norm"][li], cfg.rms_norm_eps,
                                  axis_name, cfg.q_size)
                k = _qk_full_norm(k, layers["k_norm"][li], cfg.rms_norm_eps,
                                  axis_name, cfg.kv_size)
            else:
                # qwen3: per-head RMSNorm on q/k before rope (HF
                # Qwen3Attention); the [head_dim] gammas live after the
                # projection, so they stay live weights even under QuaRot
                # gamma folding
                from qspec_tpu.ops.rmsnorm_quant import rmsnorm_ref
                q = rmsnorm_ref(q, layers["q_norm"][li],
                                eps=cfg.rms_norm_eps)
                k = rmsnorm_ref(k, layers["k_norm"][li],
                                eps=cfg.rms_norm_eps)
        if cfg.position_embedding == "rope":
            if batch.mrope is not None and cfg.mrope_section is not None:
                from qspec_tpu.ops.rotary import apply_rope_mrope
                qr, kr = apply_rope_mrope(
                    q, k, batch.mrope.reshape(3, -1), rope_cache,
                    cfg.mrope_section)
            else:
                qr, kr = apply_rope(q, k, batch.positions.reshape(-1),
                                    rope_cache, style=cfg.rope_style)
            if cfg.rope_local_theta is not None:
                # gemma3 dual rope: sliding layers rotate with the LOCAL
                # theta cache; layer_idx is traced, so select
                ql, kl = apply_rope(q, k, batch.positions.reshape(-1),
                                    rope_local, style=cfg.rope_style)
                is_global = ((layer_idx + 1)
                             % cfg.sliding_window_pattern) == 0
                qr = jnp.where(is_global, qr, ql)
                kr = jnp.where(is_global, kr, kl)
            if cfg.nope_interval:
                # SmolLM3 NoPE layers: layer_idx is traced (layer scan),
                # so select between roped and raw projections
                use = ((layer_idx + 1) % cfg.nope_interval) != 0
                q = jnp.where(use, qr, q)
                k = jnp.where(use, kr, k)
            else:
                q, k = qr, kr
        q = q.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)

        cache = kvc.update_layer(cache, layer_idx, k, v, batch.slot_mapping.reshape(-1))
        scale = (cfg.query_pre_attn_scalar or cfg.head_dim) ** -0.5
        attn = paged_attention(q.reshape(B, Q, heads_l, cfg.head_dim), cache, layer_idx,
                               batch.block_tables, batch.ctx_lens, scale,
                               q_positions=batch.positions,
                               window=window, softcap=cfg.attn_logit_softcap,
                               alibi=alibi, tree=tree)
        attn = attn.reshape(T, heads_l, cfg.head_dim)

        if quarot:
            if axis_name is not None and ntp > 1:
                # H_heads mixes across ALL heads: gather them, rotate, then keep
                # the local slice this shard's o_proj rows consume.
                attn = jax.lax.all_gather(attn, axis_name, axis=1, tiled=True)
                attn = _head_hadamard(attn, hadamards["heads"])
                attn_flat = attn.reshape(T, cfg.num_heads * cfg.head_dim)
                if scheme in QUANT_ACT_SCHEMES:
                    aq = _act_quant(attn_flat, scheme)  # scale over the full row
                    idx = jax.lax.axis_index(axis_name)
                    vals = jax.lax.dynamic_slice_in_dim(aq.values, idx * q_size_l, q_size_l, 1)
                    aq = aq._replace(values=vals)
                    o = _linear(None, layers["o"], scheme, aq, li)
                else:
                    idx = jax.lax.axis_index(axis_name)
                    loc = jax.lax.dynamic_slice_in_dim(attn_flat, idx * q_size_l, q_size_l, 1)
                    o = _linear(loc, layers["o"], scheme, li=li)
            else:
                attn = _head_hadamard(attn, hadamards["heads"])
                attn_flat = attn.reshape(T, q_size_l)
                if scheme in QUANT_ACT_SCHEMES:
                    o = _linear(None, layers["o"], scheme, _act_quant(attn_flat, scheme), li)
                else:
                    o = _linear(attn_flat, layers["o"], scheme, li=li)
        else:
            attn_flat = attn.reshape(T, q_size_l)
            o = _linear(attn_flat, layers["o"], scheme, li=li)
        if lora is not None:
            # input to o_proj: the (hadamard-rotated, pre-quant) flat attention;
            # every branch above leaves it in attn_flat
            o = _maybe_lora("o", attn_flat, o)
    if axis_name is not None:
        o = jax.lax.psum(o, axis_name)
    if cfg.post_norms:
        # gemma2 post-attention norm: applied to the block OUTPUT before
        # the residual add (reference Gemma2DecoderLayer)
        o = rmsnorm(o.astype(jnp.bfloat16), layers["post_attn_norm"][li],
                    eps=cfg.rms_norm_eps)
    if cfg.residual_multiplier != 1.0:
        # granite scales every block output before the residual add
        # (reference granite.py GraniteDecoderLayer residual_multiplier)
        o = o * cfg.residual_multiplier

    # --- mlp block ---
    if cfg.parallel_block:
        # falcon/phi/gptj/cohere parallel layout (reference falcon.py
        # parallel_attn, phi.py, commandr.py): the MLP reads the SAME
        # normed input as attention; both residuals add at the block end.
        # GPT-NeoX (parallel_norms=2, use_parallel_residual) norms the
        # same residual input with its own post_attention norm.
        if cfg.parallel_norms == 2:
            xn, xq = _norm_maybe_quant(x, gamma_post, cfg.rms_norm_eps,
                                       scheme, beta=beta_post,
                                       norm_type=cfg.norm_type)
    else:
        x = x + o.astype(x.dtype)
        if cfg.pre_norms:
            xn, xq = _norm_maybe_quant(x, gamma_post, cfg.rms_norm_eps,
                                       scheme, beta=beta_post,
                                       norm_type=cfg.norm_type)
        else:
            xn, xq = x.astype(jnp.bfloat16), None
    if cfg.num_experts:
        delta = _moe_block(xn, xq, layers, li, cfg, scheme, hadamards,
                           axis_name)
        if axis_name is not None:
            delta = jax.lax.psum(delta, axis_name)
        if cfg.residual_multiplier != 1.0:
            delta = delta * cfg.residual_multiplier
        x = x + delta.astype(x.dtype)
        return x, cache
    gate_up = _linear(xn, layers["gate_up"], scheme, xq, li)  # [T, 2*I/ntp]
    if lora is not None:
        gate_up = _maybe_lora("gate_up", _fp_input(xn, xq), gate_up)
    if cfg.mlp_gated:
        i_local = gate_up.shape[-1] // 2
        gate, up = gate_up[:, :i_local], gate_up[:, i_local:]
        act = _glu_act(gate, up, cfg.hidden_act)
    else:
        # non-gated fc1 -> act -> fc2 (OPT/GPT-2/Starcoder2/Falcon;
        # "gate_up" holds fc1 [H, I])
        act = _plain_act(gate_up, cfg.hidden_act)

    if quarot:
        if axis_name is not None and ntp > 1:
            act = jax.lax.all_gather(act, axis_name, axis=1, tiled=True)
        act = _mlp_hadamard(act, hadamards["mlp_K"], hadamards["mlp_P"])
        if axis_name is not None and ntp > 1:
            idx = jax.lax.axis_index(axis_name)
            if scheme in QUANT_ACT_SCHEMES:
                aq = _act_quant(act, scheme)
                vals = jax.lax.dynamic_slice_in_dim(aq.values, idx * i_local, i_local, 1)
                down = _linear(None, layers["down"], scheme, aq._replace(values=vals), li)
            else:
                loc = jax.lax.dynamic_slice_in_dim(act, idx * i_local, i_local, 1)
                down = _linear(loc, layers["down"], scheme, li=li)
        else:
            if scheme in QUANT_ACT_SCHEMES:
                down = _linear(None, layers["down"], scheme, _act_quant(act, scheme), li)
            else:
                down = _linear(act, layers["down"], scheme, li=li)
    else:
        down = _linear(act, layers["down"], scheme, li=li)
    if lora is not None:
        down = _maybe_lora("down", act, down)
    if axis_name is not None:
        down = jax.lax.psum(down, axis_name)
    if cfg.post_norms:
        down = rmsnorm(down.astype(jnp.bfloat16),
                       layers["post_ffw_norm"][li], eps=cfg.rms_norm_eps)
    if cfg.residual_multiplier != 1.0:
        down = down * cfg.residual_multiplier
    if cfg.parallel_block:
        x = x + o.astype(x.dtype) + down.astype(x.dtype)
    else:
        x = x + down.astype(x.dtype)
    return x, cache


def model_forward(params, cfg: ModelConfig, token_ids: jnp.ndarray,
                  cache: kvc.PagedKVCache, batch: AttentionBatch, *,
                  scheme: str = "w4a16", axis_name: Optional[str] = None,
                  logits_indices: Optional[jnp.ndarray] = None,
                  lora_ids: Optional[jnp.ndarray] = None,
                  return_hidden: bool = False,
                  input_embeds: Optional[jnp.ndarray] = None,
                  embeds_rows: Optional[jnp.ndarray] = None,
                  tree=None):
    """Full forward. token_ids: [B, Q] -> (logits [B, Q, V], new cache).

    Mirrors the reference call path LlamaModel.forward -> compute_logits
    (quarot_llama.py:436-619) as a single jittable function.

    ``logits_indices`` [B]: compute logits only at one query index per row
    (prefill only needs the final prompt position — skipping the [B*Q, V]
    projection saves a quarter-GB intermediate and the lm_head FLOPs).
    Output is then [B, 1, V].

    ``return_hidden``: also return the post-final-norm hidden states
    (last-token pooling for embedding tasks, reference
    vllm/model_executor/layers/pooler.py LAST pooling; note QuaRot
    checkpoints keep the residual stream in the rotated basis — dot/cosine
    similarities are invariant under the orthonormal rotation).
    """
    if cfg.arch == "jamba":
        # hybrid attention+mamba+MoE stack (models/jamba.py): attention
        # planes of the shared cache hold token pages, mamba planes hold
        # state-in-page rows
        from qspec_tpu.models import jamba as _jamba
        assert input_embeds is None and lora_ids is None
        return _jamba.jamba_forward(params, cfg, token_ids, cache, batch,
                                    logits_indices=logits_indices,
                                    return_hidden=return_hidden)
    if cfg.arch == "mamba2":
        from qspec_tpu.models import mamba2 as _mamba2
        assert input_embeds is None and lora_ids is None
        out = _mamba2.mamba2_forward(
            params, cfg, token_ids, cache.kv_pages,
            batch.block_tables[:, 0], batch.ctx_lens, batch.positions,
            logits_indices=logits_indices, return_hidden=return_hidden)
        if return_hidden:
            logits, hidden, pages = out
            return logits, hidden, cache._replace(kv_pages=pages)
        logits, pages = out
        return logits, cache._replace(kv_pages=pages)
    if cfg.arch == "mamba":
        # selective-SSM family: no attention, recurrent state lives in
        # each sequence's first cache page (models/mamba.py). The step
        # functions and engine flow are unchanged — only the forward
        # swaps; spec decode / LoRA / prompt-embeds are attention-family
        # features and are rejected at engine build.
        from qspec_tpu.models import mamba as _mamba
        assert input_embeds is None and lora_ids is None
        out = _mamba.mamba_forward(
            params, cfg, token_ids, cache.kv_pages,
            batch.block_tables[:, 0], batch.ctx_lens, batch.positions,
            logits_indices=logits_indices, return_hidden=return_hidden)
        if return_hidden:
            logits, hidden, pages = out
            return logits, hidden, cache._replace(kv_pages=pages)
        logits, pages = out
        return logits, cache._replace(kv_pages=pages)
    assert scheme in SCHEMES
    if scheme != "bf16" and cfg.quant not in ("w4", "w4g", "w8"):
        raise ValueError("quantized scheme on an unquantized checkpoint")
    if scheme in QUANT_ACT_SCHEMES and cfg.quant in ("w4g", "w8"):
        # grouped AWQ/GPTQ / int8 weights carry no QuaRot rotations:
        # quantized activations would be outlier-dominated; only W4A16
        # (weight-only dequant) serves them
        raise ValueError("w4a4/w4a8 drafting requires a QuaRot (quant='w4') "
                         "checkpoint; AWQ/GPTQ/compressed-tensors models are "
                         "weight-only-quant")
    B, Q = token_ids.shape
    x = params["embed"][token_ids.reshape(-1)].astype(jnp.bfloat16)
    if cfg.embed_scale is not None:
        # gemma scales embeddings by sqrt(hidden) in the hidden dtype
        # (reference GemmaModel.forward normalizer)
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    if input_embeds is not None:
        # pre-computed prompt embeddings (reference inputs_embeds /
        # multimodal path): tokens flagged in ``embeds_rows`` [B, Q] take
        # their vectors from ``input_embeds`` [B, Q, H] instead of the
        # embed table (per-token mask: a resumed sequence's chunk can mix
        # embeds-fed prompt positions with regenerated output tokens)
        ie = input_embeds.reshape(B * Q, -1).astype(jnp.bfloat16)
        if embeds_rows is not None:
            keep = embeds_rows.reshape(B * Q)[:, None]
            x = jnp.where(keep, ie, x)
        else:
            x = ie
    if cfg.position_embedding in ("learned", "learned_opt"):
        # trained position table (GPT-2/Starcoder2 wpe; OPT keeps a legacy
        # +2 offset, reference opt.py OPTLearnedPositionalEmbedding)
        pos = batch.positions.reshape(-1)
        if cfg.position_embedding == "learned_opt":
            pos = pos + 2
        x = x + params["pos_embed"][pos].astype(x.dtype)
    if "embed_norm" in params:
        # BLOOM word_embeddings_layernorm (reference bloom.py BloomModel):
        # a LayerNorm applied to the embedding output before layer 0
        x = layernorm(x, params["embed_norm"], params["embed_norm_b"],
                      cfg.rms_norm_eps)

    rope_cache = params["rope_cache"]
    if "rope_cache_local" in params:
        rope_cache = (rope_cache, params["rope_cache_local"])
    hadamards = params.get("hadamards")

    # the cache rides the scan CARRY (aliased in place); xs carrying the
    # cache made XLA double-buffer the whole thing every layer. The stacked
    # weights are NOT scanned as xs either — the kernels index the stacked
    # HBM arrays by layer (scan-sliced operands cost a ~100 MB copy per
    # layer, measured 671 -> 411 GB/s; see linear_kernels.py).
    use_lora = lora_ids is not None and "lora" in params
    tok_lora = (jnp.repeat(lora_ids, Q) if use_lora else None)
    L = cache.num_layers
    layer_ids = jnp.arange(L, dtype=jnp.int32)
    layers = params["layers"]

    if use_lora:
        def body(carry, xs):
            x, cache = carry
            lora_layer, li = xs
            x, cache = decoder_layer(x, layers, cache, li, cfg,
                                     batch, rope_cache, hadamards, scheme,
                                     axis_name, lora=lora_layer,
                                     lora_ids=tok_lora)
            return (x, cache), None

        (x, cache), _ = jax.lax.scan(
            body, (x, cache), (params["lora"]["layers"], layer_ids))
    elif cfg.num_experts and cfg.first_k_dense:
        # deepseek: the first k layers are DENSE (first_k_dense_replace,
        # reference deepseek.py) — two scan segments over two stacked trees
        # keeps every stack uniform with zero padding weights; the KV cache
        # still indexes by the GLOBAL layer id
        import dataclasses as _dc
        dense_cfg = _dc.replace(cfg, num_experts=0)
        kd = cfg.first_k_dense

        def body_dense(carry, li):
            x, cache = carry
            x, cache = decoder_layer(x, params["layers_dense"], cache, li,
                                     dense_cfg, batch, rope_cache, hadamards,
                                     scheme, axis_name)
            return (x, cache), None

        (x, cache), _ = jax.lax.scan(body_dense, (x, cache), layer_ids[:kd])

        def body_moe(carry, xs):
            x, cache = carry
            li, wi = xs
            x, cache = decoder_layer(x, layers, cache, li, cfg, batch,
                                     rope_cache, hadamards, scheme,
                                     axis_name, weight_idx=wi)
            return (x, cache), None

        (x, cache), _ = jax.lax.scan(
            body_moe, (x, cache),
            (layer_ids[kd:], jnp.arange(L - kd, dtype=jnp.int32)))
    else:
        def body(carry, li):
            x, cache = carry
            x, cache = decoder_layer(x, layers, cache, li, cfg, batch,
                                     rope_cache, hadamards, scheme, axis_name,
                                     tree=tree)
            return (x, cache), None

        (x, cache), _ = jax.lax.scan(body, (x, cache), layer_ids)

    def _final_norm(h):
        if cfg.quant == "w4":
            return rmsnorm(h, None, eps=cfg.rms_norm_eps)
        if cfg.norm_type == "layernorm":
            return layernorm(h, params["final_norm"],
                             params.get("final_norm_b"), cfg.rms_norm_eps)
        return rmsnorm(h, params["final_norm"], eps=cfg.rms_norm_eps)

    hidden_full = None
    if return_hidden == "all":
        # post-final-norm hidden at EVERY position (eagle prefill needs the
        # whole span) while logits still honour logits_indices
        hidden_full = _final_norm(x).reshape(B, Q, -1)

    if logits_indices is not None:
        flat = logits_indices + jnp.arange(B) * Q
        x = x[flat]
        Q = 1

    x = _final_norm(x)
    logits = compute_logits(x, params["lm_head"])
    if cfg.final_logit_softcap:
        # gemma2 final-logit softcapping (reference gemma2.py
        # final_logit_softcapping via LogitsProcessor soft_cap)
        cap = cfg.final_logit_softcap
        logits = jnp.tanh(logits / cap) * cap
    if cfg.logits_scaling:
        # granite divides final logits by logits_scaling (reference
        # granite.py LogitsProcessor scale=1/config.logits_scaling)
        logits = logits / cfg.logits_scaling
    if axis_name is not None:
        logits = jax.lax.all_gather(logits, axis_name, axis=1, tiled=True)
    if "lm_head_b" in params:
        # phi/gptj ParallelLMHead(bias=True); kept full-vocab + replicated,
        # so it adds after the TP gather
        logits = logits + params["lm_head_b"].astype(jnp.float32)
    if return_hidden == "all":
        return logits.reshape(B, Q, -1), hidden_full, cache
    if return_hidden:
        return logits.reshape(B, Q, -1), x.reshape(B, Q, -1), cache
    return logits.reshape(B, Q, -1), cache


def compute_logits(x, lm_head):
    """Vocab projection; lm_head is either a dense [H, V] array or a
    quantized dict ({"qw8": int8 [H, V]} or {"qw": packed-int4}, + "qs")
    per ModelConfig.lm_head_quant."""
    if isinstance(lm_head, dict):
        if "qw8" in lm_head:
            fn = matmul_w8a16 if backend_is_tpu() else matmul_w8a16_ref
            return fn(x, lm_head["qw8"], lm_head["qs"], out_dtype=jnp.float32)
        fn = matmul_w4a16 if backend_is_tpu() else matmul_w4a16_ref
        return fn(x, lm_head["qw"], lm_head["qs"], out_dtype=jnp.float32)
    return jnp.dot(x, lm_head, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def make_hadamards(cfg: ModelConfig):
    """Constant Hadamard factor matrices as f32 arrays (see ops/hadamard.py).

    ``mlp_K/mlp_P`` cover the MLP (or MoE expert) intermediate width;
    qwen2-moe's shared expert has its own width -> ``shared_K/shared_P``.
    """
    if cfg.quant != "w4":
        return None
    from qspec_tpu.ops.hadamard import decompose_dim
    I = cfg.expert_intermediate_size if cfg.num_experts \
        else cfg.intermediate_size
    K, P = decompose_dim(I)
    h = {
        "heads": jnp.asarray(hadamard_matrix(cfg.num_heads), jnp.float32),
        "mlp_K": jnp.asarray(hadamard_matrix(K), jnp.float32),
        "mlp_P": jnp.asarray(hadamard_matrix(P), jnp.float32),
    }
    if cfg.shared_expert_intermediate_size:
        Ks, Ps = decompose_dim(cfg.shared_expert_intermediate_size)
        h["shared_K"] = jnp.asarray(hadamard_matrix(Ks), jnp.float32)
        h["shared_P"] = jnp.asarray(hadamard_matrix(Ps), jnp.float32)
    return h


def pack_proj_weight(w: np.ndarray, cfg_quant: str, *, shard_in: bool = False,
                     col_blocks=None, tp_size: int = 1, bias: Optional[np.ndarray] = None,
                     dtype=jnp.bfloat16) -> dict:
    """Build one projection's param dict with TP-aware layout.

    w: [in, out] float. Two TP-driven layout rules (see parallel/tp.py):

    * ``shard_in`` (row-parallel: o_proj, down_proj): the packed-int4 halves
      pairing must stay *within* each shard's contiguous row chunk, so each
      of the tp_size chunks is packed independently and the packed rows
      concatenated — shard r of the global packed array then unpacks exactly
      its local activation slice.
    * ``col_blocks`` (column-parallel with heterogeneous outputs: qkv's
      (q, k, v), gate_up's (gate, up)): the output columns are re-arranged
      into tp_size blocks of (part0/tp, part1/tp, ...) so a contiguous shard
      of the out axis carries its slice of *every* part, matching the layer
      code's local splits.
    """
    if col_blocks and tp_size > 1:
        parts = np.split(w, np.cumsum(col_blocks)[:-1], axis=1)
        chunks = []
        for r in range(tp_size):
            for p in parts:
                psz = p.shape[1] // tp_size
                chunks.append(p[:, r * psz:(r + 1) * psz])
        w = np.concatenate(chunks, axis=1)
        if bias is not None:
            bparts = np.split(bias, np.cumsum(col_blocks)[:-1])
            bias = np.concatenate([bp[r * (len(bp) // tp_size):(r + 1) * (len(bp) // tp_size)]
                                   for r in range(tp_size) for bp in bparts])
    if cfg_quant == "w4":
        if shard_in and tp_size > 1:
            rows = np.split(w, tp_size, axis=0)
            packed = []
            scales = None
            # one scale set per out channel; absmax over the FULL row so all
            # shards agree (quantization is per-out-channel globally)
            absmax = np.abs(w).max(axis=0, keepdims=True)
            scale = np.maximum(absmax, 1e-8) / 7.0
            for rw in rows:
                q = np.clip(np.rint(rw / scale), -8, 7).astype(np.int8)
                from qspec_tpu.ops.packing import pack_int4_np
                packed.append(pack_int4_np(q))
            d = {"qw": jnp.asarray(np.concatenate(packed, axis=0)),
                 "qs": jnp.asarray(scale.squeeze(0).astype(np.float32))}
        else:
            qw, qs = quantize_weight_int4(w)
            d = {"qw": jnp.asarray(qw), "qs": jnp.asarray(qs)}
    else:
        d = {"w": jnp.asarray(w, dtype)}
    if bias is not None:
        d["b"] = jnp.asarray(bias, dtype)
    return d


def pack_lm_head(w: np.ndarray, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Host-side lm_head packing per cfg.lm_head_quant. w: [H, V] float."""
    kind = cfg.resolved_lm_head_quant
    if kind == "int8":
        q, s = quantize_weight_int8(w)
        return {"qw8": jnp.asarray(q), "qs": jnp.asarray(s)}
    if kind == "int4":
        qw, qs = quantize_weight_int4(w)
        return {"qw": jnp.asarray(qw), "qs": jnp.asarray(qs)}
    return jnp.asarray(w, dtype)


def init_params_device(cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16):
    """Random params generated ON DEVICE (jax.random) — no host transfer.

    Used for synthetic benchmarks: uploading multi-GB random weights through
    a slow host link is pointless when the device can generate them. Layout
    matches init_params with tp_size=1.
    """
    key = jax.random.PRNGKey(seed)
    H, I = cfg.hidden_size, cfg.intermediate_size

    def next_key():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def make_quant(k, i, o):
        w = jax.random.normal(k, (i, o), jnp.float32) * 0.02
        absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 7.0
        q = jnp.clip(jnp.round(w / scale), -8, 7).astype(jnp.int8)
        from qspec_tpu.ops.packing import pack_int4
        return pack_int4(q), scale[0]

    def make_proj(i, o, bias=False):
        if cfg.quant == "w4":
            qw, qs = make_quant(next_key(), i, o)
            d = {"qw": qw, "qs": qs}
        else:
            d = {"w": (jax.random.normal(next_key(), (i, o), jnp.float32) * 0.02).astype(dtype)}
        if bias:
            d["b"] = jnp.zeros((o,), dtype)
        return d

    def stack_layers(n, builder):
        outs = [builder() for _ in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    def one_layer():
        layer = {
            "qkv": make_proj(H, cfg.qkv_out, bias=cfg.qkv_bias),
            "o": make_proj(cfg.q_size, H),
            "gate_up": make_proj(H, 2 * I),
            "down": make_proj(I, H),
        }
        if cfg.quant != "w4":
            layer["input_norm"] = jnp.ones((H,), dtype)
            layer["post_norm"] = jnp.ones((H,), dtype)
        if cfg.qk_norm:
            layer["q_norm"] = jnp.ones((cfg.head_dim,), dtype)
            layer["k_norm"] = jnp.ones((cfg.head_dim,), dtype)
        return layer

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def make_lm_head(k, i, o):
        w = jax.random.normal(k, (i, o), jnp.float32) * 0.02
        kind = cfg.resolved_lm_head_quant
        if kind == "bf16":
            return w.astype(dtype)
        absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        if kind == "int8":
            scale = jnp.maximum(absmax, 1e-8) / 127.0
            q = jnp.clip(jnp.round(w / scale), -128, 127).astype(jnp.int8)
            return {"qw8": q, "qs": scale[0]}
        scale = jnp.maximum(absmax, 1e-8) / 7.0
        q = jnp.clip(jnp.round(w / scale), -8, 7).astype(jnp.int8)
        from qspec_tpu.ops.packing import pack_int4
        return {"qw": pack_int4(q), "qs": scale[0]}

    params = {
        "embed": (jax.random.normal(next_key(), (cfg.vocab_size, H), jnp.float32) * 0.02).astype(dtype),
        "lm_head": make_lm_head(next_key(), H, cfg.vocab_size),
        "layers": stack_layers(cfg.num_layers, one_layer),
        "rope_cache": make_rope_cache(cfg.head_dim, cfg.max_position_embeddings,
                                      cfg.rope_theta, rope_scaling=cfg.rope_scaling),
    }
    if cfg.quant == "w4":
        params["hadamards"] = make_hadamards(cfg)
    else:
        params["final_norm"] = jnp.ones((H,), dtype)
    return params


def init_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16, tp_size: int = 1):
    """Random-init a full param pytree (QSpec-shaped when cfg.quant == 'w4').

    Used for tests and synthetic benchmarks; real checkpoints come from
    model_loader (safetensors ingestion / from_float quantization).
    """
    rng = np.random.default_rng(seed)
    H, I = cfg.hidden_size, cfg.intermediate_size

    def dense(i, o, scale=0.02):
        return (rng.standard_normal((i, o), dtype=np.float32) * scale).astype(np.float32)

    def make_proj(i, o, bias=False, *, shard_in=False, col_blocks=None):
        b = (rng.standard_normal(o).astype(np.float32) * 0.01) if bias else None
        return pack_proj_weight(dense(i, o), cfg.quant, shard_in=shard_in,
                                col_blocks=col_blocks, tp_size=tp_size, bias=b,
                                dtype=dtype)

    def make_experts():
        """[E, ...] stacked expert projections. Each expert is packed WHOLE
        (tp_size=1): parallelism is over the expert dim (EP), not inside an
        expert."""
        Ie = cfg.expert_intermediate_size
        gu, dn = [], []
        for _ in range(cfg.num_experts):
            gu.append(pack_proj_weight(dense(H, 2 * Ie), cfg.quant,
                                       col_blocks=(Ie, Ie), dtype=dtype))
            dn.append(pack_proj_weight(dense(Ie, H), cfg.quant, shard_in=True,
                                       dtype=dtype))
        return (jax.tree.map(lambda *xs: jnp.stack(xs), *gu),
                jax.tree.map(lambda *xs: jnp.stack(xs), *dn))

    layers = []
    layers_dense = []
    for _li in range(cfg.num_layers):
        layer = {
            "qkv": make_proj(H, cfg.qkv_out, bias=cfg.qkv_bias,
                             col_blocks=(cfg.q_size, cfg.kv_size, cfg.kv_size)),
            "o": make_proj(cfg.q_size, H, shard_in=True),
        }
        if cfg.num_experts and _li >= cfg.first_k_dense:
            layer["router"] = jnp.asarray(dense(H, cfg.num_experts), dtype)
            if cfg.moe_routing == "noaux_tc":
                layer["router_bias"] = jnp.zeros((cfg.num_experts,),
                                                 jnp.float32)
            layer["experts_gate_up"], layer["experts_down"] = make_experts()
            if cfg.shared_expert_intermediate_size:
                Is = cfg.shared_expert_intermediate_size
                layer["shared_gate_up"] = pack_proj_weight(
                    dense(H, 2 * Is), cfg.quant, col_blocks=(Is, Is),
                    dtype=dtype)
                layer["shared_down"] = pack_proj_weight(
                    dense(Is, H), cfg.quant, shard_in=True, dtype=dtype)
                if cfg.shared_expert_gated:
                    layer["shared_gate"] = jnp.asarray(dense(H, 1), dtype)
        elif cfg.mlp_gated:
            layer["gate_up"] = make_proj(H, 2 * I, col_blocks=(I, I))
            layer["down"] = make_proj(I, H, shard_in=True)
        else:
            layer["gate_up"] = make_proj(H, I, bias=cfg.linear_bias)
            layer["down"] = make_proj(I, H, shard_in=True,
                                      bias=cfg.linear_bias)
        if cfg.linear_bias:
            layer["qkv"] = make_proj(H, cfg.qkv_out, bias=True,
                                     col_blocks=(cfg.q_size, cfg.kv_size,
                                                 cfg.kv_size))
            layer["o"] = make_proj(cfg.q_size, H, shard_in=True, bias=True)
        if cfg.quant != "w4":
            layer["input_norm"] = jnp.ones((H,), dtype)
            if not cfg.parallel_block:
                layer["post_norm"] = jnp.ones((H,), dtype)
            if cfg.norm_type == "layernorm":
                layer["input_norm_b"] = jnp.zeros((H,), dtype)
                if not cfg.parallel_block:
                    layer["post_norm_b"] = jnp.zeros((H,), dtype)
            if cfg.post_norms:
                layer["post_attn_norm"] = jnp.ones((H,), dtype)
                layer["post_ffw_norm"] = jnp.ones((H,), dtype)
        if cfg.qk_norm:  # live in every quant mode (post-projection gammas)
            layer["q_norm"] = jnp.ones((cfg.head_dim,), dtype)
            layer["k_norm"] = jnp.ones((cfg.head_dim,), dtype)
        if cfg.num_experts and _li < cfg.first_k_dense:
            layers_dense.append(layer)
        else:
            layers.append(layer)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    params = {
        "embed": jnp.asarray(dense(cfg.vocab_size, H), dtype),
        "lm_head": pack_lm_head(dense(H, cfg.vocab_size), cfg, dtype),
        "layers": stacked,
        "rope_cache": make_rope_cache(cfg.head_dim, cfg.max_position_embeddings,
                                      cfg.rope_theta, rope_scaling=cfg.rope_scaling),
    }
    if layers_dense:
        params["layers_dense"] = jax.tree.map(lambda *xs: jnp.stack(xs),
                                              *layers_dense)
    if cfg.quant == "w4":
        params["hadamards"] = make_hadamards(cfg)
    else:
        params["final_norm"] = jnp.ones((H,), dtype)
        if cfg.norm_type == "layernorm":
            params["final_norm_b"] = jnp.zeros((H,), dtype)
    if cfg.position_embedding in ("learned", "learned_opt"):
        extra = 2 if cfg.position_embedding == "learned_opt" else 0
        params["pos_embed"] = jnp.asarray(
            dense(cfg.max_position_embeddings + extra, H), dtype)
    if cfg.num_labels:
        # cross-encoder sequence-classification head over the pooled hidden
        # (reference cross-encoder model class, models/registry.py:142-150)
        params["score_head"] = {
            "w": jnp.asarray(dense(H, cfg.num_labels), jnp.float32),
            "b": jnp.zeros((cfg.num_labels,), jnp.float32),
        }
    return params
