"""Qwen2-VL native-resolution vision tower + M-RoPE position tables.

Reference: vllm/model_executor/models/qwen2_vl.py (Qwen2VisionTransformer +
uses_mrope at :66) / HF modeling_qwen2_vl.py. Structure per image:

  flattened patches [N, C*tp*p*p]  (N = grid_t*grid_h*grid_w, merge-block-
  major ordering — each spatial_merge_size^2 block contiguous)
    -> linear patch embed (the Conv3d with stride == kernel)
    -> depth x [LN -> full attention with 2D vision rope (half the rotary
       dims rotate by the patch's h index, half by w) -> LN -> quick-gelu
       MLP], residuals
    -> PatchMerger: LN, group merge^2 patches, Linear -> GELU -> Linear
       into the LM hidden size.

TPU shape: one jitted call per image (dynamic patch counts bucket by N);
everything is dense matmuls on the MXU — no kernel work needed at these
sizes. The LM-side 3D rope (temporal/height/width channel split) lives in
ops/rotary.apply_rope_mrope; the position tables come from
``mrope_positions`` below (the HF get_rope_index rule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import VisionConfig


def _vision_rope_table(grid_h: int, grid_w: int, merge: int,
                       head_dim: int) -> np.ndarray:
    """[N, head_dim] rotary angles for one image's patches (t repeats).

    Half the (quarter-dim) freq channels index by the patch's h, half by w,
    tiled twice over the head dim (HF rot_pos_emb + the cat([emb, emb]))."""
    quarter = head_dim // 4
    inv = 1.0 / (10000.0 ** (np.arange(0, quarter, dtype=np.float64)
                             / quarter))
    # merge-block-major (h, w) ids
    hpos = np.arange(grid_h)[:, None] * np.ones((1, grid_w), np.int64)
    wpos = np.ones((grid_h, 1), np.int64) * np.arange(grid_w)[None, :]

    def block_major(a):
        return a.reshape(grid_h // merge, merge, grid_w // merge,
                         merge).transpose(0, 2, 1, 3).reshape(-1)

    hb, wb = block_major(hpos), block_major(wpos)
    ang = np.concatenate([hb[:, None] * inv[None, :],
                          wb[:, None] * inv[None, :]], axis=1)  # [N, hd/2]
    return np.concatenate([ang, ang], axis=1).astype(np.float32)  # [N, hd]


def _rot_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


@functools.partial(jax.jit, static_argnames=("vc",))
def qwen2vl_tower(params: dict, patches: jnp.ndarray, rope: jnp.ndarray,
                  *, vc: VisionConfig) -> jnp.ndarray:
    """One image: patches [N, C*tp*p*p] + rope angles [N, head_dim] ->
    merged embeddings [N / merge^2, lm_hidden]."""
    nh = vc.num_heads
    D = params["patch_embed"].shape[1]
    dh = D // nh

    def ln(x, w, b, eps=1e-6):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + eps) * w + b)

    x = (patches.astype(jnp.float32) @ params["patch_embed"]).astype(
        jnp.bfloat16)                                        # [N, D]
    cos = jnp.cos(rope)[:, None, :]                          # [N, 1, dh]
    sin = jnp.sin(rope)[:, None, :]

    def block(x, lp):
        h = ln(x, lp["ln1"], lp["ln1_b"]).astype(jnp.bfloat16)
        qkv = h @ lp["qkv"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        N = q.shape[0]
        q = q.reshape(N, nh, dh).astype(jnp.float32)
        k = k.reshape(N, nh, dh).astype(jnp.float32)
        q = q * cos + _rot_half(q) * sin
        k = k * cos + _rot_half(k) * sin
        v = v.reshape(N, nh, dh).astype(jnp.float32)
        s = jnp.einsum("qhd,khd->hqk", q, k) * (dh ** -0.5)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", a, v).reshape(N, D)
        x = x + (o.astype(jnp.bfloat16) @ lp["proj"] + lp["proj_b"])
        h = ln(x, lp["ln2"], lp["ln2_b"]).astype(jnp.bfloat16)
        f = h @ lp["fc1"] + lp["fc1_b"]
        f32 = f.astype(jnp.float32)
        f = (f32 * jax.nn.sigmoid(1.702 * f32)).astype(jnp.bfloat16)
        return x + (f @ lp["fc2"] + lp["fc2_b"]), None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    m = vc.spatial_merge ** 2
    x = ln(x, params["merge_ln"], params["merge_ln_b"])      # [N, D] f32
    x = x.reshape(-1, m * D).astype(jnp.bfloat16)
    h = x @ params["merge_fc1"] + params["merge_fc1_b"]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
    return (h.astype(jnp.bfloat16) @ params["merge_fc2"]
            + params["merge_fc2_b"])                         # [N/m^2, lm_H]


def convert_qwen2vl_tower(sd: dict, vc: VisionConfig, dtype=jnp.bfloat16):
    """HF `visual.*` state dict -> tower pytree."""
    def a(name):
        return np.asarray(sd["visual." + name], np.float32)

    blocks = []
    for i in range(vc.num_layers):
        p = f"blocks.{i}."
        blocks.append({
            "qkv": jnp.asarray(a(p + "attn.qkv.weight").T, dtype),
            "qkv_b": jnp.asarray(a(p + "attn.qkv.bias"), dtype),
            "proj": jnp.asarray(a(p + "attn.proj.weight").T, dtype),
            "proj_b": jnp.asarray(a(p + "attn.proj.bias"), dtype),
            "fc1": jnp.asarray(a(p + "mlp.fc1.weight").T, dtype),
            "fc1_b": jnp.asarray(a(p + "mlp.fc1.bias"), dtype),
            "fc2": jnp.asarray(a(p + "mlp.fc2.weight").T, dtype),
            "fc2_b": jnp.asarray(a(p + "mlp.fc2.bias"), dtype),
            "ln1": jnp.asarray(a(p + "norm1.weight"), jnp.float32),
            "ln1_b": jnp.asarray(a(p + "norm1.bias"), jnp.float32),
            "ln2": jnp.asarray(a(p + "norm2.weight"), jnp.float32),
            "ln2_b": jnp.asarray(a(p + "norm2.bias"), jnp.float32),
        })
    return {"vision": {
        "patch_embed": jnp.asarray(
            a("patch_embed.proj.weight").reshape(
                a("patch_embed.proj.weight").shape[0], -1).T, dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "merge_ln": jnp.asarray(a("merger.ln_q.weight"), jnp.float32),
        "merge_ln_b": jnp.asarray(a("merger.ln_q.bias"), jnp.float32),
        "merge_fc1": jnp.asarray(a("merger.mlp.0.weight").T, dtype),
        "merge_fc1_b": jnp.asarray(a("merger.mlp.0.bias"), dtype),
        "merge_fc2": jnp.asarray(a("merger.mlp.2.weight").T, dtype),
        "merge_fc2_b": jnp.asarray(a("merger.mlp.2.bias"), dtype),
    }}


def image_to_patches(img: np.ndarray, vc: VisionConfig):
    """HWC uint8/float image -> (patches [N, C*tp*p*p], (t, h, w) grid).

    Mirrors HF Qwen2VLImageProcessor: resize is the caller's business; here
    the image must already be a multiple of patch*merge per side. Normalized
    with the CLIP mean/std, temporal dim duplicated to temporal_patch_size,
    patches emitted merge-block-major (matching _vision_rope_table)."""
    p, m, tp = vc.patch_size, vc.spatial_merge, vc.temporal_patch
    H, W, C = img.shape
    assert H % (p * m) == 0 and W % (p * m) == 0, \
        f"image {H}x{W} must be a multiple of {p * m}"
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    x = (np.asarray(img, np.float32) / 255.0 - mean) / std
    gh, gw = H // p, W // p
    x = x.transpose(2, 0, 1)                          # [C, H, W]
    x = np.broadcast_to(x[None], (tp, C, H, W))       # [tp, C, H, W]
    x = x.reshape(tp, C, gh // m, m, p, gw // m, m, p)
    # [gh/m, gw/m, m, m, C, tp, p, p] -> merge-block-major patches
    x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)
    patches = x.reshape(gh * gw, C * tp * p * p)
    return patches.astype(np.float32), (1, gh, gw)


def mrope_positions(prompt_token_ids, image_token_id: int, grids,
                    merge: int):
    """[3, T] (temporal, height, width) LM position ids + the decode delta.

    The HF get_rope_index rule (reference qwen2_vl.py / HF
    Qwen2VLModel.get_rope_index), images only: text tokens advance all
    three channels together; an image's tokens sit at a CONSTANT temporal
    index (text_pos) with height/width ids spanning its merged grid; the
    next text token resumes at max(position)+1. Returns (table [3, T],
    delta) with delta = max(table)+1 - T (decode channels = pos + delta).
    """
    T = len(prompt_token_ids)
    table = np.zeros((3, T), np.int64)
    img_i = 0
    st = 0      # next position value
    i = 0
    while i < T:
        if prompt_token_ids[i] == image_token_id:
            t, gh, gw = grids[img_i]
            lh, lw = gh // merge, gw // merge
            n = t * lh * lw
            tpos = np.repeat(np.arange(t), lh * lw)
            hpos = np.tile(np.repeat(np.arange(lh), lw), t)
            wpos = np.tile(np.arange(lw), t * lh)
            table[0, i:i + n] = st + tpos
            table[1, i:i + n] = st + hpos
            table[2, i:i + n] = st + wpos
            st = int(table[:, i:i + n].max()) + 1
            i += n
            img_i += 1
        else:
            table[:, i] = st
            st += 1
            i += 1
    delta = int(table.max()) + 1 - T
    return table.astype(np.int32), delta
