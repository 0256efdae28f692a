"""CLIP-style vision tower + LLaVA projector, TPU-first.

Reference surfaces re-implemented here:
  - vllm/model_executor/models/clip.py (CLIPVisionModel wrapper)
  - vllm/model_executor/models/llava.py (feature select + multi_modal_projector)

TPU-first design notes: the patch "conv" is a reshape + one [N, p*p*3] x
[p*p*3, H] matmul (a stride-p conv with kernel p IS that matmul — XLA
would canonicalize anyway, this keeps the graph explicit for the MXU);
attention is one batched einsum over all heads (seq len is a few hundred
patches — flash tiling buys nothing, plain softmax attention fuses fine);
everything is bf16 with fp32 layernorms, matching the LM trunk's
precision policy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.config import VisionConfig


def _act(name: str, x):
    if name == "quick_gelu":           # x * sigmoid(1.702 x) — CLIP's GELU
        return x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu_tanh", "gelu_pytorch_tanh"):   # siglip MLP
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def _layernorm(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def patchify(pixels: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, n_patches, patch*patch*3] in (kh, kw, c) order
    per patch, patches row-major over the grid (matches HF conv2d +
    flatten(2))."""
    B, H, W, C = pixels.shape
    gh, gw = H // patch, W // patch
    x = pixels[:, :gh * patch, :gw * patch]
    x = x.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)           # [B, gh, gw, ph, pw, C]
    return x.reshape(B, gh * gw, patch * patch * C)


def vit_forward(vp: dict, vcfg: VisionConfig, pixels: jnp.ndarray,
                feature_layer: Optional[int] = None) -> jnp.ndarray:
    """Vision tower forward.

    pixels: [B, H, W, 3] float (normalized as the checkpoint expects).
    Returns hidden_states[feature_layer] [B, 1 + n_patches, vH] (CLS row
    first), WITHOUT post_layernorm — matching HF output_hidden_states
    semantics that LLaVA's vision_feature_layer indexes into.
    """
    fl = vcfg.feature_layer if feature_layer is None else feature_layer
    B = pixels.shape[0]
    x = jnp.dot(patchify(pixels.astype(jnp.float32), vcfg.patch_size),
                vp["patch_embed"])                     # [B, n, vH] fp32
    if "patch_bias" in vp:
        x = x + vp["patch_bias"]
    if "cls_embed" in vp:                              # CLIP: CLS row first
        cls = jnp.broadcast_to(vp["cls_embed"][None, None, :],
                               (B, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["pos_embed"][None]
    if "pre_norm" in vp:                               # siglip has none
        x = _layernorm(x, vp["pre_norm"]["w"], vp["pre_norm"]["b"],
                       vcfg.layer_norm_eps)
    x = x.astype(jnp.bfloat16)

    n_keep = fl % (vcfg.num_layers + 1)       # hidden_states index -> count
    nh, hd = vcfg.num_heads, vcfg.head_dim
    scale = hd ** -0.5

    def block(x, lp):
        h = _layernorm(x, lp["norm1"]["w"], lp["norm1"]["b"],
                       vcfg.layer_norm_eps)
        S = h.shape[1]
        qkv = (jnp.dot(h, lp["qkv"]["w"],
                       preferred_element_type=jnp.float32)
               + lp["qkv"]["b"]).astype(jnp.bfloat16)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                         preferred_element_type=jnp.float32) * scale
        att = jax.nn.softmax(att, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                       preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, nh * hd)
        o = jnp.dot(o.astype(jnp.bfloat16), lp["out"]["w"],
                    preferred_element_type=jnp.float32) + lp["out"]["b"]
        x = x + o.astype(x.dtype)
        h = _layernorm(x, lp["norm2"]["w"], lp["norm2"]["b"],
                       vcfg.layer_norm_eps)
        f = jnp.dot(h, lp["fc1"]["w"],
                    preferred_element_type=jnp.float32) + lp["fc1"]["b"]
        f = _act(vcfg.hidden_act, f).astype(jnp.bfloat16)
        f = jnp.dot(f, lp["fc2"]["w"],
                    preferred_element_type=jnp.float32) + lp["fc2"]["b"]
        return x + f.astype(x.dtype)

    # run layers 0..n_keep-1 (hidden_states[n_keep] = output of layer
    # n_keep-1; n_keep == num_layers+... capped). Python loop over stacked
    # params keeps it simple: towers are <=24 layers and traced once.
    n_run = min(n_keep, vcfg.num_layers)
    for i in range(n_run):
        x = block(x, jax.tree.map(lambda a: a[i], vp["layers"]))
    if vcfg.post_norm and n_run == vcfg.num_layers and "post_norm" in vp:
        # last_hidden_state semantics (SigLipVisionTransformer applies
        # post_layernorm before returning; PaliGemma projects THAT)
        x = _layernorm(x, vp["post_norm"]["w"], vp["post_norm"]["b"],
                       vcfg.layer_norm_eps)
    return x


def llava_image_features(params: dict, vcfg: VisionConfig,
                         pixels: jnp.ndarray) -> jnp.ndarray:
    """Tower + feature-select + projector: [B, H, W, 3] -> [B, n, lm_H].

    The projector (params["mm_projector"]: linear_1 -> gelu -> linear_2,
    reference LlavaMultiModalProjector) maps tower features into the LM's
    embedding space.
    """
    feats = vit_forward(params["vision"], vcfg, pixels)
    if vcfg.drop_cls and vcfg.tower == "clip":
        feats = feats[:, 1:]
    mm = params["mm_projector"]
    x = feats.astype(jnp.float32)
    if "w1" in mm:
        x = jnp.dot(x, mm["w1"]) + mm["b1"]
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x, mm["w2"]) + mm["b2"]
    else:                                  # single-linear projector
        x = jnp.dot(x, mm["w"])
        if "b" in mm:
            x = x + mm["b"]
    return x


def init_vit_params(vcfg: VisionConfig, lm_hidden: int, seed: int = 0,
                    projector_hidden: Optional[int] = None) -> dict:
    """Random tower+projector params (tests / in-image training init)."""
    rng = np.random.default_rng(seed)
    vH, I = vcfg.hidden_size, vcfg.intermediate_size
    d_patch = vcfg.patch_size * vcfg.patch_size * 3
    n_pos = vcfg.num_patches + 1

    def lin(d_in, d_out):
        return {"w": jnp.asarray(rng.standard_normal((d_in, d_out))
                                 .astype(np.float32) * d_in ** -0.5),
                "b": jnp.zeros((d_out,), jnp.float32)}

    def ln():
        return {"w": jnp.ones((vH,), jnp.float32),
                "b": jnp.zeros((vH,), jnp.float32)}

    layers = []
    for _ in range(vcfg.num_layers):
        layers.append({"norm1": ln(), "qkv": lin(vH, 3 * vH),
                       "out": lin(vH, vH), "norm2": ln(),
                       "fc1": lin(vH, I), "fc2": lin(I, vH)})
    pj = projector_hidden or lm_hidden
    return {
        "vision": {
            "patch_embed": jnp.asarray(
                rng.standard_normal((d_patch, vH)).astype(np.float32)
                * d_patch ** -0.5),
            "cls_embed": jnp.asarray(
                rng.standard_normal(vH).astype(np.float32) * 0.02),
            "pos_embed": jnp.asarray(
                rng.standard_normal((n_pos, vH)).astype(np.float32) * 0.02),
            "pre_norm": ln(),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        },
        "mm_projector": {
            "w1": jnp.asarray(rng.standard_normal((vH, pj))
                              .astype(np.float32) * vH ** -0.5),
            "b1": jnp.zeros((pj,), jnp.float32),
            "w2": jnp.asarray(rng.standard_normal((pj, lm_hidden))
                              .astype(np.float32) * pj ** -0.5),
            "b2": jnp.zeros((lm_hidden,), jnp.float32),
        },
    }


def convert_llava_tower(sd: dict, vcfg: VisionConfig) -> dict:
    """HF LlavaForConditionalGeneration vision/projector keys -> our params.

    Key map (reference checkpoints; transformers modeling_llava):
      vision_tower.vision_model.embeddings.{patch_embedding.weight [vH,3,p,p],
        class_embedding [vH], position_embedding.weight [n+1, vH]}
      vision_tower.vision_model.pre_layrnorm.{weight,bias}   (sic)
      vision_tower.vision_model.encoder.layers.{i}.{layer_norm1, self_attn.
        {q,k,v,out}_proj, layer_norm2, mlp.fc1, mlp.fc2}.{weight,bias}
      multi_modal_projector.linear_{1,2}.{weight,bias}
    """
    def a(name):
        return np.asarray(sd[name], np.float32)

    def find(*names):
        for n in names:
            if n in sd:
                return n
        raise KeyError(names[0])

    vt = "vision_tower.vision_model."
    if vt + "embeddings.patch_embedding.weight" not in sd:
        vt = "model." + vt                       # transformers >= 4.52 layout
    conv = a(vt + "embeddings.patch_embedding.weight")   # [vH, 3, p, p]
    patch_embed = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    siglip = vcfg.tower == "siglip"

    def ln(prefix):
        return {"w": jnp.asarray(a(prefix + ".weight")),
                "b": jnp.asarray(a(prefix + ".bias"))}

    def lin_t(prefix):
        return {"w": jnp.asarray(a(prefix + ".weight").T),
                "b": jnp.asarray(a(prefix + ".bias"))}

    layers = []
    for i in range(vcfg.num_layers):
        p = f"{vt}encoder.layers.{i}."
        qkv_w = np.concatenate([a(p + "self_attn.q_proj.weight").T,
                                a(p + "self_attn.k_proj.weight").T,
                                a(p + "self_attn.v_proj.weight").T], axis=1)
        qkv_b = np.concatenate([a(p + "self_attn.q_proj.bias"),
                                a(p + "self_attn.k_proj.bias"),
                                a(p + "self_attn.v_proj.bias")])
        layers.append({
            "norm1": ln(p + "layer_norm1"),
            "qkv": {"w": jnp.asarray(qkv_w), "b": jnp.asarray(qkv_b)},
            "out": lin_t(p + "self_attn.out_proj"),
            "norm2": ln(p + "layer_norm2"),
            "fc1": lin_t(p + "mlp.fc1"),
            "fc2": lin_t(p + "mlp.fc2"),
        })
    mp = "multi_modal_projector."
    if (mp + "linear_1.weight" not in sd and mp + "linear.weight" not in sd
            and ("model." + mp + "linear_1.weight" in sd
                 or "model." + mp + "linear.weight" in sd)):
        mp = "model." + mp
    vision = {
        "patch_embed": jnp.asarray(patch_embed),
        "pos_embed": jnp.asarray(
            a(vt + "embeddings.position_embedding.weight")),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }
    if siglip:
        vision["patch_bias"] = jnp.asarray(
            a(vt + "embeddings.patch_embedding.bias"))
    else:
        vision["cls_embed"] = jnp.asarray(
            a(vt + "embeddings.class_embedding"))
        pre = find(vt + "pre_layrnorm.weight", vt + "pre_layernorm.weight")
        vision["pre_norm"] = ln(pre[:-len(".weight")])
    if vcfg.post_norm and vt + "post_layernorm.weight" in sd:
        vision["post_norm"] = ln(vt + "post_layernorm")
    if mp + "linear.weight" not in sd and mp + "linear_1.weight" not in sd:
        # tower-only checkpoints (idefics3's connector lives elsewhere)
        return {"vision": vision}
    if mp + "linear.weight" in sd:
        # single-linear projector (PaliGemmaMultiModalProjector)
        projector = {"w": jnp.asarray(a(mp + "linear.weight").T),
                     "b": jnp.asarray(a(mp + "linear.bias"))}
    else:
        projector = {
            "w1": jnp.asarray(a(mp + "linear_1.weight").T),
            "b1": jnp.asarray(a(mp + "linear_1.bias")),
            "w2": jnp.asarray(a(mp + "linear_2.weight").T),
            "b2": jnp.asarray(a(mp + "linear_2.bias")),
        }
    return {"vision": vision, "mm_projector": projector}
