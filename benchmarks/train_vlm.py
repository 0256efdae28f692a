"""Train a tiny REAL vision-language captioner (in-image) for the LLaVA
serving path.

Zero egress means no pretrained VLM checkpoints, and random towers give
structurally meaningless captions; this trains (real loss, real
generalization to fresh images) a tiny CLIP-style ViT + LLaVA projector +
llama LM jointly on a synthetic shape-captioning task: 32x32 images with
one colored shape, captions "a COLOR SHAPE". The result is saved in HF
LlavaForConditionalGeneration state-dict naming, so the engine ingests it
through the SAME path as a downloaded checkpoint (registry ->
load_hf_float -> convert_llava_tower), and a chat request with an
image_url genuinely describes the image.

Reference parity target: vllm/model_executor/models/llava.py (tower +
projector + placeholder expansion) exercised with honest weights.

Run: python benchmarks/train_vlm.py [--steps 1500] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_OUT = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                           "vlm_shapes_v1")

# ---- vocabulary ------------------------------------------------------
# word-level; ids stable across train/serve
PAD, BOS, EOS, A = 0, 1, 2, 3
COLORS = {"red": 4, "green": 5, "blue": 6, "yellow": 7, "white": 8}
SHAPES = {"square": 9, "circle": 10, "triangle": 11, "cross": 12}
IMG_TOKEN = 31
VOCAB = 64

_RGB = {"red": (1, 0, 0), "green": (0, 1, 0), "blue": (0, 0, 1),
        "yellow": (1, 1, 0), "white": (1, 1, 1)}

IMAGE, PATCH = 32, 8           # 16 patches
N_IMG = (IMAGE // PATCH) ** 2

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def draw_shape(rng: np.random.Generator):
    """-> (image [32, 32, 3] float 0..1, color_name, shape_name)."""
    img = rng.uniform(0.0, 0.12, size=(IMAGE, IMAGE, 3)).astype(np.float32)
    color = list(COLORS)[rng.integers(len(COLORS))]
    shape = list(SHAPES)[rng.integers(len(SHAPES))]
    c = np.array(_RGB[color], np.float32)
    r = int(rng.integers(5, 10))                   # half-size
    cy = int(rng.integers(r + 1, IMAGE - r - 1))
    cx = int(rng.integers(r + 1, IMAGE - r - 1))
    yy, xx = np.mgrid[0:IMAGE, 0:IMAGE]
    dy, dx = yy - cy, xx - cx
    if shape == "square":
        mask = (np.abs(dy) <= r) & (np.abs(dx) <= r)
    elif shape == "circle":
        mask = dy * dy + dx * dx <= r * r
    elif shape == "triangle":
        mask = (dy >= -r) & (dy <= r) & (np.abs(dx) <= (dy + r) / 2)
    else:                                          # cross
        mask = ((np.abs(dx) <= max(r // 3, 1)) | (np.abs(dy) <= max(r // 3, 1))) \
            & (np.abs(dy) <= r) & (np.abs(dx) <= r)
    brightness = float(rng.uniform(0.7, 1.0))
    img[mask] = c * brightness
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    return np.clip(img, 0.0, 1.0), color, shape


def caption_ids(color: str, shape: str):
    return [A, COLORS[color], SHAPES[shape], EOS]


def make_batch(rng, batch):
    """-> (pixels_norm [B, 32, 32, 3], tokens [B, T], loss_mask [B, T])
    with tokens = [BOS, IMG*16, a, COLOR, SHAPE, EOS]; image positions
    carry IMG_TOKEN (never looked up — embeds replace them)."""
    T = 1 + N_IMG + 4
    pix = np.zeros((batch, IMAGE, IMAGE, 3), np.float32)
    toks = np.zeros((batch, T), np.int32)
    mask = np.zeros((batch, T), np.float32)
    for i in range(batch):
        img, color, shape = draw_shape(rng)
        pix[i] = (img - _CLIP_MEAN) / _CLIP_STD
        toks[i] = [BOS] + [IMG_TOKEN] * N_IMG + caption_ids(color, shape)
        # predict tokens[t+1] for t from the last image position onward
        mask[i, N_IMG:T - 1] = 1.0
    return pix, toks, mask


def configs():
    from qspec_tpu.config import ModelConfig, VisionConfig
    vcfg = VisionConfig(hidden_size=128, intermediate_size=256, num_layers=2,
                        num_heads=4, image_size=IMAGE, patch_size=PATCH,
                        feature_layer=-1, drop_cls=True,
                        hidden_act="quick_gelu")
    lm = ModelConfig(arch="llava", vocab_size=VOCAB, hidden_size=256,
                     intermediate_size=512, num_layers=2, num_heads=2,
                     num_kv_heads=2, head_dim=128, rope_theta=10000.0,
                     max_position_embeddings=128, quant="none",
                     weightless_norm=False, lm_head_quant="bf16",
                     vision=vcfg, image_token_id=IMG_TOKEN)
    return lm, vcfg


def hf_config_dict(cfg, vcfg) -> dict:
    """config.json contents in HF Llava naming (registry.resolve input)."""
    return {
        "architectures": ["LlavaForConditionalGeneration"],
        "model_type": "llava",
        "image_token_index": IMG_TOKEN,
        "vision_feature_layer": vcfg.feature_layer,
        "vision_feature_select_strategy": "default",
        "text_config": {
            "model_type": "llama",
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "head_dim": cfg.head_dim,
            "rope_theta": cfg.rope_theta,
            "max_position_embeddings": cfg.max_position_embeddings,
            "rms_norm_eps": cfg.rms_norm_eps,
            "tie_word_embeddings": False,
        },
        "vision_config": {
            "model_type": "clip_vision_model",
            "hidden_size": vcfg.hidden_size,
            "intermediate_size": vcfg.intermediate_size,
            "num_hidden_layers": vcfg.num_layers,
            "num_attention_heads": vcfg.num_heads,
            "image_size": vcfg.image_size,
            "patch_size": vcfg.patch_size,
            "layer_norm_eps": vcfg.layer_norm_eps,
            "hidden_act": vcfg.hidden_act,
        },
    }


def init_all(cfg, vcfg, seed=0):
    import jax.numpy as jnp

    from qspec_tpu.models.llama import init_params
    from qspec_tpu.models.vit import init_vit_params
    import dataclasses
    lm_cfg = dataclasses.replace(cfg, vision=None)
    params = init_params(lm_cfg, seed=seed)
    params = {k: v for k, v in params.items()}
    params.update(init_vit_params(vcfg, cfg.hidden_size, seed=seed + 1))
    # f32 master weights for training
    import jax
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)


def vlm_logits(params, cfg, vcfg, pixels, tokens):
    """Differentiable joint forward: tower features spliced over the
    image positions, then the dense-causal LM (train_induction)."""
    import jax.numpy as jnp

    from benchmarks.train_induction import train_forward
    from qspec_tpu.models.vit import llava_image_features

    B, T = tokens.shape
    feats = llava_image_features(params, vcfg, pixels)       # [B, 16, H]
    embeds = params["embed"][tokens].astype(jnp.float32)
    img_cols = jnp.arange(T)[None, :]
    is_img = (tokens == IMG_TOKEN)
    # positions 1..N_IMG are the image rows, in order
    idx = jnp.clip(img_cols - 1, 0, N_IMG - 1)
    spliced = jnp.where(is_img[..., None],
                        jnp.take_along_axis(feats, idx[..., None]
                                            .repeat(feats.shape[-1], -1),
                                            axis=1),
                        embeds)
    return train_forward(params, cfg, tokens, input_embeds=spliced)


def to_hf_llava_state_dict(params, cfg, vcfg) -> dict:
    """Trained pytree -> HF Llava state-dict naming (classic layout:
    language_model.* / vision_tower.vision_model.* /
    multi_modal_projector.*) — the exact inverse of
    models/vit.convert_llava_tower + loader.load_hf_float."""
    import jax

    from benchmarks.train_induction import to_hf_state_dict

    f32 = lambda a: np.asarray(jax.device_get(a), np.float32)
    lm_params = {k: v for k, v in params.items()
                 if k not in ("vision", "mm_projector")}
    sd = {f"language_model.{k}": v
          for k, v in to_hf_state_dict(lm_params, cfg).items()}

    vp = params["vision"]
    vt = "vision_tower.vision_model."
    p = vcfg.patch_size
    pe = f32(vp["patch_embed"])                       # [p*p*3, vH]
    sd[vt + "embeddings.patch_embedding.weight"] = \
        pe.reshape(p, p, 3, -1).transpose(3, 2, 0, 1)
    sd[vt + "embeddings.class_embedding"] = f32(vp["cls_embed"])
    sd[vt + "embeddings.position_embedding.weight"] = f32(vp["pos_embed"])
    sd[vt + "pre_layrnorm.weight"] = f32(vp["pre_norm"]["w"])
    sd[vt + "pre_layrnorm.bias"] = f32(vp["pre_norm"]["b"])
    vH = vcfg.hidden_size
    for i in range(vcfg.num_layers):
        lp = jax.tree.map(lambda a: a[i], vp["layers"])
        pre = f"{vt}encoder.layers.{i}."
        qkv_w, qkv_b = f32(lp["qkv"]["w"]), f32(lp["qkv"]["b"])
        for j, nm in enumerate(("q_proj", "k_proj", "v_proj")):
            sd[pre + f"self_attn.{nm}.weight"] = \
                qkv_w[:, j * vH:(j + 1) * vH].T
            sd[pre + f"self_attn.{nm}.bias"] = qkv_b[j * vH:(j + 1) * vH]
        sd[pre + "self_attn.out_proj.weight"] = f32(lp["out"]["w"]).T
        sd[pre + "self_attn.out_proj.bias"] = f32(lp["out"]["b"])
        for nm, key in (("layer_norm1", "norm1"), ("layer_norm2", "norm2")):
            sd[pre + nm + ".weight"] = f32(lp[key]["w"])
            sd[pre + nm + ".bias"] = f32(lp[key]["b"])
        sd[pre + "mlp.fc1.weight"] = f32(lp["fc1"]["w"]).T
        sd[pre + "mlp.fc1.bias"] = f32(lp["fc1"]["b"])
        sd[pre + "mlp.fc2.weight"] = f32(lp["fc2"]["w"]).T
        sd[pre + "mlp.fc2.bias"] = f32(lp["fc2"]["b"])
    mm = params["mm_projector"]
    sd["multi_modal_projector.linear_1.weight"] = f32(mm["w1"]).T
    sd["multi_modal_projector.linear_1.bias"] = f32(mm["b1"])
    sd["multi_modal_projector.linear_2.weight"] = f32(mm["w2"]).T
    sd["multi_modal_projector.linear_2.bias"] = f32(mm["b2"])
    return sd


def eval_acc(params, cfg, vcfg, rng, n=128):
    """Greedy caption accuracy on FRESH images (teacher-free: argmax
    chain over the 3 caption content tokens)."""
    import jax.numpy as jnp
    pix, toks, _ = make_batch(rng, n)
    base = toks.copy()
    correct = np.ones(n, bool)
    # autoregressively fill positions N_IMG+1 .. N_IMG+3 (a COLOR SHAPE)
    gen = base.copy()
    gen[:, N_IMG + 1:] = PAD
    for t in range(N_IMG + 1, N_IMG + 4):
        logits = np.asarray(vlm_logits(params, cfg, vcfg, jnp.asarray(pix),
                                       jnp.asarray(gen)))
        nxt = logits[:, t - 1].argmax(-1)
        gen[:, t] = nxt
        correct &= (nxt == base[:, t])
    return float(correct.mean())


def train(steps=1500, batch=64, lr=2e-3, seed=0, log_every=100):
    import jax
    import jax.numpy as jnp
    import optax

    cfg, vcfg = configs()
    params = init_all(cfg, vcfg, seed=seed)
    rope = params.pop("rope_cache")      # not trained
    rng = np.random.default_rng(seed)
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, min(200, steps // 5),
                                               steps, lr * 0.05)
    tx = optax.adamw(sched, weight_decay=0.01)
    state = tx.init(params)

    def loss_fn(p, pix, toks, mask):
        logits = vlm_logits({**p, "rope_cache": rope}, cfg, vcfg, pix, toks)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = toks[:, 1:]
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        m = mask[:, :-1]
        loss = jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1)
        acc = jnp.sum((lp.argmax(-1) == tgt) * m) / jnp.maximum(jnp.sum(m), 1)
        return loss, acc

    @jax.jit
    def step(p, s, pix, toks, mask):
        (l, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, pix, toks, mask)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, l, acc

    t0 = time.time()
    for i in range(steps):
        pix, toks, mask = make_batch(rng, batch)
        params, state, l, acc = step(params, state, jnp.asarray(pix),
                                     jnp.asarray(toks), jnp.asarray(mask))
        if (i + 1) % log_every == 0 or i == 0:
            print(f"step {i + 1}/{steps} loss={float(l):.4f} "
                  f"acc={float(acc):.4f} ({time.time() - t0:.0f}s)",
                  flush=True)
    params = {**params, "rope_cache": rope}
    holdout = eval_acc(params, cfg, vcfg, np.random.default_rng(seed + 999))
    print(f"holdout caption accuracy (fresh images): {holdout:.4f}")
    return params, cfg, vcfg, holdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=DEFAULT_OUT)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    params, cfg, vcfg, holdout = train(steps=args.steps, batch=args.batch,
                                       lr=args.lr, seed=args.seed)
    sd = to_hf_llava_state_dict(params, cfg, vcfg)
    out = os.path.abspath(args.out)
    np.savez(out + ".npz", **sd)
    with open(out + ".json", "w") as f:
        json.dump({"holdout_caption_acc": holdout,
                   "hf_config": hf_config_dict(cfg, vcfg),
                   "vocab": {"pad": PAD, "bos": BOS, "eos": EOS, "a": A,
                             "colors": COLORS, "shapes": SHAPES,
                             "image_token": IMG_TOKEN}}, f, indent=1)
    print(f"saved {out}.npz ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
