"""Multimodal inputs: modality registry + LLaVA-style image path.

TPU-native slice of the reference's multimodal stack
(vllm/multimodal/{registry,processing,inputs}.py + the per-model
input-mapper hooks): images are turned into prompt-embedding rows host-side
(patchify + projector matmul on device would also work; the projector is
small, so host numpy keeps the engine path untouched), spliced over
placeholder tokens, and fed through the engine's prompt-embeds pipeline
(Sequence.prompt_embeds -> model_forward input_embeds).

What this intentionally does NOT include: HF processor integration for
specific released VLM checkpoints (none exist in the zero-egress image) —
the registry is the extension point a real checkpoint's processor plugs
into (same shape as the reference's MULTIMODAL_REGISTRY.register_image_
input_mapper).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

# arch -> fn(params, cfg, image_np [H, W, 3] float 0..1) -> embeds [n, H]
_IMAGE_MAPPERS: Dict[str, Callable] = {}


def register_image_mapper(arch: str):
    """Register an image->embeddings mapper for a model family (the
    reference's input-mapper hook, vllm/multimodal/registry.py)."""
    def deco(fn):
        _IMAGE_MAPPERS[arch] = fn
        return fn
    return deco


def get_image_mapper(arch: str) -> Callable:
    if arch in _IMAGE_MAPPERS:
        return _IMAGE_MAPPERS[arch]
    return patch_projector_mapper  # generic LLaVA-style fallback


# CLIP pixel normalization (transformers CLIPImageProcessor defaults)
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _resize_bilinear(img: np.ndarray, size, size_w: Optional[int] = None
                     ) -> np.ndarray:
    """[H, W, C] -> [size, size_w or size, C] host-side bilinear (the
    processor's resize+center-crop collapsed; serving-quality)."""
    H, W, C = img.shape
    size_w = size if size_w is None else size_w
    if H == size and W == size_w:
        return img
    ys = (np.arange(size) + 0.5) * H / size - 0.5
    xs = (np.arange(size_w) + 0.5) * W / size_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    y1, x1 = np.minimum(y0 + 1, H - 1), np.minimum(x0 + 1, W - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    a = img[y0][:, x0] * (1 - wy) * (1 - wx) + img[y1][:, x0] * wy * (1 - wx)
    return a + img[y0][:, x1] * (1 - wy) * wx + img[y1][:, x1] * wy * wx


@register_image_mapper("llava")
def llava_tower_mapper(params, cfg, image: np.ndarray) -> np.ndarray:
    """Real LLaVA path: CLIP-style tower + projector (models/vit.py).

    ``image`` [H, W, 3] float in [0, 1] (or uint8 0..255): resized to the
    tower's square input, CLIP-normalized, run through the tower on
    device. Models without tower weights (synthetic patch-projector
    setups) fall back to the raw-patch projector below.

    Reference: vllm/model_executor/models/llava.py (vision tower +
    multi_modal_projector + feature select).
    """
    if "vision" not in params or cfg.vision is None:
        return patch_projector_mapper(params, cfg, image)
    import jax

    from qspec_tpu.models.vit import llava_image_features
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    if img.max() > 1.5:                      # uint8-style range
        img = img / 255.0
    img = _resize_bilinear(img, cfg.vision.image_size)
    img = (img - _CLIP_MEAN) / _CLIP_STD
    out = jax.jit(llava_image_features, static_argnums=1)(
        {"vision": params["vision"], "mm_projector": params["mm_projector"]},
        cfg.vision, img[None])
    return np.asarray(jax.device_get(out[0]), np.float32)


@register_image_mapper("idefics3")
def idefics3_mapper(params, cfg, image: np.ndarray) -> np.ndarray:
    """Idefics3/SmolVLM: SigLIP tower (post-LN last_hidden_state) ->
    pixel shuffle (sf x sf patches fold into sf^2*hidden channels,
    transformers Idefics3Connector.pixel_shuffle's exact reshape order)
    -> single bias-free linear into the trunk. Pixels normalize to
    [-1, 1]; this serves the GLOBAL image view (tile splitting with
    <row_r_col_c> markers is processor-level).

    Reference: vllm/model_executor/models/idefics3.py."""
    if "vision" not in params or cfg.vision is None:
        return patch_projector_mapper(params, cfg, image)
    import jax
    import jax.numpy as jnp

    from qspec_tpu.models.vit import vit_forward
    vc = cfg.vision
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    if img.max() > 1.5:
        img = img / 255.0
    img = _resize_bilinear(img, vc.image_size)
    img = (img - 0.5) / 0.5
    feats = jax.jit(vit_forward, static_argnums=1)(
        params["vision"], vc, jnp.asarray(img[None]))
    feats = np.asarray(jax.device_get(feats[0]), np.float32)   # [n, vD]
    sf = max(1, vc.pixel_shuffle)
    n, d = feats.shape
    side = int(round(n ** 0.5))
    # HF pixel_shuffle: [h, w, d] -> rows of sf x sf patches concatenated
    # channel-last in (dx-within-row, then dy) order
    x = feats.reshape(side, side, d)
    x = x.reshape(side, side // sf, d * sf)
    x = x.transpose(1, 0, 2)
    x = x.reshape(side // sf, side // sf, d * sf * sf)
    x = x.transpose(1, 0, 2)
    x = x.reshape((n // (sf * sf)), d * sf * sf)
    w = np.asarray(jax.device_get(params["mm_projector"]["w"]), np.float32)
    out = x @ w
    b = params["mm_projector"].get("b")
    if b is not None:
        out = out + np.asarray(jax.device_get(b), np.float32)
    return out.astype(np.float32)


@register_image_mapper("qwen2_audio")
def qwen2_audio_mapper(params, cfg, audio: np.ndarray) -> np.ndarray:
    """Qwen2-Audio: the attached array is AUDIO, not pixels — either a
    log-mel spectrogram ([n_mels, T] HF feature-extractor orientation or
    [T, n_mels]) or a raw mono waveform [n] (converted through the same
    log-mel frontend the whisper family serves with). The whisper-encoder
    tower runs with AvgPool1d(2) before its final LayerNorm, then the
    single-linear projector maps pooled frames into the trunk's embedding
    space; rows splice at the audio placeholder exactly like image rows.

    Reference: vllm/model_executor/models/qwen2_audio.py
    get_audio_features."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from qspec_tpu.models.whisper import whisper_encode
    ac = cfg.audio
    arr = np.asarray(audio, np.float32)
    if arr.ndim == 1:                       # raw waveform
        from qspec_tpu.audio import log_mel_spectrogram
        arr = log_mel_spectrogram(arr, n_mels=ac.num_mel)   # [T, n_mels]
    elif arr.shape[0] == ac.num_mel and arr.shape[1] != ac.num_mel:
        arr = arr.T                          # HF [n_mels, T] -> [T, n_mels]
    T = min(arr.shape[0], 2 * ac.max_source_positions)
    arr = arr[:T]
    enc_cfg = dataclasses.replace(cfg, num_heads=ac.num_heads)
    mel = jnp.asarray(arr[None], jnp.float32)
    valid = jnp.ones((1, T), bool)
    states = jax.jit(whisper_encode, static_argnums=(1,),
                     static_argnames=("avg_pool",))(
        params["audio_tower"], enc_cfg, mel, valid, avg_pool=True)
    out = (np.asarray(jax.device_get(states[0]), np.float32)
           @ np.asarray(jax.device_get(params["mm_projector"]["w"]),
                        np.float32))
    out = out + np.asarray(jax.device_get(params["mm_projector"]["b"]),
                           np.float32)
    return out.astype(np.float32)


def _select_best_resolution(orig_hw, pinpoints):
    """HF select_best_resolution: maximize effective (downscaled-to-fit)
    pixels, tie-break on least wasted canvas."""
    oh, ow = orig_hw
    best, best_eff, best_waste = None, 0, float("inf")
    for h, w in pinpoints:
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = h * w - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best_eff, best_waste, best = eff, waste, (h, w)
    return best


@register_image_mapper("llava_next")
def llava_next_mapper(params, cfg, image: np.ndarray) -> np.ndarray:
    """LLaVA-NeXT anyres: best-fit canvas from image_grid_pinpoints,
    aspect-preserving resize + centered pad, image_size tiles (plus the
    distorted-square base view as tile 0), tower+projector over the tile
    batch, then spatial packing — tiles rearranged to the full feature
    map, unpadded back to the original aspect, one image_newline embedding
    appended per row, base-view features first.

    Reference: vllm/model_executor/models/llava_next.py +
    transformers modeling_llava_next.pack_image_features /
    image_processing_llava_next.get_image_patches."""
    import math

    if "vision" not in params or cfg.vision is None:
        return patch_projector_mapper(params, cfg, image)
    import jax
    import jax.numpy as jnp

    from qspec_tpu.models.vit import llava_image_features
    vc = cfg.vision
    sz = vc.image_size
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    if img.max() > 1.5:
        img = img / 255.0
    oh, ow = img.shape[:2]
    th, tw = _select_best_resolution(
        (oh, ow), cfg.image_grid_pinpoints or ((2 * sz, 2 * sz),))
    # aspect-preserving resize to fit the canvas (HF get_patch_output_size)
    scale_w, scale_h = tw / ow, th / oh
    if scale_w < scale_h:
        nw, nh = tw, min(math.ceil(oh * scale_w), th)
    else:
        nh, nw = th, min(math.ceil(ow * scale_h), tw)
    resized = _resize_bilinear(img, nh, nw)
    py = (th - nh) // 2
    px = (tw - nw) // 2
    canvas = np.zeros((th, tw, 3), np.float32)
    canvas[py:py + nh, px:px + nw] = resized
    nph, npw = th // sz, tw // sz
    tiles = [_resize_bilinear(img, sz)]            # base view, distorted
    for i in range(nph):
        for j in range(npw):
            tiles.append(canvas[i * sz:(i + 1) * sz, j * sz:(j + 1) * sz])
    batch = (np.stack(tiles) - _CLIP_MEAN) / _CLIP_STD
    feats = jax.jit(llava_image_features, static_argnums=1)(
        {"vision": params["vision"], "mm_projector": params["mm_projector"]},
        vc, jnp.asarray(batch))
    feats = np.asarray(jax.device_get(feats), np.float32)  # [1+T, h*w, D]
    D = feats.shape[-1]
    h = w = sz // vc.patch_size
    base = feats[0]
    gf = feats[1:].reshape(nph, npw, h, w, D)
    gf = gf.transpose(0, 2, 1, 3, 4).reshape(nph * h, npw * w, D)
    # unpad back to the original aspect (HF unpad_image)
    rows, cols = gf.shape[:2]
    if ow / oh > cols / rows:
        new_rows = int(round(oh * (cols / ow), 7))
        pad = (rows - new_rows) // 2
        gf = gf[pad:rows - pad]
    else:
        new_cols = int(round(ow * (rows / oh), 7))
        pad = (cols - new_cols) // 2
        gf = gf[:, pad:cols - pad]
    nl = params.get("image_newline")
    if nl is not None:
        nlrow = np.broadcast_to(np.asarray(nl, np.float32)[None, None],
                                (gf.shape[0], 1, D))
        gf = np.concatenate([gf, nlrow], axis=1)
    return np.concatenate([base, gf.reshape(-1, D)], axis=0)


@register_image_mapper("fuyu")
def fuyu_patch_mapper(params, cfg, image: np.ndarray) -> np.ndarray:
    """Fuyu: no tower — pixels normalized to [-1, 1] (FuyuImageProcessor
    mean=std=0.5), split into patch_size^2*3 raw patches in (py, px, c)
    order and projected by the single vision_embed_tokens linear
    (params["mm_projector"]). Row-structure |NEWLINE| tokens are a
    processor-level concern (the reference inserts them between patch
    rows); prompts may carry them as ordinary text tokens.

    Reference: vllm/model_executor/models/fuyu.py vision_embed_tokens +
    transformers FuyuImageProcessor.patchify_image."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    if img.max() > 1.5:
        img = img / 255.0
    patch = cfg.vision.patch_size if cfg.vision is not None else 30
    H, W, _ = img.shape
    ph = max(patch, ((H + patch - 1) // patch) * patch)
    pw = max(patch, ((W + patch - 1) // patch) * patch)
    if (ph, pw) != (H, W):
        # the HF processor pads with constant 1.0 on the 0..255 scale
        # BEFORE rescale+normalize
        pad = np.full((ph, pw, 3), 1.0 / 255.0, np.float32)
        pad[:H, :W] = img
        img = pad
    img = (img - 0.5) / 0.5
    return patch_projector_mapper(params, cfg, img, patch=patch)


@register_image_mapper("paligemma")
def paligemma_tower_mapper(params, cfg, image: np.ndarray) -> np.ndarray:
    """PaliGemma: SigLIP tower (post_layernorm'd last_hidden_state) +
    single-linear projector; pixels normalized to [-1, 1] (SigLIP
    mean=std=0.5, not the CLIP stats).

    The HF forward divides projected features by sqrt(text_hidden) and the
    Gemma trunk multiplies ALL inputs_embeds back by sqrt(text_hidden)
    (GemmaModel normalizer) — net identity on image rows, so the raw
    projector output is the correct splice row here (text rows carry
    cfg.embed_scale in splice_image_embeds).

    Reference: vllm/model_executor/models/paligemma.py +
    transformers modeling_paligemma.get_image_features."""
    if "vision" not in params or cfg.vision is None:
        return patch_projector_mapper(params, cfg, image)
    import jax

    from qspec_tpu.models.vit import llava_image_features
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    if img.max() > 1.5:
        img = img / 255.0
    img = _resize_bilinear(img, cfg.vision.image_size)
    img = (img - 0.5) / 0.5
    out = jax.jit(llava_image_features, static_argnums=1)(
        {"vision": params["vision"], "mm_projector": params["mm_projector"]},
        cfg.vision, img[None])
    return np.asarray(jax.device_get(out[0]), np.float32)


def patch_projector_mapper(params, cfg, image: np.ndarray,
                           patch: int = 16) -> np.ndarray:
    """Generic ViT-free image mapper: non-overlapping patches -> linear
    projector into the LM's hidden space (the projector weight lives at
    ``params["mm_projector"]["w"]`` [patch*patch*3, H], ``"b"`` [H]).

    This is the MLP-projector half of LLaVA (the reference's llava.py
    multi_modal_projector); a real checkpoint's vision tower output would
    replace the raw patches.
    """
    mm = params.get("mm_projector")
    if mm is None:
        raise ValueError("model params carry no 'mm_projector' weights")
    import jax
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    H, W, C = img.shape
    ph, pw = H // patch, W // patch
    img = img[:ph * patch, :pw * patch]
    patches = img.reshape(ph, patch, pw, patch, C).transpose(0, 2, 1, 3, 4)
    flat = patches.reshape(ph * pw, patch * patch * C)
    w = np.asarray(jax.device_get(mm["w"]), np.float32)
    out = flat @ w
    if "b" in mm:
        out = out + np.asarray(jax.device_get(mm["b"]), np.float32)
    return out.astype(np.float32)


def splice_image_embeds(params, cfg, prompt_token_ids: List[int],
                        images: List[np.ndarray],
                        image_token_id: int,
                        arch: Optional[str] = None):
    """Expand each image placeholder token into that image's embedding rows.

    Returns (token_ids, prompt_embeds): token ids padded with the
    placeholder id over image spans (they are never looked up — the embeds
    row mask covers the whole prompt), text positions carry their real ids
    so detokenization/prefix bookkeeping stay sane.

    Reference concept: placeholder expansion in
    vllm/multimodal/processing.py (PromptReplacement) feeding
    merge_multimodal_embeddings in each VLM's forward.
    """
    import jax
    mapper = get_image_mapper(arch or cfg.arch)
    embed_table = np.asarray(jax.device_get(params["embed"]), np.float32)
    scale = cfg.embed_scale if cfg.embed_scale is not None else 1.0

    out_ids: List[int] = []
    rows: List[np.ndarray] = []
    img_iter = iter(images)
    for t in prompt_token_ids:
        if t == image_token_id:
            img = next(img_iter, None)
            if img is None:
                raise ValueError("more image placeholders than images")
            emb = mapper(params, cfg, np.asarray(img))
            rows.append(emb)
            out_ids.extend([image_token_id] * emb.shape[0])
        else:
            rows.append(embed_table[t][None] * scale)
            out_ids.append(t)
    if next(img_iter, None) is not None:
        raise ValueError("more images than image placeholders")
    return out_ids, np.concatenate(rows, axis=0)


def qwen2vl_image_embeds(params, cfg, image: np.ndarray):
    """Qwen2-VL native-resolution path: resize to the nearest multiple of
    patch*merge per side (dynamic resolution — NO fixed square), patchify,
    run the rope-2D tower, return (merged embeds [n, H], (t, gh, gw) grid).

    Reference: models/qwen2_vl.py Qwen2VisionTransformer +
    image processor smart_resize."""
    import jax

    from qspec_tpu.models.qwen2vl_vit import (_vision_rope_table,
                                              image_to_patches,
                                              qwen2vl_tower)
    vc = cfg.vision
    unit = vc.patch_size * vc.spatial_merge
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    if img.max() <= 1.5:
        img = img * 255.0
    H, W, _ = img.shape
    nh = max(unit, int(round(H / unit)) * unit)
    nw = max(unit, int(round(W / unit)) * unit)
    img = _resize_bilinear(img, nh, nw)
    patches, grid = image_to_patches(img.astype(np.float32), vc)
    rope = _vision_rope_table(grid[1], grid[2], vc.spatial_merge,
                              (params["vision"]["patch_embed"].shape[1]
                               // vc.num_heads))
    import jax.numpy as jnp
    out = qwen2vl_tower(params["vision"], jnp.asarray(patches),
                        jnp.asarray(rope), vc=vc)
    return np.asarray(jax.device_get(out), np.float32), grid


def splice_image_embeds_qwen2vl(params, cfg, prompt_token_ids: List[int],
                                images: List[np.ndarray],
                                image_token_id: int):
    """Qwen2-VL placeholder expansion + M-RoPE table.

    Returns (token_ids, prompt_embeds, mrope_table [3, T], mrope_delta).
    Reference: qwen2_vl.py merge_multimodal_embeddings + get_rope_index.
    """
    import jax

    from qspec_tpu.models.qwen2vl_vit import mrope_positions
    embed_table = np.asarray(jax.device_get(params["embed"]), np.float32)
    out_ids: List[int] = []
    rows: List[np.ndarray] = []
    grids = []
    img_iter = iter(images)
    for t in prompt_token_ids:
        if t == image_token_id:
            img = next(img_iter, None)
            if img is None:
                raise ValueError("more image placeholders than images")
            emb, grid = qwen2vl_image_embeds(params, cfg, img)
            rows.append(emb)
            grids.append(grid)
            out_ids.extend([image_token_id] * emb.shape[0])
        else:
            rows.append(embed_table[t][None])
            out_ids.append(t)
    if next(img_iter, None) is not None:
        raise ValueError("more images than image placeholders")
    table, delta = mrope_positions(out_ids, image_token_id, grids,
                                   cfg.vision.spatial_merge)
    return out_ids, np.concatenate(rows, axis=0), table, delta


def init_mm_projector(hidden_size: int, patch: int = 16, seed: int = 0,
                      dtype=None):
    """Random projector weights (tests / synthetic serving)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    d = patch * patch * 3
    return {"w": jnp.asarray(rng.standard_normal((d, hidden_size))
                             .astype(np.float32) * (d ** -0.5)),
            "b": jnp.asarray(np.zeros(hidden_size, np.float32))}
