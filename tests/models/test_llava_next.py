"""HF-golden tests for the LLaVA-NeXT (anyres) family: best-fit canvas
tiling, tile-batched tower+projector, spatial packing with unpadding and
per-row image_newline (reference vllm/model_executor/models/llava_next.py).

The HF model consumes the SAME tiles our mapper builds (pixel_values
passed directly), so the golden comparison pins the model-side math —
tower batch, projector, pack/unpad/newline, splice — while resize kernels
(ours bilinear, HF's processor bicubic) stay out of scope, as with the
other VLM families.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.model_loader.loader import load_hf_float  # noqa: E402
from qspec_tpu.multimodal import (_CLIP_MEAN, _CLIP_STD,  # noqa: E402
                                  _resize_bilinear, splice_image_embeds)
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402

IMG_TOKEN = 31
SZ = 32                        # tile size (vision image_size)
PATCH = 8                      # -> 4x4 features per tile


def tiny_llava_next():
    text_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0)
    vision_cfg = transformers.CLIPVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=SZ, patch_size=PATCH,
        projection_dim=32)
    cfg = transformers.LlavaNextConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=IMG_TOKEN, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=[[SZ, 2 * SZ], [2 * SZ, SZ], [2 * SZ, 2 * SZ]])
    torch.manual_seed(0)
    hf = transformers.LlavaNextForConditionalGeneration(cfg).eval()
    return hf, cfg


def test_llava_next_vs_hf():
    hf, hf_cfg = tiny_llava_next()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["LlavaNextForConditionalGeneration"]})
    assert cfg.arch == "llava_next"
    assert cfg.image_grid_pinpoints == ((SZ, 2 * SZ), (2 * SZ, SZ),
                                        (2 * SZ, 2 * SZ))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, cfg = load_hf_float(sd, cfg)
    assert "image_newline" in params

    # image exactly one pinpoint (32 x 64): anyres resize is identity,
    # grid = 1 x 2 tiles + the base view
    rng = np.random.default_rng(0)
    image01 = rng.uniform(0.0, 1.0, size=(SZ, 2 * SZ, 3)).astype(np.float32)
    text_pre = [2, 9, 17]
    text_post = [5, 11, 20, 3]
    prompt = text_pre + [IMG_TOKEN] + text_post

    out_ids, embeds = splice_image_embeds(params, cfg, prompt, [image01],
                                          IMG_TOKEN, arch="llava_next")
    h = SZ // PATCH
    # packed length: base (h*h) + unpadded grid rows h x (2h + newline)
    n_img = h * h + h * (2 * h + 1)
    T = len(out_ids)
    assert T == len(text_pre) + n_img + len(text_post)

    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8,
                               page_size=64)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 64)[None, :],
        block_tables=jnp.asarray([[1, 2]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    logits, _ = model_forward(
        params, cfg, jnp.asarray(np.asarray(out_ids)[None]), cache, batch,
        scheme="bf16", input_embeds=jnp.asarray(embeds[None]))
    got = np.asarray(logits[0], np.float32)

    # HF consumes the SAME tiles the mapper built: base view + 2 grid tiles
    base = _resize_bilinear(image01, SZ)
    tiles = [base, image01[:, :SZ], image01[:, SZ:]]
    batch_px = (np.stack(tiles) - _CLIP_MEAN) / _CLIP_STD
    pixel_values = torch.tensor(batch_px.transpose(0, 3, 1, 2)[None])
    input_ids = torch.tensor([text_pre + [IMG_TOKEN] * n_img + text_post])
    with torch.no_grad():
        want = hf(input_ids=input_ids, pixel_values=pixel_values,
                  image_sizes=torch.tensor([[SZ, 2 * SZ]])).logits[0].numpy()

    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.95, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.4, rtol=0.05)


def test_llava_next_unpad_tall_image():
    """A tall image (64 x 32) exercises the row-unpad branch and the
    per-row newline count."""
    hf, hf_cfg = tiny_llava_next()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["LlavaNextForConditionalGeneration"]})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, cfg = load_hf_float(sd, cfg)
    rng = np.random.default_rng(1)
    image01 = rng.uniform(0.0, 1.0, size=(2 * SZ, SZ, 3)).astype(np.float32)
    out_ids, embeds = splice_image_embeds(params, cfg, [IMG_TOKEN], [image01],
                                          IMG_TOKEN, arch="llava_next")
    h = SZ // PATCH
    n_img = h * h + (2 * h) * (h + 1)   # grid 2x1 -> 2h rows of h + newline
    assert len(out_ids) == n_img
    assert embeds.shape == (n_img, cfg.hidden_size)
