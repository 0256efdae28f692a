"""HF-golden tests for the Fuyu family: NO vision tower — raw pixel
patches project through one linear (vision_embed_tokens) into the
persimmon trunk (reference vllm/model_executor/models/fuyu.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.model_loader.families import load_family_float  # noqa: E402
from qspec_tpu.multimodal import splice_image_embeds  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402

IMG_TOKEN = 200
PATCH = 8
IMAGE = 16                     # -> 4 patches


def tiny_fuyu():
    cfg = transformers.FuyuConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, patch_size=PATCH,
        image_token_id=IMG_TOKEN)
    torch.manual_seed(0)
    hf = transformers.FuyuForCausalLM(cfg).eval()
    return hf, cfg


def test_fuyu_vs_hf():
    hf, hf_cfg = tiny_fuyu()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["FuyuForCausalLM"]})
    assert cfg.arch == "fuyu" and cfg.image_token_id == IMG_TOKEN
    assert cfg.vision.patch_size == PATCH
    assert cfg.qk_norm and cfg.qk_norm_style == "head_ln"

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, cfg = load_family_float(sd, cfg)
    assert "w" in params["mm_projector"]

    rng = np.random.default_rng(0)
    image01 = rng.uniform(0.0, 1.0, size=(IMAGE, IMAGE, 3)).astype(np.float32)
    n_img = (IMAGE // PATCH) ** 2
    text_pre = [2, 9, 17]
    text_post = [5, 11, 20, 3]
    prompt = text_pre + [IMG_TOKEN] + text_post

    out_ids, embeds = splice_image_embeds(params, cfg, prompt, [image01],
                                          IMG_TOKEN, arch="fuyu")
    T = len(out_ids)
    assert T == len(text_pre) + n_img + len(text_post)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.cache_kv_heads,
                               head_dim=cfg.cache_head_dim, num_pages=8,
                               page_size=32)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 32)[None, :],
        block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    logits, _ = model_forward(
        params, cfg, jnp.asarray(np.asarray(out_ids)[None]), cache, batch,
        scheme="bf16", input_embeds=jnp.asarray(embeds[None]))
    got = np.asarray(logits[0], np.float32)

    # HF: the SAME normalized patches ((x-0.5)/0.5, (py,px,c) flatten via
    # FuyuImageProcessor.patchify_image's unfold order), placeholder
    # positions pre-expanded with image_patches_indices
    norm = (image01 - 0.5) / 0.5
    pt = torch.tensor(norm.transpose(2, 0, 1))[None]          # [1, C, H, W]
    patches = pt.unfold(2, PATCH, PATCH).unfold(3, PATCH, PATCH)
    patches = patches.permute(0, 2, 3, 4, 5, 1)    # [1, py, px, ph, pw, C]
    patches = patches.reshape(1, n_img, PATCH * PATCH * 3)
    input_ids = torch.tensor([text_pre + [IMG_TOKEN] * n_img + text_post])
    idx = torch.full((1, T), -1, dtype=torch.long)
    idx[0, len(text_pre):len(text_pre) + n_img] = torch.arange(n_img)
    with torch.no_grad():
        want = hf(input_ids=input_ids, image_patches=patches,
                  image_patches_indices=idx).logits[0].numpy()

    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.9, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.4, rtol=0.06)
