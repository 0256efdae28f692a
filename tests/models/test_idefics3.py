"""HF-golden tests for the Idefics3/SmolVLM family: SigLIP tower +
pixel-shuffle connector + bias-free linear into the llama trunk
(reference vllm/model_executor/models/idefics3.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.model_loader.loader import load_hf_float  # noqa: E402
from qspec_tpu.multimodal import splice_image_embeds  # noqa: E402
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402

IMG_TOKEN = 50
IMAGE = 32
PATCH = 8                      # -> 4x4 patch grid; sf=2 -> 4 rows


def tiny_idefics3():
    cfg = transformers.Idefics3Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=IMAGE, patch_size=PATCH),
        text_config=dict(model_type="llama", vocab_size=256, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, rope_theta=10000.0,
                         tie_word_embeddings=False),
        scale_factor=2, image_token_id=IMG_TOKEN)
    torch.manual_seed(0)
    hf = transformers.Idefics3ForConditionalGeneration(cfg).eval()
    return hf, cfg


def test_idefics3_vs_hf():
    hf, hf_cfg = tiny_idefics3()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["Idefics3ForConditionalGeneration"]})
    assert cfg.arch == "idefics3"
    assert cfg.vision.pixel_shuffle == 2 and cfg.vision.post_norm
    assert cfg.image_token_id == IMG_TOKEN

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, cfg = load_hf_float(sd, cfg)
    assert "post_norm" in params["vision"]
    assert "w" in params["mm_projector"]

    rng = np.random.default_rng(0)
    image01 = rng.uniform(0.0, 1.0, size=(IMAGE, IMAGE, 3)).astype(np.float32)
    n_img = (IMAGE // PATCH) ** 2 // 4          # pixel shuffle sf^2
    text_pre = [2, 9, 17]
    text_post = [5, 11, 20, 3]
    prompt = text_pre + [IMG_TOKEN] + text_post

    out_ids, embeds = splice_image_embeds(params, cfg, prompt, [image01],
                                          IMG_TOKEN, arch="idefics3")
    T = len(out_ids)
    assert T == len(text_pre) + n_img + len(text_post)

    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8,
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

    pixel_values = torch.tensor(((image01 - 0.5) / 0.5)
                                .transpose(2, 0, 1)[None, None])
    input_ids = torch.tensor([text_pre + [IMG_TOKEN] * n_img + text_post])
    with torch.no_grad():
        want = hf(input_ids=input_ids,
                  pixel_values=pixel_values).logits[0].numpy()

    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.9, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.4, rtol=0.06)
