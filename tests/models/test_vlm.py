"""HF-golden tests for the LLaVA VLM family (vision tower + projector +
LM trunk) and the engine-level image path.

Ground truth: transformers LlavaForConditionalGeneration at tiny dims
with random weights (reference test pattern: tests/models/ HfRunner vs
VllmRunner; reference model file vllm/model_executor/models/llava.py +
clip.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qspec_tpu.models.registry import resolve  # noqa: E402
from qspec_tpu.model_loader.loader import load_hf_float  # noqa: E402
from qspec_tpu.multimodal import (_CLIP_MEAN, _CLIP_STD,  # noqa: E402
                                  splice_image_embeds)
from qspec_tpu.ops import kv_cache as kvc  # noqa: E402
from qspec_tpu.models.llama import AttentionBatch, model_forward  # noqa: E402

IMG_TOKEN = 31                 # inside the tiny vocab
IMAGE = 32                     # image_size
PATCH = 8                      # -> 16 patches


def tiny_llava():
    text_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False)
    vision_cfg = transformers.CLIPVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=IMAGE, patch_size=PATCH,
        projection_dim=32)
    cfg = transformers.LlavaConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=IMG_TOKEN, vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    hf = transformers.LlavaForConditionalGeneration(cfg).eval()
    return hf, cfg


def test_llava_vs_hf():
    """Full pipeline parity: our tower+projector+splice+trunk vs the HF
    forward on the same normalized pixels."""
    hf, hf_cfg = tiny_llava()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["LlavaForConditionalGeneration"]})
    assert cfg.arch == "llava" and cfg.vision is not None
    assert cfg.image_token_id == IMG_TOKEN
    assert cfg.vision.num_patches == (IMAGE // PATCH) ** 2

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, cfg = load_hf_float(sd, cfg)
    assert "vision" in params and "w1" in params["mm_projector"]

    rng = np.random.default_rng(0)
    image01 = rng.uniform(0.0, 1.0, size=(IMAGE, IMAGE, 3)).astype(np.float32)
    n_img = cfg.vision.num_patches
    text_pre = [2, 9, 17]
    text_post = [5, 11, 20, 3]
    prompt = text_pre + [IMG_TOKEN] + text_post

    # ours: the serving path (mapper normalizes with CLIP mean/std)
    out_ids, embeds = splice_image_embeds(params, cfg, prompt, [image01],
                                          IMG_TOKEN, arch="llava")
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

    # HF: identical normalized pixels, placeholder pre-expanded
    pixel_values = torch.tensor(
        ((image01 - _CLIP_MEAN) / _CLIP_STD).transpose(2, 0, 1)[None])
    input_ids = torch.tensor(
        [text_pre + [IMG_TOKEN] * n_img + text_post])
    with torch.no_grad():
        want = hf(input_ids=input_ids,
                  pixel_values=pixel_values).logits[0].numpy()

    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.95, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.4, rtol=0.05)


def test_llava_engine_image_request():
    """Engine e2e: an image request through LLM.generate's
    multi_modal_data path matches the direct splice+forward output."""
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    hf, hf_cfg = tiny_llava()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["LlavaForConditionalGeneration"]})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, cfg = load_hf_float(sd, cfg)

    rng = np.random.default_rng(1)
    image01 = rng.uniform(0.0, 1.0, size=(40, 40, 3)).astype(np.float32)
    prompt = [2, 9, IMG_TOKEN, 5, 11]

    sched = SchedulerConfig(max_num_seqs=2, max_model_len=128,
                            prefill_chunk_size=64,
                            decode_batch_buckets=(2,),
                            prefill_token_buckets=(64,))
    eng = LLMEngine(EngineConfig(model=cfg, cache=CacheConfig(page_size=16),
                                 scheduler=sched), params)
    rid = eng.add_request(prompt,
                          SamplingParams(temperature=0.0, max_tokens=8,
                                         ignore_eos=True),
                          mm_images=[image01],
                          image_token_id=cfg.image_token_id)
    out = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                out[o.request_id] = o.output_token_ids
    assert len(out[rid]) == 8
    # determinism: same request again gives the same tokens
    rid2 = eng.add_request(prompt,
                           SamplingParams(temperature=0.0, max_tokens=8,
                                          ignore_eos=True),
                           mm_images=[image01],
                           image_token_id=cfg.image_token_id)
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                out[o.request_id] = o.output_token_ids
    assert out[rid2] == out[rid]


def test_vit_feature_layer_matches_hf_hidden_states():
    """vit_forward's feature_layer indexing == HF output_hidden_states."""
    from qspec_tpu.models.vit import convert_llava_tower, vit_forward

    hf, hf_cfg = tiny_llava()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["LlavaForConditionalGeneration"]})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    tower = convert_llava_tower(sd, cfg.vision)

    rng = np.random.default_rng(2)
    pix = rng.standard_normal((1, IMAGE, IMAGE, 3)).astype(np.float32)
    vt = hf.vision_tower if hasattr(hf, "vision_tower") \
        else hf.model.vision_tower
    with torch.no_grad():
        hs = vt(torch.tensor(pix.transpose(0, 3, 1, 2)),
                output_hidden_states=True).hidden_states
    for fl in (-2, -1, 1):
        got = np.asarray(vit_forward(tower["vision"], cfg.vision,
                                     jnp.asarray(pix), feature_layer=fl),
                         np.float32)
        want = hs[fl].numpy()
        np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_trained_captioner_end_to_end():
    """The in-image-trained shape captioner (benchmarks/train_vlm.py)
    serves through the SAME ingestion path as a downloaded checkpoint and
    genuinely describes fresh images ("a COLOR SHAPE")."""
    import glob
    import json
    import os

    ck = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                       "..", "checkpoints",
                                       "vlm_shapes_v*.npz")))
    if not ck:
        pytest.skip("no trained VLM checkpoint (run benchmarks/train_vlm.py)")
    base = ck[-1][:-len(".npz")]
    with open(base + ".json") as f:
        meta = json.load(f)
    cfg = resolve(meta["hf_config"])
    params, cfg = load_hf_float(dict(np.load(base + ".npz")), cfg)

    from benchmarks.train_vlm import (BOS, COLORS, SHAPES, draw_shape)
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    sched = SchedulerConfig(max_num_seqs=8, max_model_len=64,
                            prefill_chunk_size=32,
                            decode_batch_buckets=(8,),
                            prefill_token_buckets=(32,))
    eng = LLMEngine(EngineConfig(model=cfg, cache=CacheConfig(page_size=16),
                                 scheduler=sched), params)
    rng = np.random.default_rng(777)   # fresh, never-trained images
    want = {}
    for _ in range(8):
        img, color, shape = draw_shape(rng)
        rid = eng.add_request([BOS, cfg.image_token_id],
                              SamplingParams(temperature=0.0, max_tokens=3,
                                             ignore_eos=True),
                              mm_images=[img],
                              image_token_id=cfg.image_token_id)
        want[rid] = [3, COLORS[color], SHAPES[shape]]   # "a COLOR SHAPE"
    got = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                got[o.request_id] = o.output_token_ids
    correct = sum(got[r] == want[r] for r in want)
    assert correct >= 7, (correct, got, want)


def test_llava_siglip_tower_vs_hf():
    """LLaVA with a SigLIP tower (conv bias, no CLS, no pre-LN,
    gelu_tanh MLP) — full-pipeline parity vs HF (reference:
    vllm models/siglip.py tower option)."""
    text_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    vision_cfg = transformers.SiglipVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=IMAGE, patch_size=PATCH)
    cfg_hf = transformers.LlavaConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=IMG_TOKEN, vision_feature_layer=-1,
        vision_feature_select_strategy="full")
    torch.manual_seed(0)
    hf = transformers.LlavaForConditionalGeneration(cfg_hf).eval()
    cfg = resolve({**cfg_hf.to_dict(),
                   "architectures": ["LlavaForConditionalGeneration"]})
    assert cfg.vision.tower == "siglip"
    assert cfg.vision.hidden_act == "gelu_pytorch_tanh"
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, cfg = load_hf_float(sd, cfg)
    assert "patch_bias" in params["vision"]
    assert "cls_embed" not in params["vision"]

    rng = np.random.default_rng(4)
    image01 = rng.uniform(0.0, 1.0, size=(IMAGE, IMAGE, 3)).astype(np.float32)
    n_img = cfg.vision.num_patches
    prompt = [2, 9, IMG_TOKEN, 5, 11]
    out_ids, embeds = splice_image_embeds(params, cfg, prompt, [image01],
                                          IMG_TOKEN, arch="llava")
    T = len(out_ids)
    assert T == 4 + n_img
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

    pixel_values = torch.tensor(
        ((image01 - _CLIP_MEAN) / _CLIP_STD).transpose(2, 0, 1)[None])
    input_ids = torch.tensor([[2, 9] + [IMG_TOKEN] * n_img + [5, 11]])
    with torch.no_grad():
        want = hf(input_ids=input_ids,
                  pixel_values=pixel_values).logits[0].numpy()
    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.95, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.4, rtol=0.05)
