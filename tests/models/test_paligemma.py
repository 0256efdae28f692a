"""HF-golden tests for the PaliGemma VLM family: SigLIP tower
(post_layernorm'd last_hidden_state) + single-linear projector + gemma
trunk, pixels normalized to [-1, 1].

Ground truth: transformers PaliGemmaForConditionalGeneration at tiny dims
with random weights (reference model file
vllm/model_executor/models/paligemma.py; the reference serves PaliGemma
with its standard CAUSAL decoder attention, so the HF side here gets an
explicit 4D causal mask — HF's own inference default is a bidirectional
prefix, a convention the reference does not implement either).
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

IMG_TOKEN = 61                 # inside the tiny vocab
IMAGE = 32
PATCH = 8                      # -> 16 patches, no CLS row


def tiny_paligemma():
    text_cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0)
    vision_cfg = transformers.SiglipVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=IMAGE, patch_size=PATCH)
    cfg = transformers.PaliGemmaConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=IMG_TOKEN, projection_dim=64)
    torch.manual_seed(0)
    hf = transformers.PaliGemmaForConditionalGeneration(cfg).eval()
    return hf, cfg


def test_paligemma_config_resolution():
    hf, hf_cfg = tiny_paligemma()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["PaliGemmaForConditionalGeneration"]})
    assert cfg.arch == "paligemma"
    assert cfg.vision is not None and cfg.vision.tower == "siglip"
    assert cfg.vision.post_norm and not cfg.vision.drop_cls
    assert cfg.image_token_id == IMG_TOKEN
    # gemma trunk knobs survive the wrap
    assert cfg.embed_scale == pytest.approx(64 ** 0.5)
    assert cfg.hidden_act == "gelu_tanh"


def test_paligemma_vs_hf():
    """Full-pipeline parity (tower + projector + splice + gemma trunk) vs
    the HF forward under the same causal mask."""
    hf, hf_cfg = tiny_paligemma()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["PaliGemmaForConditionalGeneration"]})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, cfg = load_hf_float(sd, cfg)
    assert "vision" in params
    assert "w" in params["mm_projector"]          # single-linear projector
    assert "post_norm" in params["vision"]

    rng = np.random.default_rng(0)
    image01 = rng.uniform(0.0, 1.0, size=(IMAGE, IMAGE, 3)).astype(np.float32)
    n_img = cfg.vision.num_patches
    text_pre = [2, 9, 17]
    text_post = [5, 11, 20, 3]
    prompt = text_pre + [IMG_TOKEN] + text_post

    out_ids, embeds = splice_image_embeds(params, cfg, prompt, [image01],
                                          IMG_TOKEN, arch="paligemma")
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

    # HF: identical normalized pixels, placeholder pre-expanded, and an
    # explicit 4D additive CAUSAL mask (HF inference otherwise unmasks the
    # whole prefix bidirectionally — modeling_paligemma._update_causal_mask)
    pixel_values = torch.tensor(((image01 - 0.5) / 0.5)
                                .transpose(2, 0, 1)[None])
    input_ids = torch.tensor([text_pre + [IMG_TOKEN] * n_img + text_post])
    causal = torch.full((1, 1, T, T), torch.finfo(torch.float32).min)
    causal = torch.triu(causal, diagonal=1)
    with torch.no_grad():
        want = hf(input_ids=input_ids, pixel_values=pixel_values,
                  attention_mask=causal).logits[0].numpy()

    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.95, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.4, rtol=0.05)


def test_paligemma_engine_image_request():
    """Engine e2e: image request through the prompt-embeds path,
    deterministic across identical requests."""
    from qspec_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from qspec_tpu.engine.llm_engine import LLMEngine
    from qspec_tpu.sampling_params import SamplingParams

    hf, hf_cfg = tiny_paligemma()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["PaliGemmaForConditionalGeneration"]})
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
    out = {}
    rids = []
    for _ in range(2):
        rids.append(eng.add_request(
            prompt, SamplingParams(temperature=0.0, max_tokens=8,
                                   ignore_eos=True),
            mm_images=[image01], image_token_id=cfg.image_token_id))
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    out[o.request_id] = o.output_token_ids
    assert len(out[rids[0]]) == 8
    assert out[rids[0]] == out[rids[1]]
