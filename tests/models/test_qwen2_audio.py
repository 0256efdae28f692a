"""HF-golden tests for the Qwen2-Audio family: whisper-encoder audio
tower + AvgPool1d(2) + single-linear projector into the qwen2 trunk —
the audio-tower-into-LM convention (reference
vllm/model_executor/models/qwen2_audio.py).
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

AUDIO_TOKEN = 200
N_MEL = 16
T_MEL = 40          # conv2 stride 2 -> 20 frames; avg-pool -> 10 rows


def tiny_qwen2_audio():
    cfg = transformers.Qwen2AudioConfig(
        # HF asserts mel length == 2 * max_source_positions exactly
        audio_config=dict(d_model=32, encoder_layers=2,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          num_mel_bins=N_MEL, max_source_positions=T_MEL // 2),
        text_config=dict(model_type="qwen2", vocab_size=256, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, rope_theta=10000.0),
        audio_token_index=AUDIO_TOKEN)
    torch.manual_seed(0)
    hf = transformers.Qwen2AudioForConditionalGeneration(cfg).eval()
    return hf, cfg


def test_qwen2_audio_vs_hf():
    hf, hf_cfg = tiny_qwen2_audio()
    cfg = resolve({**hf_cfg.to_dict(),
                   "architectures": ["Qwen2AudioForConditionalGeneration"]})
    assert cfg.arch == "qwen2_audio"
    assert cfg.audio is not None and cfg.audio.num_mel == N_MEL
    assert cfg.image_token_id == AUDIO_TOKEN   # audio rides the mm path

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, cfg = load_hf_float(sd, cfg)
    assert "audio_tower" in params and "w" in params["mm_projector"]

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((N_MEL, T_MEL)).astype(np.float32)  # HF layout
    n_audio = T_MEL // 4            # stride-2 conv then avg-pool(2)
    text_pre = [2, 9, 17]
    text_post = [5, 11, 20, 3]
    prompt = text_pre + [AUDIO_TOKEN] + text_post

    out_ids, embeds = splice_image_embeds(params, cfg, prompt, [mel],
                                          AUDIO_TOKEN, arch="qwen2_audio")
    T = len(out_ids)
    assert T == len(text_pre) + n_audio + len(text_post)

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

    input_ids = torch.tensor([text_pre + [AUDIO_TOKEN] * n_audio + text_post])
    with torch.no_grad():
        want = hf(input_ids=input_ids,
                  input_features=torch.tensor(mel[None]),
                  feature_attention_mask=torch.ones((1, T_MEL),
                                                    dtype=torch.long)
                  ).logits[0].numpy()

    top2 = np.sort(want, axis=-1)
    tied = (top2[:, -1] - top2[:, -2]) < 0.01
    agree = (got.argmax(-1) == want.argmax(-1)) | tied
    assert agree.mean() > 0.9, (got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.4, rtol=0.06)
