"""HF-golden test for the Chameleon early-fusion family (reference
vllm/model_executor/models/chameleon.py): llama graph + per-head q/k
LayerNorm with bias ([num_heads, head_dim] affine, applied before rope).
Image tokens live IN the text vocab (VQ-VAE codebook), so text-trunk
parity covers the serving path for pre-quantized image tokens too.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from qspec_tpu.models.registry import resolve  # noqa: E402

from .test_zoo_round5 import check  # noqa: E402

# a tiny VQ config the HF constructor accepts (GroupNorm needs
# channels % 32 == 0); the VQ tower's weights are ignored by our loader
TINY_VQ = dict(embed_dim=8, num_embeddings=16, latent_channels=8,
               resolution=32, in_channels=3, base_channels=32,
               channel_multiplier=[1, 1], double_latent=False,
               num_res_blocks=1, attn_resolutions=[])


def tiny_chameleon(**over):
    cfg = transformers.ChameleonConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        vocabulary_map={"<image>": 200}, vq_config=dict(TINY_VQ), **over)
    torch.manual_seed(0)
    return transformers.ChameleonForConditionalGeneration(cfg).eval(), cfg


def test_chameleon_vs_hf():
    hf, hf_cfg = tiny_chameleon()
    cfg = check(hf, {**hf_cfg.to_dict(),
                     "architectures": ["ChameleonForConditionalGeneration"]},
                loader="hf")
    assert cfg.arch == "chameleon"
    assert cfg.qk_norm and cfg.qk_norm_style == "head_ln"
    assert cfg.num_kv_heads == 2          # per-head LN gammas differ per head


def test_chameleon_resolution_knobs():
    cfg = resolve({"architectures": ["ChameleonForCausalLM"],
                   "vocab_size": 100, "hidden_size": 64,
                   "intermediate_size": 128, "num_hidden_layers": 2,
                   "num_attention_heads": 4, "swin_norm": True})
    # swin_norm (30B) = norms AFTER the blocks, no input norms
    assert not cfg.pre_norms and cfg.post_norms
