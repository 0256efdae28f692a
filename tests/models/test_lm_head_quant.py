"""Quantized lm_head (ModelConfig.lm_head_quant): int8/int4 heads must
reproduce the bf16 head's logits up to quantization noise, and greedy
choices should almost always agree on well-separated logits.

Reference context: the vLLM fork always runs the vocab projection in fp16
(vllm/model_executor/layers/logits_processor.py); we add a W8/W4 head
because at decode-M the dense bf16 head streams ~1 GB/step on Llama-3's
128k vocab (see ops/linear_kernels.matmul_w8a16).
"""

import numpy as np
import jax.numpy as jnp

from qspec_tpu.config import ModelConfig
from qspec_tpu.models.llama import AttentionBatch, init_params, model_forward
from qspec_tpu.ops import kv_cache as kvc


def _run(cfg, tokens):
    params = init_params(cfg, seed=3)
    T = len(tokens)
    kv_cfg = kvc.KVCacheConfig(num_layers=cfg.num_layers,
                               num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim, num_pages=8, page_size=16)
    cache = kvc.allocate(kv_cfg)
    batch = AttentionBatch(
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=(jnp.arange(T, dtype=jnp.int32) + 16)[None, :],
        block_tables=jnp.asarray([[1, 2]], jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32))
    logits, _ = model_forward(params, cfg, jnp.asarray(np.asarray(tokens)[None]),
                              cache, batch, scheme="w4a16")
    return np.asarray(logits[0], np.float32)


def test_auto_resolution():
    assert ModelConfig.tiny().resolved_lm_head_quant == "int8"
    assert ModelConfig.tiny(quant="none").resolved_lm_head_quant == "bf16"
    assert ModelConfig.tiny(lm_head_quant="int4").resolved_lm_head_quant == "int4"
    assert ModelConfig.tiny(lm_head_quant="bf16").resolved_lm_head_quant == "bf16"


def test_int8_head_close_to_bf16():
    tokens = list(range(1, 13))
    base = _run(ModelConfig.tiny(lm_head_quant="bf16"), tokens)
    q8 = _run(ModelConfig.tiny(lm_head_quant="int8"), tokens)
    # per-channel int8 on a [256, 512] head: tiny relative error
    denom = np.maximum(np.abs(base).max(), 1e-3)
    assert np.max(np.abs(q8 - base)) / denom < 0.02
    # top-1 agreement on nearly every position
    agree = (q8.argmax(-1) == base.argmax(-1)).mean()
    assert agree >= 0.9


def test_int4_head_structure():
    tokens = list(range(1, 9))
    q4 = _run(ModelConfig.tiny(lm_head_quant="int4"), tokens)
    base = _run(ModelConfig.tiny(lm_head_quant="bf16"), tokens)
    assert q4.shape == base.shape
    denom = np.maximum(np.abs(base).max(), 1e-3)
    assert np.max(np.abs(q4 - base)) / denom < 0.3
