"""Quantized-pytree checkpoint save/load (sharded-state analogue)."""

import tempfile

import numpy as np
import pytest


def test_checkpoint_roundtrip():
    pytest.importorskip("orbax.checkpoint")
    import jax

    from qspec_tpu.config import ModelConfig
    from qspec_tpu.model_loader.checkpoint import (is_qspec_checkpoint,
                                                   load_checkpoint,
                                                   save_checkpoint)
    from qspec_tpu.models.llama import init_params

    cfg = ModelConfig.tiny(quant="w4")
    params = init_params(cfg, seed=0)
    d = tempfile.mkdtemp()
    save_checkpoint(d, params, cfg)
    assert is_qspec_checkpoint(d)
    p2, cfg2 = load_checkpoint(d)
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
