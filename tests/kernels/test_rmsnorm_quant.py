"""Fused RMSNorm(+quant) kernel vs reference semantics (mirrors
/root/reference/tests/kernels/test_fused_quant_layernorm.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qspec_tpu.ops.rmsnorm_quant import (rmsnorm, rmsnorm_quant,
                                         rmsnorm_quant_ref, rmsnorm_ref)


@pytest.mark.parametrize("m,h", [(1, 256), (9, 1024), (64, 4096)])
def test_rmsnorm_matches_ref(rng, m, h):
    x = jnp.asarray(rng.standard_normal((m, h)).astype(np.float32), jnp.bfloat16)
    gamma = jnp.asarray(rng.standard_normal(h).astype(np.float32), jnp.bfloat16)
    out = rmsnorm(x, gamma)
    ref = rmsnorm_ref(x, gamma)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("m,h", [(1, 256), (13, 1024)])
def test_rmsnorm_quant_matches_ref(rng, bits, m, h):
    x = jnp.asarray(rng.standard_normal((m, h)).astype(np.float32), jnp.bfloat16)
    out = rmsnorm_quant(x, bits=bits)
    ref = rmsnorm_quant_ref(x, bits=bits)
    np.testing.assert_allclose(np.asarray(out.scales), np.asarray(ref.scales),
                               rtol=1e-3)
    # quantized values may differ by 1 ulp at rounding boundaries
    diff = np.abs(np.asarray(out.values, np.int32) - np.asarray(ref.values, np.int32))
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.99


def test_rmsnorm_quant_range(rng):
    x = jnp.asarray(rng.standard_normal((8, 512)).astype(np.float32) * 100)
    q4 = rmsnorm_quant(x, bits=4)
    assert np.asarray(q4.values).min() >= -8 and np.asarray(q4.values).max() <= 7
    q8 = rmsnorm_quant(x, bits=8)
    assert np.asarray(q8.values).min() >= -128 and np.asarray(q8.values).max() <= 127
