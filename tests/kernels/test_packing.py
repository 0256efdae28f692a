"""Round-trip and layout tests for packed-int4 weights (mirrors the numeric
kernel-vs-reference style of /root/reference/tests/kernels/)."""

import numpy as np
import pytest

from qspec_tpu.ops import packing


@pytest.mark.parametrize("shape", [(8, 16), (256, 128), (14336, 64)])
def test_pack_unpack_roundtrip_np(rng, shape):
    w = rng.integers(-8, 8, size=shape).astype(np.int8)
    packed = packing.pack_int4_np(w)
    assert packed.shape == (shape[0] // 8, shape[1])
    assert packed.dtype == np.int32
    out = packing.unpack_int4_np(packed)
    np.testing.assert_array_equal(out, w)


def test_pack_unpack_roundtrip_jnp(rng):
    import jax.numpy as jnp

    w = rng.integers(-8, 8, size=(64, 32)).astype(np.int8)
    packed = packing.pack_int4(jnp.asarray(w))
    out = np.asarray(packing.unpack_int4(packed))
    np.testing.assert_array_equal(out, w)
    # halves planes
    lo = np.asarray(packing.unpack_int4_low(packed))
    hi = np.asarray(packing.unpack_int4_high(packed))
    np.testing.assert_array_equal(lo, w[:32])
    np.testing.assert_array_equal(hi, w[32:])


def test_quantize_weight_int4(rng):
    w = rng.standard_normal((128, 64)).astype(np.float32)
    packed, scales = packing.quantize_weight_int4(w)
    deq = packing.unpack_int4_np(packed).astype(np.float32) * scales[None, :]
    # max error is half a quantization step per channel
    step = scales[None, :]
    assert np.all(np.abs(deq - w) <= 0.5 * step + 1e-6)


def test_repack_from_reference(rng):
    # reference layout: [out, in//2], byte c = (low: pos 2c, high: pos 2c+1)
    out_f, in_f = 16, 32
    w = rng.integers(-8, 8, size=(in_f, out_f)).astype(np.int8)  # logical [in, out]
    ref = np.zeros((out_f, in_f // 2), dtype=np.uint8)
    for o in range(out_f):
        for c in range(in_f // 2):
            ref[o, c] = (w[2 * c, o] & 0x0F) | ((w[2 * c + 1, o] & 0x0F) << 4)
    ours = packing.repack_from_reference(ref)
    np.testing.assert_array_equal(packing.unpack_int4_np(ours), w)
