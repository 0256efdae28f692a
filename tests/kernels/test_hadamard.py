"""Hadamard construction + transform tests.

The reference ships 4,221 lines of vendored +-1 tables
(vllm/model_executor/layers/quarot_nn/functional/hadamard.py); we construct
and verify the matrices instead, so the tests assert orthogonality and the
Kronecker-transform semantics of matmul_hadU (QuaRot hadamard.py:94-123).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from qspec_tpu.ops.hadamard import (decompose_dim, hadamard_matrix,
                                    hadamard_transform, random_hadamard_matrix)


@pytest.mark.parametrize("n", [1, 2, 4, 12, 20, 28, 32, 36, 44, 52, 60, 64, 128])
def test_hadamard_orthogonal(n):
    H = hadamard_matrix(n)
    assert set(np.unique(H)) <= {-1, 1}
    np.testing.assert_array_equal(H @ H.T, n * np.eye(n, dtype=np.int64))


@pytest.mark.parametrize("n,expected_K", [
    (14336, 28),   # llama-3-8b intermediate = 28 * 512
    (28672, 28),   # llama-3-70b intermediate (28 * 1024 -> 56 * 512)
    (18944, 148),  # qwen2-7b intermediate = 148 * 128
    (32, None), (4096, None), (8192, None),
])
def test_decompose_dim(n, expected_K):
    K, P = decompose_dim(n)
    assert K * P == n
    assert P <= 512 and P & (P - 1) == 0  # pow2, MXU-sized
    if expected_K is not None:
        assert K % expected_K == 0 or K == expected_K
    hadamard_matrix(K)  # constructible


def test_transform_is_orthonormal(rng):
    for n in [32, 64, 448, 1792]:  # 448 = 28 * 16
        x = jnp.asarray(rng.standard_normal((4, n)).astype(np.float32))
        y = hadamard_transform(x)
        # orthonormal: preserves norms
        np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                                   np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-4)
        # self-inverse up to transpose: H/sqrt(n) is orthogonal and symmetric
        # only for Sylvester; check round-trip via explicit matrix instead
        K, P = decompose_dim(n)
        Hfull = np.kron(hadamard_matrix(K), hadamard_matrix(P)) / math.sqrt(n)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ Hfull.T,
                                   rtol=1e-3, atol=1e-3)


def test_random_hadamard_orthogonal():
    Q = random_hadamard_matrix(448, seed=3)
    np.testing.assert_allclose(Q @ Q.T, np.eye(448), atol=1e-8)
