"""Online Hadamard rotation, TPU-native.

QuaRot suppresses activation outliers before o_proj / down_proj by applying a
scaled Hadamard transform H_n / sqrt(n) where n = K * 2^k and
H_n = H_K (x) H_{2^k} (Kronecker). The reference implements the 2^k part with
a CUDA fast-Walsh butterfly kernel and the K part as a small matmul against a
vendored +-1 table (/root/reference/third-party/QuaRot/quarot/functional/
hadamard.py:94-123 `opt_matmul_hadU_cuda`; tables in
/root/reference/vllm/model_executor/layers/quarot_nn/functional/hadamard.py).

On TPU the butterfly is the wrong shape: log2(n) VPU passes over the data vs
a single MXU matmul. We instead evaluate both Kronecker factors as matmuls —
for n = 14336 = 28 * 512 that is one [*, 512]x[512, 512] and one
[28, 28]x[28, *] contraction, both of which tile perfectly onto the 128x128
systolic array and are trivially fused by XLA into neighbouring ops.

Instead of vendoring +-1 tables we *construct* the non-power-of-two factors:
Sylvester (2^k), Paley I (q = K-1 prime power, q % 4 == 3 — covers K = 12,
20, 28, 44, 60, 108, 140) and Paley II (q = K/2 - 1 prime power, q % 4 == 1
— covers K = 36, 52, 148). Every matrix is verified H @ H.T = n*I at build
time.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

__all__ = ["hadamard_matrix", "decompose_dim", "hadamard_transform", "random_hadamard_matrix"]


def _sylvester(k: int) -> np.ndarray:
    h = np.array([[1]], dtype=np.int64)
    while h.shape[0] < k:
        h = np.block([[h, h], [h, -h]])
    assert h.shape[0] == k
    return h


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in range(2, int(math.isqrt(n)) + 1):
        if n % p == 0:
            return False
    return True


def _prime_power(q: int):
    """Return (p, m) with q = p^m if q is a prime power, else None."""
    for p in range(2, int(math.isqrt(q)) + 1):
        if q % p == 0:
            m = 0
            while q % p == 0:
                q //= p
                m += 1
            return (p, m) if q == 1 and _is_prime(p) else None
    return (q, 1) if _is_prime(q) else None


def _gf_elements(p: int, m: int):
    """Multiplication table setup for GF(p^m): returns (elements, mul, add).

    Elements are tuples of coefficients (degree < m) over GF(p); arithmetic is
    polynomial arithmetic modulo an irreducible degree-m polynomial found by
    brute force.
    """
    import itertools

    if m == 1:
        elems = list(range(p))
        return elems, (lambda a, b: (a * b) % p), (lambda a, b: (a + b) % p)

    def polymul_mod(a, b, modpoly):
        # a, b: low-order-first coefficient tuples of length m
        res = [0] * (2 * m - 1)
        for i, ai in enumerate(a):
            if ai:
                for j, bj in enumerate(b):
                    res[i + j] = (res[i + j] + ai * bj) % p
        # reduce by modpoly (monic, degree m, low-order-first, length m+1)
        for d in range(2 * m - 2, m - 1, -1):
            c = res[d]
            if c:
                res[d] = 0
                for j in range(m):
                    res[d - m + j] = (res[d - m + j] - c * modpoly[j]) % p
        return tuple(res[:m])

    def polyadd(a, b):
        return tuple((x + y) % p for x, y in zip(a, b))

    def is_irreducible(modpoly):
        # no roots is necessary but not sufficient for m>3; use full check:
        # irreducible iff no factor of degree <= m//2. Brute-force trial
        # division over all monic polys of degree 1..m//2.
        def poly_mod(dividend, divisor):
            dividend = list(dividend)
            dd, dv = len(dividend) - 1, len(divisor) - 1
            inv = pow(divisor[-1], -1, p)
            for d in range(dd, dv - 1, -1):
                c = (dividend[d] * inv) % p
                if c:
                    for j in range(dv + 1):
                        dividend[d - dv + j] = (dividend[d - dv + j] - c * divisor[j]) % p
            return any(x % p for x in dividend[:dv])

        for deg in range(1, m // 2 + 1):
            for coeffs in itertools.product(range(p), repeat=deg):
                divisor = list(coeffs) + [1]
                if not poly_mod(list(modpoly), divisor):
                    return False
        return True

    modpoly = None
    for coeffs in itertools.product(range(p), repeat=m):
        cand = list(coeffs) + [1]
        if is_irreducible(cand):
            modpoly = cand
            break
    assert modpoly is not None

    elems = list(itertools.product(range(p), repeat=m))
    return elems, (lambda a, b: polymul_mod(a, b, modpoly)), polyadd


def _paley_core(q: int) -> np.ndarray:
    """Jacobsthal-style quadratic-character matrix Q for GF(q), shape [q, q]."""
    p, m = _prime_power(q)
    elems, mul, add = _gf_elements(p, m)
    idx = {e: i for i, e in enumerate(elems)}
    zero = elems[0] if isinstance(elems[0], int) else tuple([0] * m)
    squares = set()
    for e in elems:
        if e != zero:
            squares.add(mul(e, e))

    def neg(e):
        if isinstance(e, int):
            return (-e) % p
        return tuple((-c) % p for c in e)

    Q = np.zeros((q, q), dtype=np.int64)
    for i, a in enumerate(elems):
        for j, b in enumerate(elems):
            d = add(a, neg(b))
            if d == zero:
                chi = 0
            elif d in squares:
                chi = 1
            else:
                chi = -1
            Q[i, j] = chi
    return Q


def _paley1(q: int) -> np.ndarray:
    """Paley construction I: H_{q+1} for prime power q = 3 (mod 4)."""
    Q = _paley_core(q)
    n = q + 1
    H = np.ones((n, n), dtype=np.int64)
    H[1:, 1:] = Q + np.eye(q, dtype=np.int64)
    H[1:, 0] = -1
    return H


def _paley2(q: int) -> np.ndarray:
    """Paley construction II: H_{2(q+1)} for prime power q = 1 (mod 4)."""
    n = q + 1
    S = np.zeros((n, n), dtype=np.int64)
    S[0, 1:] = 1
    S[1:, 0] = 1
    S[1:, 1:] = _paley_core(q)
    H = np.zeros((2 * n, 2 * n), dtype=np.int64)
    # H = S (x) [[1,1],[1,-1]] + I (x) [[1,-1],[-1,-1]]
    A = np.array([[1, 1], [1, -1]], dtype=np.int64)
    Dg = np.array([[1, -1], [-1, -1]], dtype=np.int64)
    for i in range(n):
        for j in range(n):
            blk = S[i, j] * A + (Dg if i == j else 0)
            H[2 * i:2 * i + 2, 2 * j:2 * j + 2] = blk
    return H


@functools.lru_cache(maxsize=None)
def hadamard_matrix(n: int) -> np.ndarray:
    """Return an n x n {+-1} Hadamard matrix (unnormalized), verified."""
    if n == 1:
        return np.array([[1]], dtype=np.int64)
    if n == 2 or n % 4 == 0:
        H = None
        if n & (n - 1) == 0:
            H = _sylvester(n)
        elif _prime_power(n - 1) and (n - 1) % 4 == 3:
            H = _paley1(n - 1)
        elif n % 2 == 0 and _prime_power(n // 2 - 1) and (n // 2 - 1) % 4 == 1:
            H = _paley2(n // 2 - 1)
        else:
            # Composite fallback: n = a*b with both factors constructible.
            for a in range(2, int(math.isqrt(n)) + 1):
                if n % a == 0:
                    try:
                        Ha = hadamard_matrix(a)
                        Hb = hadamard_matrix(n // a)
                        H = np.kron(Ha, Hb)
                        break
                    except NotImplementedError:
                        continue
        if H is not None:
            assert (H @ H.T == n * np.eye(n, dtype=np.int64)).all(), f"bad H_{n}"
            return H
    raise NotImplementedError(f"no Hadamard construction for n={n}")


@functools.lru_cache(maxsize=None)
def decompose_dim(n: int) -> tuple[int, int]:
    """Split n = K * P with P a power of two <= 512 and K constructible.

    Mirrors the reference's get_hadK dispatch (third-party/QuaRot/quarot/
    functional/hadamard.py:6-60) but derived rather than table-driven, and
    with P capped at 512 so the dense factor matrices stay MXU-sized (a pure
    power-of-two n would otherwise materialize an n x n Sylvester matrix —
    H_{2^a} (x) H_{2^b} is the same transform at a fraction of the bytes).
    """
    k = 0
    K = n
    while K % 2 == 0 and n // K < 512:
        K //= 2
        k += 1
    # fold 2s back into K while K itself has no construction
    while True:
        try:
            hadamard_matrix(K)
            return K, n // K
        except NotImplementedError:
            if k == 0:
                raise
            K *= 2
            k -= 1


@functools.lru_cache(maxsize=None)
def _factors_f32(n: int):
    K, P = decompose_dim(n)
    hK = jnp.asarray(hadamard_matrix(K), jnp.float32)
    hP = jnp.asarray(hadamard_matrix(P), jnp.float32)
    return K, P, hK, hP


def hadamard_transform(x: jnp.ndarray, scale: float | None = None) -> jnp.ndarray:
    """Apply (H_K (x) H_P) * scale along the last dim (n = K * P).

    Default scale is 1/sqrt(n) (orthonormal), matching the reference's
    1/sqrt(32) head rotation and 1/sqrt(14336) MLP rotation
    (quarot_nn/hadamard.py:13-14).
    """
    n = x.shape[-1]
    K, P, hK, hP = _factors_f32(n)
    if scale is None:
        scale = 1.0 / math.sqrt(n)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (K, P))
    xf = jnp.einsum("...kp,pq->...kq", xf, hP, preferred_element_type=jnp.float32)
    if K > 1:
        xf = jnp.einsum("jk,...kp->...jp", hK, xf, preferred_element_type=jnp.float32)
    return (xf.reshape(x.shape) * scale).astype(orig_dtype)


def random_hadamard_matrix(n: int, seed: int = 0) -> np.ndarray:
    """Randomized orthonormal Hadamard Q = H_n * diag(+-1) / sqrt(n).

    Used offline when rotating float checkpoints into the QuaRot basis
    (reference third-party/QuaRot/quarot/functional/hadamard.py:84-91).
    """
    rng = np.random.default_rng(seed)
    d = rng.integers(0, 2, size=n) * 2 - 1
    K, P = decompose_dim(n)
    H = np.kron(hadamard_matrix(K), hadamard_matrix(P)).astype(np.float64)
    return (H * d[None, :]) / math.sqrt(n)
