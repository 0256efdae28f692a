"""Small-M quantized-GEMM tile sweep on the chip — chained-trunk form.

Per-region timing (exp36) put the 8B trunk GEMMs at 5.219 ms vs a 4.261 ms
weight floor (669 GB/s effective of ~819). Single-kernel timings are useless
through the axon tunnel (~500 us fixed dispatch per un-jitted call), so this
measures the PRODUCTION form only: a fori_loop of trunks (4 GEMMs x 32
layers, stacked weights with in-kernel layer indexing), timed differentially
(T(2N)-T(N))/N to cancel RTT + dispatch, sweeping one shape's N-tile width
at a time while the others keep the production chooser.

Run alone on the chip: python scratch/exp40_gemm_sweep.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from qspec_tpu.ops import linear_kernels as lk
from qspec_tpu.ops.packing import quantize_weight_int4

# 8B shapes: qkv [4096 -> 6144], o [4096 -> 4096], gate_up [4096 -> 28672],
# down [14336 -> 4096]
SHAPES = [("qkv", 4096, 6144), ("o", 4096, 4096),
          ("gate_up", 4096, 28672), ("down", 14336, 4096)]
M = 8
L = 32
N_CHAIN = 8
HBM = 819e9


def main():
    rng = np.random.default_rng(0)
    packs = {}
    for name, K, N in SHAPES:
        ws = [quantize_weight_int4(
            rng.standard_normal((K, N)).astype(np.float32) * 0.02)
            for _ in range(L)]
        packs[name] = (jnp.stack([jnp.asarray(a) for a, _ in ws]),
                       jnp.stack([jnp.asarray(b) for _, b in ws]))
    total_bytes = sum(K // 2 * N for _, K, N in SHAPES) * L
    x1 = jnp.asarray(rng.standard_normal((M, 4096)), jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal((M, 14336)), jnp.bfloat16)

    def make_loop(n):
        # packs passed as ARGUMENTS (closing them over the jit would ship
        # 3.5 GB of HLO constants through the remote compile service)
        @jax.jit
        def run(packs, x1, x2):
            def body(li_outer, carry):
                x1, x2 = carry
                s = jnp.float32(0)
                for li in range(L):
                    for name, K, N in SHAPES:
                        qw, qs = packs[name]
                        xin = x1 if K == 4096 else x2
                        o = lk.matmul_w4a16(xin, qw, qs,
                                            layer_idx=jnp.asarray(li))
                        s = s + o.sum().astype(jnp.float32)
                eps = s * 1e-20
                return (x1 + eps.astype(x1.dtype),
                        x2 + eps.astype(x2.dtype))
            return jax.lax.fori_loop(0, n, body, (x1, x2))
        return run

    def timed_trunk():
        fN, f2N = make_loop(N_CHAIN), make_loop(2 * N_CHAIN)
        jax.device_get(fN(packs, x1, x2))
        jax.device_get(f2N(packs, x1, x2))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(fN(packs, x1, x2))
            t1 = time.perf_counter()
            jax.device_get(f2N(packs, x1, x2))
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / N_CHAIN)
        return float(np.median(ts))

    orig = lk._choose_bn
    print(f"# trunk = 4 GEMMs x {L} layers, M={M}, chain N={N_CHAIN}; "
          f"floor {total_bytes/HBM*1e3:.3f} ms", flush=True)
    t = timed_trunk()
    print(f"default chooser: {t*1e3:7.3f} ms  {total_bytes/t/1e9:6.1f} GB/s",
          flush=True)

    # sweep one shape's bn at a time (others stay on the chooser);
    # gate_up+down carry 88 of the 109 MB/layer, so sweep only those two
    # (each config costs two remote compiles through the tunnel)
    for sweep_name, K, N in SHAPES:
        if sweep_name in ("qkv", "o"):
            continue
        k_half = K // 2
        for bn in (256, 512, 1024, 2048):
            if N % bn:
                continue
            if 2 * k_half * bn > 15 * 1024 * 1024:   # scoped-vmem guard
                continue

            def patched(m, kh, n, xb, _bn=bn, _kh=k_half, _n=N):
                if kh == _kh and n == _n:
                    return _bn
                return orig(m, kh, n, xb)

            lk._choose_bn = patched
            try:
                t = timed_trunk()
                print(f"{sweep_name} bn={bn:5d}: {t*1e3:7.3f} ms  "
                      f"{total_bytes/t/1e9:6.1f} GB/s", flush=True)
            finally:
                lk._choose_bn = orig


if __name__ == "__main__":
    main()
