import time, numpy as np, jax, jax.numpy as jnp, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()

# SWAR unpack test: packed uint8 [K/2, N] stored as int32 [K/2, N/4]
def swar_kernel(w32_ref, out_lo_ref, out_hi_ref):
    x = w32_ref[:]
    lo = x & 0x0F0F0F0F
    hi = jnp.right_shift(x, 4) & 0x0F0F0F0F
    # sign extend each byte-lane: (v ^ 8) - 8 per byte
    lo = (lo ^ 0x08080808) - 0x08080808
    hi = (hi ^ 0x08080808) - 0x08080808
    out_lo_ref[:] = pltpu.bitcast(lo, jnp.int8)
    out_hi_ref[:] = pltpu.bitcast(hi, jnp.int8)

K2, N = 128, 256
rng = np.random.default_rng(0)
w = rng.integers(-8, 8, (2*K2, N)).astype(np.int8)
from qspec_tpu.ops.packing import pack_int4_np, unpack_int4_np
packed = pack_int4_np(w)  # [K2, N] uint8
w32 = packed.reshape(K2, N//4, 4).view(np.uint8)
w32 = packed.view(np.int32).reshape(K2, N//4) if packed.flags['C_CONTIGUOUS'] else None
try:
    out_lo, out_hi = pl.pallas_call(
        swar_kernel,
        out_shape=[jax.ShapeDtypeStruct((K2, N), jnp.int8),
                   jax.ShapeDtypeStruct((K2, N), jnp.int8)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
    )(jnp.asarray(w32))
    lo = np.asarray(out_lo); hi = np.asarray(out_hi)
    print("lo match:", (lo == w[:K2]).mean(), "hi match:", (hi == w[K2:]).mean(), flush=True)
except Exception as e:
    print("SWAR FAIL:", str(e)[:300], flush=True)
