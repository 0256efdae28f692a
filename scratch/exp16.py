import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from qspec_tpu.utils import enable_persistent_compile_cache
enable_persistent_compile_cache()

def k(w32_ref, out_ref):
    out_ref[:] = pltpu.bitcast(w32_ref[:], jnp.int8)

S, N = 8, 128
words = np.zeros((S, N), np.int32)
# word at (s, n) has bytes [b0, b1, b2, b3] = [s*4+0.., tagged with n in high..]
for s in range(S):
    for n in range(3):
        words[s, n] = (1 + 4*s) | ((2 + 4*s) << 8) | ((3 + 4*s) << 16) | ((4 + 4*s) << 24)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((4*S, N), jnp.int8),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(jnp.asarray(words))
o = np.asarray(out)
print("col0 rows0..15:", o[:16, 0].tolist(), flush=True)
print("expect bytes of words s=0..3 in some order", flush=True)
