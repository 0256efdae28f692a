import time, numpy as np, jax, jax.numpy as jnp
t=time.time(); a = jnp.ones((256,256), jnp.bfloat16); print("create", time.time()-t, flush=True)
t=time.time(); b = jnp.dot(a,a); b.block_until_ready(); print("dot", time.time()-t, flush=True)
t=time.time(); h = np.asarray(b, np.float32); print("transfer", time.time()-t, h[0,0], flush=True)
t=time.time(); print("scalar", float(b[0,0]), time.time()-t, flush=True)
from qspec_tpu.ops.packing import unpack_int4
t=time.time()
p = jnp.ones((128, 256), jnp.uint8)
u = unpack_int4(p); u.block_until_ready(); print("unpack", time.time()-t, flush=True)
t=time.time()
w = unpack_int4(p).astype(jnp.bfloat16)
o = jnp.dot(jnp.ones((16,256), jnp.bfloat16), w, preferred_element_type=jnp.float32)
o.block_until_ready(); print("ref-style dot", time.time()-t, flush=True)
