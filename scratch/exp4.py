import time, numpy as np, jax, jax.numpy as jnp
t=time.time(); a = jnp.arange(16, dtype=jnp.int32); print("create", time.time()-t, flush=True)
t=time.time(); h = jax.device_get(a); print("device_get int32[16]:", time.time()-t, h[:3], flush=True)
b = jnp.ones((256,256), jnp.bfloat16)
t=time.time(); h2 = jax.device_get(b); print("device_get bf16[256,256]:", time.time()-t, flush=True)
t=time.time(); h3 = np.asarray(b); print("np.asarray bf16:", time.time()-t, h3.dtype, flush=True)
t=time.time(); h4 = np.asarray(b, np.float32); print("np.asarray f32-convert:", time.time()-t, flush=True)
t=time.time(); print("float():", float(b[0,0]), time.time()-t, flush=True)
