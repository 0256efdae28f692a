import time, numpy as np, jax, jax.numpy as jnp
x = np.ones((64, 1024, 1024), np.uint8)  # 64MB
t=time.time(); d = jnp.asarray(x); d.block_until_ready(); dt=time.time()-t
print(f"h2d 64MB: {dt:.2f}s -> {64/dt:.1f} MB/s", flush=True)
t=time.time(); h = jax.device_get(d); dt=time.time()-t
print(f"d2h 64MB: {dt:.2f}s -> {64/dt:.1f} MB/s", flush=True)
t=time.time()
for i in range(16):
    d2 = jnp.asarray(x[i])  # 1MB each
jax.block_until_ready(d2); dt=time.time()-t
print(f"h2d 16x1MB: {dt:.2f}s", flush=True)
