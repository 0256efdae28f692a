import time, numpy as np, jax, jax.numpy as jnp
print("imports done", flush=True)
t=time.time(); k = jax.random.PRNGKey(0); jax.block_until_ready(k); print("key", time.time()-t, flush=True)
t=time.time(); w = jax.random.normal(k, (2048, 3072)); jax.block_until_ready(w); print("normal", time.time()-t, flush=True)
from qspec_tpu.config import ModelConfig
from qspec_tpu.models.llama import init_params_device
cfg = ModelConfig(hidden_size=2048, intermediate_size=8192, num_layers=16,
                  num_heads=16, num_kv_heads=8, head_dim=128,
                  vocab_size=128256, quant="w4")
t=time.time(); params = init_params_device(cfg, 0); print("built graph", time.time()-t, flush=True)
t=time.time(); jax.block_until_ready(params); print("params ready", time.time()-t, flush=True)
