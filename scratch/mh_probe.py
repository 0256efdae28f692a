"""Probe: 2-process jax.distributed on CPU, global mesh psum."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

pid = int(sys.argv[1]); nproc = int(sys.argv[2])
jax.distributed.initialize(coordinator_address="127.0.0.1:29511",
                           num_processes=nproc, process_id=pid)
devs = jax.devices()
print(f"proc {pid}: {len(devs)} global devices, "
      f"{len(jax.local_devices())} local", flush=True)

mesh = Mesh(jax.devices(), ("model",))
x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("model")),
    jnp.arange(4, dtype=jnp.float32) + 100 * pid)

@jax.jit
def total(v):
    return jnp.sum(v)

out = total(x)
print(f"proc {pid}: sum={out}", flush=True)

from jax.experimental import multihost_utils
b = multihost_utils.broadcast_one_to_all(jnp.array([7, 8, 9]))
print(f"proc {pid}: bcast={list(map(int, b))}", flush=True)
