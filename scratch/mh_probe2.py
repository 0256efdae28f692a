"""Probe 2: shard_map jit over a 2-process global mesh with host inputs."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax.experimental.shard_map import shard_map

pid = int(sys.argv[1]); nproc = int(sys.argv[2])
jax.distributed.initialize("127.0.0.1:29512", nproc, pid)
mesh = Mesh(np.asarray(jax.devices()).reshape(1, -1), ("data", "model"))

W = np.arange(64, dtype=np.float32).reshape(8, 8)
w = jax.device_put(W, NamedSharding(mesh, P(None, "model")))

def f(w, x, t):
    y = x @ w  # x replicated, w col-sharded -> y col-sharded
    return jax.lax.psum(jnp.sum(y), "model") + t[0]

m = shard_map(f, mesh=mesh, in_specs=(P(None, "model"), P(), P()),
              out_specs=P(), check_rep=False)
jf = jax.jit(m)

x_np = np.ones((2, 8), np.float32)
t_jnp = jnp.arange(3)   # jnp.asarray-style uncommitted local array
try:
    out = jf(w, x_np, t_jnp)
    print(f"proc {pid}: numpy+jnp inputs OK, out={float(out)}", flush=True)
except Exception as e:
    print(f"proc {pid}: FAIL {type(e).__name__}: {e}", flush=True)
    # retry with explicit replication
    rep = NamedSharding(mesh, P())
    x_g = jax.make_array_from_process_local_data(rep, x_np)
    t_g = jax.make_array_from_process_local_data(rep, np.asarray(t_jnp))
    out = jf(w, x_g, t_g)
    print(f"proc {pid}: global-replicated inputs OK, out={float(out)}", flush=True)
