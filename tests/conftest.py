"""Force tests onto CPU with 8 virtual devices (multi-chip sharding tests run
on a virtual mesh, per the reference's practice of standing in for a cluster
with oversubscribed MPI — SURVEY.md §4) and enable x64 so convergence oracles
run in the reference's double precision."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# the axon TPU plugin ignores JAX_PLATFORMS; force CPU via config too
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
