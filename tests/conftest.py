"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX analog of the reference's dry-run worker pool (SURVEY §4):
the sharding/collective logic runs for real, only the hardware is virtual.
Must set the env vars before jax initializes its backends.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize overrides JAX_PLATFORMS at interpreter
# start; force CPU again via config (effective as long as no backend has been
# initialized yet) so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:
    pass

# XLA:CPU's default matmul precision is bfloat16-like (observed ~4e-2 error on
# a 32-dim fp32 dot); parity tests need real fp32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")
