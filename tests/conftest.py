"""Force tests onto CPU with 8 virtual devices (the multi-chip test rig —
the analog of the reference's single-box thread-pool testing, but validating
real jax.sharding meshes). Must run before jax is imported."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
