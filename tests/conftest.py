"""Force tests onto CPU with 8 virtual devices (the multi-chip test rig —
the analog of the reference's single-box thread-pool testing, but validating
real jax.sharding meshes). Must run before jax is imported."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The env-var spellings (JAX_PLATFORMS / XLA_FLAGS) are ignored by this
# stack (the axon TPU plugin loads regardless); the config API is what
# actually selects CPU and fans out virtual devices.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
