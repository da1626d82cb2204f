"""Device mesh setup — the multi-chip axis of the framework.

The reference has no distributed layer at all (single process + thread pool,
SURVEY §2.3); its parallel axes map to TPU as:

    SIMD lanes over pixels  → VPU lanes inside a chip (free)
    thread pool over tiles  → XLA parallelism inside a chip (free)
    [new] chips/hosts       → 1-D "rays" mesh: pixels sharded, Gaussian
                              parameters replicated, gradient psum over ICI

Multi-host: call `initialize_distributed()` (jax.distributed) before any
device op, then `make_mesh()` uses all global devices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAYS_AXIS = "rays"


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host init (no-op when single-process)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(devices=None, axis: str = RAYS_AXIS) -> Mesh:
    """1-D mesh over all (global) devices; rays are sharded along it."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_rays(mesh: Mesh, *arrays, axis: str = RAYS_AXIS):
    """Place arrays with their leading (ray) axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. the Gaussian scene) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
