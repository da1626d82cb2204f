"""sgrt_tpu — TPU-native differentiable volumetric Gaussian ray tracer.

A from-scratch JAX/Pallas framework with the capabilities of the reference
CPU-SIMD renderer (Sebastian-Dawid/simd-gaussian-ray-tracing): closed-form
erf-based transmittance through isotropic 3D Gaussians (Rhodin et al. 2015
image formation model), 5-sample radiance integration, tile-based culling,
plus — new on TPU — analytic gradients, multi-chip sharding, and a
differentiable fitting loop.

Layout:
    models/    Gaussian scene + camera pytrees, procedural scenes, obj loading
    ops/       reference (oracle) math, fused renderers, Pallas kernels,
               tiling/culling, numeric approximations, image packing
    parallel/  device mesh helpers, sharded render, distributed fit step
    utils/     obj parsing, PNG io, timing
"""

import jax as _jax

# This stack's default matmul precision quantizes f32 operands to bf16 (even
# on CPU), which is far too coarse for view matrices and erf arguments.
# Renderer math is VPU/transcendental-bound, so full-f32 matmuls cost ~nothing
# here; hot spots that can tolerate bf16 opt in explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from sgrt_tpu.models.gaussians import (GaussianScene, grid_scene, pad_scene,
                                       scene_from_obj)
from sgrt_tpu.models.camera import Camera
from sgrt_tpu.ops.anisotropic import AnisoScene, from_isotropic

__version__ = "0.1.0"

__all__ = [
    "GaussianScene",
    "AnisoScene",
    "from_isotropic",
    "grid_scene",
    "pad_scene",
    "scene_from_obj",
    "Camera",
    "__version__",
]
