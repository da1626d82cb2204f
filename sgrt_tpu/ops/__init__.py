from sgrt_tpu.ops.reference import (
    transmittance,
    transmittance_step,
    density,
    radiance,
    render_reference,
)
from sgrt_tpu.ops.render import render, render_rays

__all__ = [
    "transmittance",
    "transmittance_step",
    "density",
    "radiance",
    "render_reference",
    "render",
    "render_rays",
]
