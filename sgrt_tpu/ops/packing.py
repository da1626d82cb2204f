"""u32 pixel packing — bit-exact analog of the reference image format.

The reference packs each pixel as a u32 `A<<24 | R<<16 | G<<8 | B` with
channels clamped by min(x, 1) * 255 and truncated (rt.h:239-243; the tiled
SIMD path also derives A from the accumulated albedo w, rt.h:373-377).
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_u32(image: jnp.ndarray, alpha_from_w: bool = False) -> jnp.ndarray:
    """Float (..., 3|4) color → u32 packed pixels (...,).

    alpha_from_w=False forces A=0xFF (rt.h:239, untiled paths);
    alpha_from_w=True uses channel 3 like the tiled SIMD path (rt.h:373).
    """
    def q(c):
        return jnp.minimum(jnp.maximum(c, 0.0), 1.0) * 255.0

    r = q(image[..., 0]).astype(jnp.uint32)
    g = q(image[..., 1]).astype(jnp.uint32)
    b = q(image[..., 2]).astype(jnp.uint32)
    if alpha_from_w and image.shape[-1] >= 4:
        a = q(image[..., 3]).astype(jnp.uint32)
    else:
        a = jnp.full(image.shape[:-1], 255, jnp.uint32)
    return (a << 24) | (r << 16) | (g << 8) | b


def unpack_u32(packed: jnp.ndarray) -> jnp.ndarray:
    """u32 pixels → float (..., 4) RGBA in [0, 1]."""
    r = ((packed >> 16) & 0xFF).astype(jnp.float32) / 255.0
    g = ((packed >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = (packed & 0xFF).astype(jnp.float32) / 255.0
    a = ((packed >> 24) & 0xFF).astype(jnp.float32) / 255.0
    return jnp.stack([r, g, b, a], axis=-1)
