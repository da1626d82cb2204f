"""Minimal Wavefront .obj vertex reader.

The framework only needs vertex positions (the reference turns each `v` line
into one Gaussian — src/vrt/gaussians-from-file.cpp:31-42; faces, normals and
texcoords are ignored). A native C++ fast path (sgrt_tpu.utils.native) is
used automatically for large files when available.
"""

from __future__ import annotations

import numpy as np


def read_obj_vertices(path: str) -> np.ndarray:
    """Parse `v x y z [...]` lines → (N, 3) float32 array."""
    try:
        from sgrt_tpu.utils.native import read_obj_vertices_native

        out = read_obj_vertices_native(path)
        if out is not None:
            return out
    except ImportError:
        pass
    verts = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
    if not verts:
        raise ValueError(f"no vertices found in {path}")
    return np.asarray(verts, dtype=np.float32)
