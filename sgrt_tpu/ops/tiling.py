"""Tile-based Gaussian culling as a fixed-capacity gather-compaction.

TPU-native re-design of the reference's `tile_gaussians` (src/vrt/rt.cpp:29-69).
The reference builds per-tile std::vectors of copied Gaussians (duplicating
border Gaussians); under XLA's static shapes this becomes:

  1. project:    mu' = (view @ mu).xy / z,  sigma' = sigma / z,
                 cull z < 1 and sigma' < 1e-5          (rt.cpp:35-45)
  2. membership: Gaussian q belongs to tile with center c iff
                 |c - mu'| <= |c| + tile_half + 3.3 sigma'   (rt.cpp:57-59)
                 (the |c| term is the reference's quirk — it only widens the
                 test, so we replicate it for behavioral parity; the 3.3 sigma
                 bound is derived in the thesis from 8-bit color visibility)
  3. compact:    per tile, the first K member indices (padded with a dummy
                 index that maps to an inert sigma=1/magnitude=0 Gaussian —
                 the same padding contract as the reference SoA,
                 types.cpp:53-63)

All three steps are jnp and run on-device per frame (the reference re-tiles
every frame on the host, main.cpp:263).

Tiles are indexed row-major (ty, tx) over NDC [-1,1]^2 matching the
reference's y-outer/x-inner tile loop (rt.cpp:47-49).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sgrt_tpu.models.gaussians import GaussianScene


def project_gaussians(scene: GaussianScene, view: jnp.ndarray):
    """Project Gaussian centers through the view matrix.

    Returns (mu2 (N,2) NDC centers, sigma_p (N,) projected stddevs,
    valid (N,) bool). Invalid entries get mu2=+inf so they never pass the
    membership box test.
    """
    p = scene.mu @ view[:3, :3].T + view[:3, 3][None, :]   # (N,3)
    z = p[:, 2]
    valid = z >= 1.0
    zs = jnp.where(valid, z, 1.0)
    mu2 = p[:, :2] / zs[:, None]
    sigma_p = scene.sigma / zs
    valid = valid & (sigma_p >= 1e-5)
    mu2 = jnp.where(valid[:, None], mu2, jnp.inf)
    return mu2, sigma_p, valid


def tile_centers(tiles: int):
    """NDC centers of a tiles x tiles grid over [-1,1]^2, row-major (ty,tx).
    Returns (T^2, 2)."""
    half = 1.0 / tiles
    c = -1.0 + half + 2.0 * half * jnp.arange(tiles, dtype=jnp.float32)
    cy, cx = jnp.meshgrid(c, c, indexing="ij")
    return jnp.stack([cx.ravel(), cy.ravel()], axis=-1)


@functools.partial(jax.jit, static_argnames=("tiles", "mode"))
def tile_membership(scene: GaussianScene, view: jnp.ndarray, tiles: int,
                    mode: str = "tight") -> jnp.ndarray:
    """(T^2, N) bool membership matrix.

    mode="tight": |c - mu'| <= tile_half + 3.3 sigma' on both axes — the
    minimal superset of visibly-contributing Gaussians (3.3 sigma is the
    8-bit visibility bound, thesis main.tex:520-541).

    mode="reference": adds the reference's extra |tile_center| slack
    (rt.cpp:57-59) — a quirk that makes edge tiles accept Gaussians across
    the whole NDC range (it only *widens* the test, so images are identical;
    on the teapot it inflates the mean per-tile count ~5x, which is pure
    wasted work on any backend). Kept for behavioral-parity testing.
    """
    mu2, sigma_p, valid = project_gaussians(scene, view)
    centers = tile_centers(tiles)                          # (T2,2)
    half = 1.0 / tiles
    d = jnp.abs(centers[:, None, :] - mu2[None, :, :])     # (T2,N,2)
    bound = half + 3.3 * sigma_p[None, :, None]
    if mode == "reference":
        bound = bound + jnp.abs(centers)[:, None, :]
    return jnp.all(d <= bound, axis=-1) & valid[None, :]


def compact_rows(member: jnp.ndarray, capacity: int, n: int) -> jnp.ndarray:
    """Rows of a boolean (T, N) membership matrix → (T, capacity) int32
    index lists (first `capacity` True positions in ascending order, padded
    with the dummy index n).

    top_k compaction: key = q for members, n + q for non-members; the
    `capacity` smallest keys per row are the member indices in ascending
    order. 13x faster on TPU than a vmapped jnp.nonzero(size=...) (which
    lowers to a per-row sort) and bit-identical to it.
    """
    q = jnp.arange(n, dtype=jnp.int32)[None, :]
    key = jnp.where(member, q, n + q)
    k = min(capacity, n)
    neg_top, _ = jax.lax.top_k(-key, k)
    idx = -neg_top
    idx = jnp.where(idx >= n, n, idx).astype(jnp.int32)
    if capacity > n:  # capacity exceeding the scene: pad with the dummy slot
        pad = jnp.full((idx.shape[0], capacity - n), n, jnp.int32)
        idx = jnp.concatenate([idx, pad], axis=1)
    return idx


@functools.partial(jax.jit, static_argnames=("tiles", "capacity"))
def tile_indices(scene: GaussianScene, view: jnp.ndarray, tiles: int, capacity: int):
    """Per-tile compacted Gaussian indices.

    Returns (idx (T^2, K) int32 — first K member indices, padded with N
    (the dummy slot); counts (T^2,) — true member counts, so callers can
    detect capacity overflow).
    """
    member = tile_membership(scene, view, tiles)           # (T2,N)
    counts = jnp.sum(member, axis=-1).astype(jnp.int32)
    return compact_rows(member, capacity, scene.n), counts


def _onehot_gather(packed: jnp.ndarray, flat_idx: jnp.ndarray,
                   max_elems: int = 16 * 1024 * 1024) -> jnp.ndarray:
    """Row-gather packed (M, C) by flat_idx (R,) via a one-hot MXU matmul.

    XLA lowers `a[idx]` row-gathers with tiny trailing dims to per-row DMAs
    (~15x slower than this on TPU for the per-frame tile gather). A float32
    one-hot matmul is bit-exact (each output row is 1*v + 0*... ) and its
    transpose (the scene-gradient scatter-add) is an equally fast matmul.
    The one-hot buffer is chunked to <= max_elems elements.
    """
    m = packed.shape[0]
    r = flat_idx.shape[0]
    cols = jnp.arange(m, dtype=flat_idx.dtype)

    def chunk_gather(ix):
        oh = (ix[:, None] == cols[None, :]).astype(packed.dtype)
        # explicit HIGHEST: bit-exactness must not depend on the ambient
        # default_matmul_precision (a bf16 context would corrupt the gather)
        return jnp.dot(oh, packed, preferred_element_type=packed.dtype,
                       precision=jax.lax.Precision.HIGHEST)

    rows_per_chunk = max(1, max_elems // m)
    if r <= rows_per_chunk:
        return chunk_gather(flat_idx)
    n_chunks = -(-r // rows_per_chunk)
    pad = n_chunks * rows_per_chunk - r
    ix = jnp.concatenate([flat_idx, jnp.zeros((pad,), flat_idx.dtype)])
    out = jax.lax.map(chunk_gather, ix.reshape(n_chunks, rows_per_chunk))
    return out.reshape(-1, packed.shape[1])[:r]


def gather_tiles(scene: GaussianScene, idx: jnp.ndarray) -> GaussianScene:
    """Gather per-tile Gaussian blocks: idx (T^2, K) → scene pytree with
    leading (T^2, K) axes. Index N selects the inert dummy row
    (sigma=1, magnitude=0 — the reference's SoA padding, types.cpp:53-63).

    All four fields are packed into one (N+1, 8) matrix so the gather is a
    single one-hot MXU matmul (see _onehot_gather)."""
    n = scene.n
    packed = jnp.concatenate(
        [scene.mu, scene.sigma[:, None], scene.magnitude[:, None],
         scene.albedo], axis=1,
    )                                                       # (N, 8)
    dummy = jnp.zeros((1, 8), packed.dtype).at[0, 3].set(1.0)
    packed = jnp.concatenate([packed, dummy], axis=0)       # (N+1, 8)
    t2, k = idx.shape
    out = _onehot_gather(packed, idx.reshape(-1)).reshape(t2, k, 8)
    return GaussianScene(
        mu=out[..., 0:3],
        sigma=out[..., 3],
        magnitude=out[..., 4],
        albedo=out[..., 5:8],
    )


def max_tile_count(scene: GaussianScene, view: jnp.ndarray, tiles: int) -> int:
    """Host helper: the max per-tile Gaussian count for this frame (use to
    pick `capacity` without silent truncation)."""
    member = tile_membership(scene, view, tiles)
    return int(jnp.max(jnp.sum(member, axis=-1)))
