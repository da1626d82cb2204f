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


def as_grid(tiles) -> tuple[int, int]:
    """Normalize a tile spec to (tx, ty): int T → square T x T grid;
    a (tx, ty) pair is tx columns x ty rows. Rectangular grids let a tile's
    ray count match the 128-wide VPU lane axis exactly (e.g. 16x32 tiles on
    a 256^2 image → 16x8-pixel tiles = 128 rays) — the reference's tiles
    are always square (rt.cpp:47-49), but nothing in the math requires it."""
    if isinstance(tiles, int):
        return tiles, tiles
    tx, ty = tiles
    return int(tx), int(ty)


def project_gaussians(scene: GaussianScene, view: jnp.ndarray,
                      focal_length=None):
    """Project Gaussian centers through the view matrix.

    Returns (mu2 (N,2) NDC centers, sigma_p (N,) projected stddevs,
    valid (N,) bool). Invalid entries get mu2=+inf so they never pass the
    membership box test.

    focal_length=None reproduces the reference's view-frame projection
    (rt.cpp:35-45): mu' = p.xy / p.z. That frame is NOT the pixel/ray frame:
    the view matrix is post-translated by focal_length*front (camera.cpp:52),
    so the camera sits at view coords (0, 0, -f) while the [-1,1]^2 pixel
    plane sits at z=0 — a ray through view point p crosses the plane at
    f*p.xy/(p.z + f), not p.xy/p.z. The reference masks the resulting
    parallax error (up to ~f/z of the NDC position) with its extra
    |tile_center| membership slack (rt.cpp:57-59). Passing focal_length
    projects into the true ray frame, which makes the 3.3-sigma membership
    test exact and needs no slack.
    """
    p = scene.mu @ view[:3, :3].T + view[:3, 3][None, :]   # (N,3)
    z = p[:, 2]
    valid = z >= 1.0
    zs = jnp.where(valid, z, 1.0)
    if focal_length is None:
        denom = zs
        scale = 1.0
    else:
        f = jnp.asarray(focal_length, jnp.float32)
        denom = zs + f
        scale = f
    mu2 = scale * p[:, :2] / denom[:, None]
    sigma_p = scale * scene.sigma / denom
    valid = valid & (sigma_p >= 1e-5)
    mu2 = jnp.where(valid[:, None], mu2, jnp.inf)
    return mu2, sigma_p, valid


def tile_centers(tiles):
    """NDC centers of a (tx, ty) grid over [-1,1]^2, row-major (ty, tx).
    Returns (tx*ty, 2)."""
    tx, ty = as_grid(tiles)
    hx, hy = 1.0 / tx, 1.0 / ty
    cx = -1.0 + hx + 2.0 * hx * jnp.arange(tx, dtype=jnp.float32)
    cy = -1.0 + hy + 2.0 * hy * jnp.arange(ty, dtype=jnp.float32)
    CY, CX = jnp.meshgrid(cy, cx, indexing="ij")
    return jnp.stack([CX.ravel(), CY.ravel()], axis=-1)


@functools.partial(jax.jit, static_argnames=("tiles", "mode"))
def tile_membership(scene: GaussianScene, view: jnp.ndarray, tiles,
                    mode: str = "tight", focal_length=1.0) -> jnp.ndarray:
    """(tx*ty, N) bool membership matrix. `tiles`: int or (tx, ty).

    mode="tight": |c - mu'| <= tile_half + 3.3 sigma' on both axes in the
    RAY frame (see project_gaussians: the exact pixel-space projection,
    which needs focal_length) — the minimal superset of visibly-contributing
    Gaussians (3.3 sigma is the 8-bit visibility bound, thesis
    main.tex:520-541).

    mode="reference": the reference's view-frame projection plus its extra
    |tile_center| slack (rt.cpp:57-59) — the slack both absorbs the
    view-vs-ray parallax error and makes edge tiles accept Gaussians across
    the whole NDC range (on the teapot it inflates the mean per-tile count
    ~5x, pure wasted work on any backend). Kept for behavioral-parity
    testing; ignores focal_length.
    """
    tx, ty = as_grid(tiles)
    # named_scope: trace attribution for docs/TRACE.md ("tiling" span)
    with jax.named_scope("tiling"):
        if mode == "reference":
            mu2, sigma_p, valid = project_gaussians(scene, view)
        else:
            mu2, sigma_p, valid = project_gaussians(scene, view,
                                                    focal_length)
        centers = tile_centers((tx, ty))                   # (T2,2)
        half = jnp.array([1.0 / tx, 1.0 / ty], jnp.float32)
        # per-axis (T2, N) tests instead of one (T2, N, 2) tensor: at
        # fitting scale (T2=2048, N=50k) the stacked form peaks at ~1.6 GB
        # of f32 temporaries; the split form peaks at (T2, N)
        reach = 3.3 * sigma_p[None, :]                     # (1, N)
        ok = valid[None, :]
        for ax in (0, 1):
            bound = half[ax] + reach
            if mode == "reference":
                bound = bound + jnp.abs(centers[:, ax])[:, None]
            ok = ok & (jnp.abs(centers[:, ax][:, None] - mu2[None, :, ax])
                       <= bound)
        return ok


def compact_rows(member: jnp.ndarray, capacity: int, n: int) -> jnp.ndarray:
    """Rows of a boolean (T, N) membership matrix → (T, capacity) int32
    index lists (first `capacity` True positions in ascending order, padded
    with the dummy index n).

    top_k compaction: key = q for members, n + q for non-members; the
    `capacity` smallest keys per row are the member indices in ascending
    order. 13x faster on TPU than a vmapped jnp.nonzero(size=...) (which
    lowers to a per-row sort) and bit-identical to it.
    """
    with jax.named_scope("tiling"):
        q = jnp.arange(n, dtype=jnp.int32)[None, :]
        key = jnp.where(member, q, n + q)
        k = min(capacity, n)
        neg_top, _ = jax.lax.top_k(-key, k)
        idx = -neg_top
        idx = jnp.where(idx >= n, n, idx).astype(jnp.int32)
        if capacity > n:  # capacity past the scene: pad with the dummy slot
            pad = jnp.full((idx.shape[0], capacity - n), n, jnp.int32)
            idx = jnp.concatenate([idx, pad], axis=1)
        return idx


@functools.partial(jax.jit, static_argnames=("tiles", "capacity"))
def tile_indices(scene: GaussianScene, view: jnp.ndarray, tiles,
                 capacity: int, focal_length=1.0):
    """Per-tile compacted Gaussian indices.

    Returns (idx (T^2, K) int32 — first K member indices, padded with N
    (the dummy slot); counts (T^2,) — true member counts, so callers can
    detect capacity overflow).
    """
    member = tile_membership(scene, view, tiles,
                             focal_length=focal_length)    # (T2,N)
    counts = jnp.sum(member, axis=-1).astype(jnp.int32)
    return compact_rows(member, capacity, scene.n), counts


# Above this many scene rows the one-hot matmul's O(rows * N) cost crosses
# the per-row-DMA cost of a native gather, which is O(rows) in N (measured
# on TPU v5e, scripts/large_n.py: one-hot wins 15x at N=3.6k, native wins
# 5x at N=10k — crossover sits between).
ONEHOT_MAX_SCENE_ROWS = 8192


def _onehot_gather(packed: jnp.ndarray, flat_idx: jnp.ndarray,
                   max_elems: int = 16 * 1024 * 1024) -> jnp.ndarray:
    """Row-gather packed (M, C) by flat_idx (R,) via a one-hot MXU matmul.

    XLA lowers `a[idx]` row-gathers with tiny trailing dims to per-row DMAs
    (~15x slower than this on TPU for the per-frame tile gather). A float32
    one-hot matmul is bit-exact (each output row is 1*v + 0*... ) and its
    transpose (the scene-gradient scatter-add) is an equally fast matmul.
    The one-hot buffer is chunked to <= max_elems elements.

    Fitting-scale scenes flip the tradeoff: the one-hot costs O(R * M) MACs
    while the DMA gather is O(R), so past ONEHOT_MAX_SCENE_ROWS callers
    (gather_tiles) use the native gather instead.
    """
    m = packed.shape[0]
    r = flat_idx.shape[0]
    cols = jnp.arange(m, dtype=flat_idx.dtype)

    # checkpoint: the one-hot matrix must NOT be saved as an autodiff
    # residual — under the chunked lax.map below, saving it for every chunk
    # materializes (n_chunks, rows_per_chunk, M) in HBM (measured 42 GB for
    # the teapot at 512^2). Rematerializing it makes the backward the
    # equally-fast transpose matmul oh^T @ g with O(rows) residuals.
    @jax.checkpoint
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
    with jax.named_scope("gather"):
        n = scene.n
        packed = jnp.concatenate(
            [scene.mu, scene.sigma[:, None], scene.magnitude[:, None],
             scene.albedo], axis=1,
        )                                                   # (N, 8)
        dummy = jnp.zeros((1, 8), packed.dtype).at[0, 3].set(1.0)
        packed = jnp.concatenate([packed, dummy], axis=0)   # (N+1, 8)
        t2, k = idx.shape
        if n + 1 > ONEHOT_MAX_SCENE_ROWS:
            out = packed[idx.reshape(-1)].reshape(t2, k, 8)
        else:
            out = _onehot_gather(packed, idx.reshape(-1)).reshape(t2, k, 8)
        return GaussianScene(
            mu=out[..., 0:3],
            sigma=out[..., 3],
            magnitude=out[..., 4],
            albedo=out[..., 5:8],
        )


def max_tile_count(scene: GaussianScene, view: jnp.ndarray, tiles,
                   focal_length=1.0) -> int:
    """Host helper: the max per-tile Gaussian count for this frame (use to
    pick `capacity` without silent truncation)."""
    member = tile_membership(scene, view, tiles, focal_length=focal_length)
    return int(jnp.max(jnp.sum(member, axis=-1)))
