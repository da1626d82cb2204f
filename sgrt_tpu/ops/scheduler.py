"""Bucketed tile scheduling — static-shape load balancing for skewed scenes.

Fixed-capacity tiling pays worst-tile cost everywhere: one dense tile (a
teapot filling a few central tiles) forces every sparse tile to carry the
same Gaussian capacity, inflating gather/DMA sizes, kernel grid programs,
and block quantization (pb/qb sized for the capacity, not the typical
count). This is the TPU-static-shape analog of the load imbalance the
reference absorbs with per-tile std::vectors + a work-stealing thread pool
(src/vrt/rt.cpp:64, thread-pool.h).

The scheduler splits tiles into two STATIC buckets per frame:

    dense  — the top `n_dense` tiles by live count, capacity `cap_dense`
    sparse — the remaining tiles, capacity `cap_sparse`

Bucket membership is data-dependent (argsort of per-tile counts) but every
shape is static, so the whole thing jits: two kernel launches with
bucket-matched block sizes, then a scatter reassembles the frame. On the
teapot this cuts sparse-tile block waste ~10x.

`probe_bucket_config` picks (n_dense, cap_dense, cap_sparse) per scene/orbit
on the host (the analog of sizing `capacity` with probe_capacity).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sgrt_tpu.models.gaussians import GaussianScene
from sgrt_tpu.ops.tiling import compact_rows, gather_tiles, tile_membership


class BucketConfig(NamedTuple):
    n_dense: int      # tiles in the dense bucket (0 → single-bucket mode)
    cap_dense: int    # Gaussian capacity of dense tiles
    cap_sparse: int   # Gaussian capacity of sparse tiles

    def round_to(self, qd: int, qs: int) -> "BucketConfig":
        return BucketConfig(
            self.n_dense,
            -(-self.cap_dense // qd) * qd,
            -(-self.cap_sparse // qs) * qs,
        )


# Extra cost of the second bucket launch, in erf-equivalents: kernel
# dispatch + the separate gather + the scatter reassembly, ~4 ms at the
# ~120 Gerf/s kernel rate (docs/EFFICIENCY.md). Bucketing must save at
# least this much work to pay for itself — on low-skew scenes like the
# cube a single launch wins (measured: 8.6 vs 13.4 ms/frame), on the
# teapot (~30x skew, mostly-empty sparse tiles) buckets win by ~15%
# (59.5 vs 69.9 ms same session).
LAUNCH_OVERHEAD_ERF = 5e8

# Per capacity-row-per-ray cost that is NOT count-bounded, in
# erf-equivalents: the one-hot gather, the in-kernel prep matmul/exp, the
# base pass, and block DMA all scale with the bucket CAPACITY even for
# near-empty tiles. Calibrated on the teapot (32,16) frame: the measured
# single-vs-bucketed gap (~10 ms) over the capacity-row delta gives ~10
# erf-equivalents per row*ray.
LINEAR_ERF_PER_ROW_RAY = 10.0


def _quantized_work_erf(counts, cap, rays_per_tile):
    """erf-work model of the count-bounded kernel over `counts` at capacity
    `cap` (the quant term mirrors scripts/efficiency.py::kernel_work_erf):
    ceil(c/pb)pb x ceil(c/qb)qb pair blocks x 5 taps, plus the linear
    capacity-proportional costs (gather/prep/base/DMA), x rays."""
    import numpy as np

    from sgrt_tpu.ops.pallas_kernel import _block_sizes

    pb, qb = _block_sizes(cap)
    c = np.maximum(np.asarray(counts, np.int64), 0)
    quant = (np.ceil(c / pb) * pb * np.ceil(c / qb) * qb * 5).sum()
    linear = len(c) * cap * LINEAR_ERF_PER_ROW_RAY
    return float(quant + linear) * rays_per_tile


def probe_bucket_config(scene: GaussianScene, views, tiles,
                        margin: float = 1.2, dense_frac: float = 0.125,
                        focal_length=1.0, multiple_of: int = 1,
                        rays_per_tile: int = 128) -> BucketConfig:
    """Host-side sizing: over sample view matrices, take the worst-case
    per-tile counts; the dense bucket holds the top `dense_frac` of tiles,
    sparse capacity covers the largest count that falls outside it.

    Bucketing is ADAPTIVE: the two-launch split is kept only when the
    quantized-work saving beats the second launch's overhead
    (LAUNCH_OVERHEAD_ERF); otherwise n_dense=0 selects the single-launch
    path (render_tiles_bucketed then issues one kernel).

    multiple_of: round n_dense up so both buckets split evenly over a mesh
    of that many devices (requires t2 % multiple_of == 0); rounding up only
    moves borderline tiles into the dense bucket, never truncates."""
    from sgrt_tpu.ops.tiling import as_grid

    tx, ty = as_grid(tiles)
    t2 = tx * ty
    if t2 % multiple_of:
        raise ValueError(f"tile count {t2} not divisible by {multiple_of}")
    n_dense = max(1, int(t2 * dense_frac))
    n_dense = min(-(-n_dense // multiple_of) * multiple_of, t2 - multiple_of)
    if n_dense <= 0:   # degenerate grid: single bucket
        n_dense = 0
    worst_sorted = None
    for view in views:
        counts = jnp.sort(
            jnp.sum(tile_membership(scene, view, tiles,
                                    focal_length=focal_length), axis=-1)
        )[::-1]
        worst_sorted = counts if worst_sorted is None else jnp.maximum(
            worst_sorted, counts)
    worst = jax.device_get(worst_sorted)
    cap_dense = max(32, int(float(worst[0]) * margin))
    cap_sparse = max(32, int(float(worst[n_dense]) * margin))
    if cap_sparse >= cap_dense:   # no skew — one bucket is enough
        return BucketConfig(0, cap_dense, cap_dense)
    w_single = _quantized_work_erf(worst, cap_dense, rays_per_tile)
    w_bucket = (_quantized_work_erf(worst[:n_dense], cap_dense, rays_per_tile)
                + _quantized_work_erf(worst[n_dense:], cap_sparse,
                                      rays_per_tile)
                + LAUNCH_OVERHEAD_ERF)
    if w_single <= w_bucket:
        return BucketConfig(0, cap_dense, cap_dense)
    return BucketConfig(n_dense, cap_dense, cap_sparse)


def bucketed_tile_indices(scene: GaussianScene, view: jnp.ndarray,
                          tiles, cfg: BucketConfig, focal_length=1.0,
                          interleave: int = 1):
    """Per-bucket compacted Gaussian indices.

    Returns (dense_ids (D,), idx_dense (D, cap_dense), sparse_ids (S,),
    idx_sparse (S, cap_sparse), counts (T2,)). All shapes static; bucket
    membership (argsort of counts) is per-frame data.

    interleave=D permutes each bucket so a contiguous 1/D slice holds every
    D-th tile of the count-sorted order — the static round-robin schedule
    that balances per-device work when the bucket axis is sharded over D
    devices (the analog of the reference's work-stealing pool,
    thread-pool.h:9-35, without dynamic stealing).
    """
    member = tile_membership(scene, view, tiles,
                             focal_length=focal_length)    # (T2, N)
    counts = jnp.sum(member, axis=-1).astype(jnp.int32)
    order = jnp.argsort(-counts)                           # dense first
    dense_ids = order[: cfg.n_dense]
    sparse_ids = order[cfg.n_dense:]
    if interleave > 1:
        dense_ids = dense_ids.reshape(-1, interleave).T.reshape(-1)
        sparse_ids = sparse_ids.reshape(-1, interleave).T.reshape(-1)
    idx_dense = compact_rows(member[dense_ids], cfg.cap_dense, scene.n)
    idx_sparse = compact_rows(member[sparse_ids], cfg.cap_sparse, scene.n)
    return dense_ids, idx_dense, sparse_ids, idx_sparse, counts


def render_tiles_bucketed(scene: GaussianScene, view, o, tile_dirs,
                          cfg: BucketConfig, erf_name: str = "as5",
                          exp_name: str = "exact",
                          tiles=None, rb: int = 128,
                          pb: int | None = None, qb: int | None = None,
                          focal_length=1.0):
    """Two-bucket tiled render: tile_dirs (T2, P, 3) → (colors (T2, P, 3),
    counts (T2,), overflow (scalar int32 — tiles whose true count exceeds
    their bucket capacity; 0 means nothing was truncated)). Differentiable
    w.r.t. the scene (the bucket gathers transpose to scatter-adds). pb/qb
    default per-bucket via _block_sizes."""
    from sgrt_tpu.ops.pallas_kernel import (MAX_BWD_CAPACITY, _block_sizes,
                                            render_tiles_pallas)

    t2 = tile_dirs.shape[0]
    if tiles is None:
        tiles = int(round(t2 ** 0.5))  # square-grid default
    # round capacities so each bucket's Gaussian axis divides into blocks;
    # pb/qb overrides resolve independently (defaults fill whichever is None)
    dp_d, dq_d = _block_sizes(cfg.cap_dense)
    dp_s, dq_s = _block_sizes(cfg.cap_sparse)
    pb_d = dp_d if pb is None else pb
    qb_d = dq_d if qb is None else qb
    pb_s = dp_s if pb is None else pb
    qb_s = dq_s if qb is None else qb
    # lcm, not max: with custom pb/qb where neither divides the other,
    # rounding to max would leave a capacity the kernel rejects
    cfg = cfg.round_to(math.lcm(pb_d, qb_d), math.lcm(pb_s, qb_s))
    # buckets above the monolithic VMEM ceiling → chunked kernel (dense
    # fitting-scale scenes; sparse buckets virtually never need this)
    chunk_dense = cfg.cap_dense > MAX_BWD_CAPACITY
    chunk_sparse = cfg.cap_sparse > MAX_BWD_CAPACITY
    if chunk_dense or chunk_sparse:
        from sgrt_tpu.ops.pallas_chunked import chunk_plan

        cap_d, ck_d = (chunk_plan(cfg.cap_dense) if chunk_dense
                       else (cfg.cap_dense, 0))
        cap_s, ck_s = (chunk_plan(cfg.cap_sparse) if chunk_sparse
                       else (cfg.cap_sparse, 0))
        cfg = BucketConfig(cfg.n_dense, cap_d, cap_s)
    dense_ids, idx_d, sparse_ids, idx_s, counts = bucketed_tile_indices(
        scene, view, tiles, cfg, focal_length=focal_length)
    overflow = (jnp.sum(counts[sparse_ids] > cfg.cap_sparse)
                + jnp.sum(counts[dense_ids] > cfg.cap_dense)).astype(jnp.int32)

    def _bucket_render(idx, ids, chunked, ck, pb_b, qb_b):
        if chunked:
            from sgrt_tpu.ops.pallas_chunked import render_tiles_chunked

            return render_tiles_chunked(
                gather_tiles(scene, idx), o, tile_dirs[ids], counts[ids],
                ck=ck, rb=rb, erf_name=erf_name, exp_name=exp_name)
        return render_tiles_pallas(
            gather_tiles(scene, idx), o, tile_dirs[ids], counts[ids],
            rb=rb, pb=pb_b, qb=qb_b, erf_name=erf_name, exp_name=exp_name)

    colors_s = _bucket_render(idx_s, sparse_ids, chunk_sparse,
                              ck_s if chunk_sparse else 0, pb_s, qb_s)

    colors = jnp.zeros((t2,) + colors_s.shape[1:], colors_s.dtype)
    colors = colors.at[sparse_ids].set(colors_s)

    if cfg.n_dense > 0:
        colors_d = _bucket_render(idx_d, dense_ids, chunk_dense,
                                  ck_d if chunk_dense else 0, pb_d, qb_d)
        colors = colors.at[dense_ids].set(colors_d)
    return colors, counts, overflow
