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


# STATIC FALLBACK cost-model constants (used off-TPU, e.g. the CPU test
# rig, where a measured calibration is meaningless). On the TPU the model
# is CALIBRATED at probe time — see calibrate_cost_model(): the round-4
# review found these hardcoded values silently flipped the
# single-vs-two-launch decision as session throughput drifted (cube:
# the stale constants chose single-launch at 5.07 ms/frame when buckets
# measured 4.10 ms same-session).
LAUNCH_OVERHEAD_ERF = 5e8
LINEAR_ERF_PER_ROW_RAY = 10.0
_STATIC_RATE_ERF = 120e9   # ~kernel plateau, erf/s (docs/EFFICIENCY.md)

_CALIB = None


def calibrate_cost_model(force: bool = False):
    """One-shot MEASURED cost model for the launch decision, cached per
    process: {rate_erf (erf/s), linear_s (s per capacity-row-ray),
    launch_s (s per extra kernel launch)}. Three tiny synthetic kernel
    runs (dense-full for the quadratic rate; two empty-count capacities
    for the linear and fixed terms). Off-TPU returns the static fallback
    so CPU tests stay deterministic."""
    global _CALIB
    if _CALIB is not None and not force:
        return _CALIB
    import json
    import os
    import tempfile
    import time

    import jax

    if jax.default_backend() != "tpu":
        _CALIB = {
            "rate_erf": _STATIC_RATE_ERF,
            "linear_s": LINEAR_ERF_PER_ROW_RAY / _STATIC_RATE_ERF,
            "launch_s": LAUNCH_OVERHEAD_ERF / _STATIC_RATE_ERF,
            "measured": False,
        }
        return _CALIB

    # disk cache: the measurement costs ~6 small-kernel compiles (~1-2 min
    # in a fresh process). The constants are structural (device rate,
    # in-program launch overhead), so a per-device-kind cache is sound;
    # `force=True` re-measures.
    cache = os.path.join(tempfile.gettempdir(),
                         f"sgrt_cost_calib_{jax.devices()[0].device_kind}"
                         .replace(" ", "_").replace("/", "_") + ".json")
    if not force and os.path.exists(cache):
        try:
            with open(cache) as f:
                _CALIB = json.load(f)
            return _CALIB
        except (OSError, ValueError):
            pass

    from sgrt_tpu.ops.pallas_kernel import render_fused

    # All quantities come from DIFFERENCES of pipelined whole-call times,
    # so the tunneled runtime's per-call dispatch overhead (1.3-5.5 ms,
    # which an absolute measurement would misread as launch cost) cancels.
    def mk(b, cap, full, seed):
        key = jax.random.PRNGKey(seed)
        oc = jax.random.normal(key, (b, cap, 3))
        sig = jnp.full((b, cap), 0.3)
        mag = jnp.ones((b, cap)) * (1.0 if full else 0.0)
        alb = jnp.abs(jax.random.normal(key, (b, cap, 3)))
        d = jax.random.normal(key, (b, 3, 128))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        counts = jnp.full((b,), cap if full else 0, jnp.int32)
        return (oc, sig, mag, alb, d, counts)

    def timed(datas, reps=24):
        """One jitted program containing len(datas) kernel launches
        (distinct data defeats CSE), timed as pipelined throughput."""

        @jax.jit
        def f(datas):
            tot = 0.0
            for (oc, sig, mag, alb, d, counts) in datas:
                tot += jnp.sum(render_fused(oc, sig, mag, alb, d, counts,
                                            pb=8, qb=16))
            return tot

        float(f(datas))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f(datas)
        float(r)
        return (time.perf_counter() - t0) / reps

    a = mk(64, 256, True, 0)
    b2 = mk(64, 256, True, 1)
    ab = mk(128, 256, True, 2)        # same total work as a+b, ONE launch
    e_lo = mk(64, 128, False, 3)
    e_hi = mk(64, 1024, False, 4)
    big = mk(64, 512, True, 5)

    t_two = timed([a, b2])
    t_one_big_b = timed([ab])
    launch_s = max(5e-5, t_two - t_one_big_b)
    t_lo = timed([e_lo])
    t_hi = timed([e_hi])
    linear_s = max(1e-13, (t_hi - t_lo) / (64 * (1024 - 128) * 128))
    t_256 = timed([a])
    t_512 = timed([big])
    d_work = 5 * 64 * (512 * 512 - 256 * 256) * 128
    d_lin = 64 * (512 - 256) * 128 * linear_s
    rate_erf = d_work / max(t_512 - t_256 - d_lin, 1e-5)
    _CALIB = {"rate_erf": float(rate_erf), "linear_s": float(linear_s),
              "launch_s": float(launch_s), "measured": True}
    try:
        with open(cache, "w") as f:
            json.dump(_CALIB, f)
    except OSError:
        pass
    return _CALIB


def _launch_time_s(counts, cap, rays_per_tile, calib):
    """Seconds model of one count-bounded kernel launch over `counts` at
    capacity `cap`: quantized pair-block erf work (mirrors
    scripts/efficiency.py::kernel_work_erf) at the measured rate, plus the
    capacity-linear per-row costs (prep/base/DMA, NOT count-bounded) and
    the fixed launch cost."""
    import numpy as np

    from sgrt_tpu.ops.pallas_kernel import _block_sizes

    pb, qb = _block_sizes(cap)
    c = np.maximum(np.asarray(counts, np.int64), 0)
    quant = (np.ceil(c / pb) * pb * np.ceil(c / qb) * qb * 5).sum()
    return (float(quant) * rays_per_tile / calib["rate_erf"]
            + len(c) * cap * rays_per_tile * calib["linear_s"]
            + calib["launch_s"])


def _quantized_work_erf(counts, cap, rays_per_tile):
    """Back-compat erf-equivalent view of _launch_time_s (tests/scripts);
    uses the static constants, not the calibration."""
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

    # measured cost model (calibrated once per process on the TPU; static
    # fallback off-TPU) — search candidate dense-bucket sizes and keep the
    # modeled-fastest schedule; n_dense = 0 is the single-launch candidate
    calib = calibrate_cost_model()
    fracs = sorted({dense_frac, 1 / 32, 1 / 16, 1 / 8, 1 / 4})
    cands = {0}
    for fr in fracs:
        nd = max(1, int(t2 * fr))
        nd = min(-(-nd // multiple_of) * multiple_of, t2 - multiple_of)
        if nd > 0:
            cands.add(nd)
    best = (None, None)
    for nd in sorted(cands):
        if nd == 0:
            cfg = BucketConfig(0, cap_dense, cap_dense)
            t = _launch_time_s(worst, cap_dense, rays_per_tile, calib)
        else:
            cap_sparse = max(32, int(float(worst[nd]) * margin))
            if cap_sparse >= cap_dense:
                continue
            cfg = BucketConfig(nd, cap_dense, cap_sparse)
            t = (_launch_time_s(worst[:nd], cap_dense, rays_per_tile, calib)
                 + _launch_time_s(worst[nd:], cap_sparse, rays_per_tile,
                                  calib))
        if best[0] is None or t < best[0]:
            best = (t, cfg)
    return best[1]


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
    from sgrt_tpu.ops.pallas_chunked import tile_renderer_for

    t2 = tile_dirs.shape[0]
    if tiles is None:
        tiles = int(round(t2 ** 0.5))  # square-grid default
    # per-bucket routing (monolithic with pb/qb overrides vs chunked past
    # the monolithic ceiling) and capacity rounding through ONE helper
    cap_d, render_dense = tile_renderer_for(cfg.cap_dense, pb=pb, qb=qb,
                                            rb=rb, erf_name=erf_name,
                                            exp_name=exp_name)
    cap_s, render_sparse = tile_renderer_for(cfg.cap_sparse, pb=pb, qb=qb,
                                             rb=rb, erf_name=erf_name,
                                             exp_name=exp_name)
    cfg = BucketConfig(cfg.n_dense, cap_d, cap_s)
    dense_ids, idx_d, sparse_ids, idx_s, counts = bucketed_tile_indices(
        scene, view, tiles, cfg, focal_length=focal_length)
    overflow = (jnp.sum(counts[sparse_ids] > cfg.cap_sparse)
                + jnp.sum(counts[dense_ids] > cfg.cap_dense)).astype(jnp.int32)

    colors_s = render_sparse(gather_tiles(scene, idx_s), o,
                             tile_dirs[sparse_ids], counts[sparse_ids])

    colors = jnp.zeros((t2,) + colors_s.shape[1:], colors_s.dtype)
    colors = colors.at[sparse_ids].set(colors_s)

    if cfg.n_dense > 0:
        colors_d = render_dense(gather_tiles(scene, idx_d), o,
                                tile_dirs[dense_ids], counts[dense_ids])
        colors = colors.at[dense_ids].set(colors_d)
    return colors, counts, overflow
