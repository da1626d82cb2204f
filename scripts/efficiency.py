"""Hardware-efficiency report — the TPU analog of the reference's
run-hpc.sh + thesis SIMD-efficiency chapter (/root/reference/run-hpc.sh:1-46,
thesis/main.tex:1482-1543, 1930-1942: PAPI_VEC_INS efficiency per hot
function vs a 1-vector-instr/cycle peak model).

TPU hardware counters are not exposed through this runtime, so the peak is
MEASURED, not modeled: synthetic Pallas kernels establish the achievable
VPU elementwise-FMA rate, the transcendental (exp) rate, and the in-kernel
erf_as5 evaluation rate on this chip. The production kernels' achieved
erf-evaluation rates (from the exact count-quantized work model of the
count-bounded p/q loops) are then expressed as a percentage of that
measured erf peak — the same "how close to speed-of-light" question the
thesis answers with PAPI vector-instruction ratios.

Writes docs/EFFICIENCY.md. Run on the TPU:  python scripts/efficiency.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TEAPOT = "/root/reference/test-objects/teapot.obj"
CUBE = "/root/reference/test-objects/cube.obj"
ANGLES = [0.0, 30.0, 45.0, 60.0, 90.0]


def _fetch_time(f, n_iter=20, warmup=2):
    for _ in range(warmup):
        r = f()
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = f()
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / n_iter


# ---------------------------------------------------------------------------
# measured peaks (synthetic Pallas kernels, all data VMEM-resident)
# ---------------------------------------------------------------------------

_SHAPE = (512, 512)          # one VMEM block, 1 MiB f32
_UNROLL = 64                 # independent ops per loop step (hide latency)
_STEPS = 64


def _peak_kernel(x_ref, o_ref, *, body):
    x = x_ref[...]

    def step(_, acc):
        return body(acc, x)

    o_ref[...] = jax.lax.fori_loop(0, _STEPS, step, jnp.zeros_like(x))


def _run_peak(body):
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, -0.01, _SHAPE),
                    jnp.float32)
    call = pl.pallas_call(
        functools.partial(_peak_kernel, body=body),
        out_shape=jax.ShapeDtypeStruct(_SHAPE, jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    f = jax.jit(call)
    t = _fetch_time(lambda: f(x), n_iter=10)
    return t


def measure_peaks():
    elems = _SHAPE[0] * _SHAPE[1] * _STEPS * _UNROLL

    def fma_body(acc, x):
        for j in range(_UNROLL):
            acc = acc * 1.0000001 + x
        return acc

    t = _run_peak(fma_body)
    fma_peak = 2 * elems / t  # FLOP/s (mul+add)

    def exp_body(acc, x):
        for j in range(_UNROLL):
            acc = acc + jnp.exp(x - j * 0.001)
        return acc

    t = _run_peak(exp_body)
    exp_peak = elems / t  # exp evals/s (plus one add each, ignored)

    from sgrt_tpu.ops.approx import erf_as5

    def erf_body(acc, x):
        for j in range(_UNROLL):
            acc = acc + erf_as5(x - j * 0.001)
        return acc

    t = _run_peak(erf_body)
    erf_peak = elems / t  # erf_as5 evals/s
    return fma_peak, exp_peak, erf_peak


# ---------------------------------------------------------------------------
# production-kernel achieved rates (exact count-quantized work model)
# ---------------------------------------------------------------------------

def kernel_work_erf(counts, pb, qb, rays, taps=5):
    """erf evals of the fused forward for one bucket: per tile,
    ceil(c/pb)*pb x ceil(c/qb)*qb pair-block area x rays x taps, plus the
    full-capacity base pass (capacity x rays erf)."""
    c = np.maximum(np.asarray(counts, np.int64), 0)
    quant = (np.ceil(c / pb) * pb * np.ceil(c / qb) * qb).sum()
    return float(quant * rays * taps)


def frame_report(scene, tiles, bucket_cfg, label, rows):
    import optax

    from sgrt_tpu.models.gaussians import scene_from_obj  # noqa
    from sgrt_tpu.ops.frame import (orbit_camera, probe_capacity,
                                    render_orbit_frame)
    from sgrt_tpu.ops.pallas_kernel import _block_sizes
    from sgrt_tpu.ops.tiling import as_grid, tile_membership
    from sgrt_tpu.parallel.fit import init_state, make_frame_train_step

    cap = max(64, int(probe_capacity(scene, ANGLES, -4.0, 1.0, tiles) * 1.3))
    cam = orbit_camera(30.0, -4.0, 1.0, 256, 256)
    tx, ty = as_grid(tiles)
    rays = 65536 // (tx * ty)
    counts = np.asarray(jnp.sum(
        tile_membership(scene, cam.view_matrix, tiles), axis=-1))

    # work model per bucket
    if bucket_cfg is not None and bucket_cfg.n_dense > 0:
        order = np.argsort(-counts)
        dense, sparse = order[:bucket_cfg.n_dense], order[bucket_cfg.n_dense:]
        w = 0.0
        for ids, c_cap in ((dense, bucket_cfg.cap_dense),
                           (sparse, bucket_cfg.cap_sparse)):
            pb, qb = _block_sizes(c_cap)
            w += kernel_work_erf(counts[ids], pb, qb, rays)
            w += len(ids) * c_cap * rays  # base pass at capacity
    else:
        pb, qb = _block_sizes(cap)
        w = kernel_work_erf(counts, pb, qb, rays) + len(counts) * cap * rays

    fwd = lambda: render_orbit_frame(
        scene, 30.0, -4.0, 1.0, width=256, height=256, tiles=tiles,
        capacity=cap, backend="pallas", erf_name="as5",
        bucket_cfg=bucket_cfg)[0]
    t_fwd = _fetch_time(fwd, n_iter=10)

    opt = optax.adam(1e-3)
    step = make_frame_train_step(opt, width=256, height=256, tiles=tiles,
                                 capacity=cap, backend="pallas",
                                 erf_name="as5", bucket_cfg=bucket_cfg)
    state = init_state(scene, opt)
    o, dirs = cam.rays()
    target = jnp.zeros((256, 256, 3), jnp.float32)

    def stp(st):
        st, loss, ovf = step(st, cam.view_matrix, o, dirs, target)
        return st, loss

    state, _ = stp(state)
    float(_)
    t0 = time.perf_counter()
    n_it = 10
    for _ in range(n_it):
        state, loss = stp(state)
    float(loss)
    t_step = (time.perf_counter() - t0) / n_it

    # fwd+bwd model: bwd = pass A (taps erf) + pass B (taps erf_and_gauss,
    # counted as 1 erf-equivalent each) ≈ 2x fwd main loop + base
    w_bwd = 2 * w
    rows.append((label + "_fwd", t_fwd, w))
    rows.append((label + "_step", t_step, w + w_bwd))
    return t_fwd, t_step


def main():
    from sgrt_tpu.models.gaussians import scene_from_obj
    from sgrt_tpu.ops.frame import probe_buckets

    backend = jax.default_backend()
    print(f"backend: {backend} device: {jax.devices()[0]}")
    fma_peak, exp_peak, erf_peak = measure_peaks()
    print(f"measured peaks: fma {fma_peak/1e12:.2f} TFLOP/s, "
          f"exp {exp_peak/1e9:.1f} Gexp/s, erf_as5 {erf_peak/1e9:.1f} Gerf/s")

    rows = []
    teapot = scene_from_obj(TEAPOT)
    tiles = (16, 32)
    bc = probe_buckets(teapot, ANGLES, -4.0, 1.0, tiles, margin=1.3)
    frame_report(teapot, tiles, bc, "teapot_16x32_bucketed", rows)
    cube = scene_from_obj(CUBE)
    bc_c = probe_buckets(cube, ANGLES, -4.0, 1.0, 16, margin=1.3)
    frame_report(cube, 16, bc_c, "cube_16_bucketed", rows)

    lines = [
        "# EFFICIENCY — hardware-utilization report (run-hpc.sh analog)",
        "",
        f"Device: `{jax.devices()[0]}` (backend {backend}).",
        "Method: measured peaks from synthetic VMEM-resident Pallas kernels",
        "(the TPU has no user-visible PAPI counters; the reference models",
        "peak as 1 vector instruction/cycle, run-hpc.sh + thesis",
        "main.tex:1520-1536 — here the peak is *measured* instead).",
        "",
        "## Measured device peaks",
        "",
        "| quantity | value |",
        "|---|---|",
        f"| VPU elementwise FMA | {fma_peak/1e12:.2f} TFLOP/s |",
        f"| `jnp.exp` throughput (in-kernel) | {exp_peak/1e9:.1f} Gexp/s |",
        f"| `erf_as5` throughput (in-kernel) | {erf_peak/1e9:.1f} Gerf/s |",
        "",
        "## Production kernels (achieved vs measured erf peak)",
        "",
        "erf-work = exact count-quantized work model of the count-bounded",
        "p/q loops (ceil(c/pb)pb x ceil(c/qb)qb x rays x 5 taps + base pass).",
        "Backward ≈ 2x forward erf-work (recompute pass A + gradient pass B).",
        "",
        "| kernel | time (ms) | erf-work | achieved Gerf/s | % of erf peak |",
        "|---|---|---|---|---|",
    ]
    for label, t, w in rows:
        rate = w / t
        lines.append(f"| {label} | {t*1e3:.1f} | {w/1e9:.2f} G | "
                     f"{rate/1e9:.1f} | {100*rate/erf_peak:.0f}% |")
    lines += [
        "",
        "Interpretation: the fused kernels' per-element work is larger than",
        "a bare erf (argument prep, coeff multiply, accumulate ≈ erf-equal",
        "FLOPs), so ~50% of erf peak is the VPU-bound speed-of-light for",
        "the forward; the backward's pass B carries ~3x the elementwise",
        "chain per (p,q,r,k) on top of its erf+gauss.",
        "",
        "The reference's own efficiency on its hot functions (thesis",
        "tab:mode_8_mt_wae): broadcast_radiance 49.35%, broadcast_",
        "transmittance 57.14% of its 1-instr/cycle model — the same",
        "~half-of-peak regime.",
    ]
    os.makedirs("docs", exist_ok=True)
    with open("docs/EFFICIENCY.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
