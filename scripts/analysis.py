"""Numerical analysis CSVs/plots — the analog of the reference's Julia
scripts (julia/cmp_erf.jl: approximation error curves; julia/transmittance.jl:
closed-form vs numerically integrated transmittance along a ray;
julia/approx_erf.jl: coefficient generation, which lives in
sgrt_tpu/ops/approx.py at import time).

Writes CSVs into --out (default csv/), and PNG plots next to them when
matplotlib is importable.

Usage: python scripts/analysis.py [--out csv/]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def write_csv(path, header, columns):
    with open(path, "w") as f:
        f.write(",".join(header) + "\n")
        for row in zip(*columns):
            f.write(",".join(f"{v:.9g}" for v in row) + "\n")
    print(f"wrote {path}")


def erf_exp_error_curves(out_dir):
    import jax.numpy as jnp

    from sgrt_tpu.ops import approx

    x = np.linspace(-6, 6, 2401).astype(np.float32)
    ref = np.vectorize(math.erf)(x.astype(np.float64))
    cols = [x, ref]
    names = ["x", "erf"]
    for name, fn in approx.ERF_IMPLS.items():
        y = np.asarray(fn(jnp.asarray(x)), np.float64)
        cols += [y, y - ref]
        names += [name, name + "_err"]
    write_csv(os.path.join(out_dir, "erf_accuracy.csv"), names, cols)

    xe = np.linspace(-16, 0, 2401).astype(np.float32)
    refe = np.exp(xe.astype(np.float64))
    cols = [xe, refe]
    names = ["x", "exp"]
    for name, fn in approx.EXP_IMPLS.items():
        y = np.asarray(fn(jnp.asarray(xe)), np.float64)
        rel = (y - refe) / np.maximum(refe, 1e-300)
        cols += [y, rel]
        names += [name, name + "_relerr"]
    write_csv(os.path.join(out_dir, "exp_accuracy.csv"), names, cols)


def transmittance_curve(out_dir):
    """Closed form vs Riemann integration along one ray through the fixed
    3-Gaussian scene (tests/transmittance.cpp:7-38 / julia/transmittance.jl)."""
    import jax.numpy as jnp

    from sgrt_tpu.models.gaussians import make_scene
    from sgrt_tpu.ops.reference import density, transmittance

    scene = make_scene(
        mu=[[0.0, 0.0, 0.7], [0.0, 0.0, 1.2], [0.0, 0.3, 1.0]],
        sigma=[0.1, 0.2, 0.15],
        magnitude=[1.0, 1.0, 1.0],
        albedo=[[1, 0, 0], [0, 1, 0], [0, 0, 1]],
    )
    import jax

    o = jnp.asarray([0.0, 0.0, 0.0])
    n = jnp.asarray([0.0, 0.0, 1.0])
    ss = np.linspace(0.0, 2.5, 126).astype(np.float32)
    T = np.asarray(jax.jit(jax.vmap(
        lambda s: transmittance(o, n, s, scene)))(jnp.asarray(ss)))
    # Riemann integration of the density on a fixed fine grid, all s at once
    # (exp(-delta * cumulative density) — same integrator as
    # reference.transmittance_step / rt.cpp:8-17, vectorized over s).
    delta = 0.01
    grid = jnp.arange(0.0, 2.5 + delta, delta)
    dens_g = jax.jit(jax.vmap(lambda t: density(o + t * n, scene)))(grid)
    cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(dens_g) * delta])
    steps = np.minimum((ss / delta).astype(np.int64) + 1, len(grid))
    Ts = np.exp(-np.asarray(cum)[steps])
    D = np.asarray(jax.jit(jax.vmap(
        lambda s: density(o + s * n, scene)))(jnp.asarray(ss)))
    err = np.abs(T - Ts)
    write_csv(os.path.join(out_dir, "transmittance.csv"),
              ["s", "T", "T_s", "err", "D"], [ss, T, Ts, err, D])


def maybe_plot(out_dir):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable — CSVs only")
        return
    import csv

    for stem, ycols in (("erf_accuracy", None), ("exp_accuracy", None),
                        ("transmittance", ["T", "T_s", "D"])):
        path = os.path.join(out_dir, stem + ".csv")
        with open(path) as f:
            reader = csv.reader(f)
            header = next(reader)
            data = np.array([[float(v) for v in row] for row in reader])
        fig, ax = plt.subplots(figsize=(8, 4.5))
        xs = data[:, 0]
        for i, name in enumerate(header[1:], start=1):
            if ycols is not None and name not in ycols:
                continue
            if ycols is None and not (name.endswith("_err") or name.endswith("_relerr")):
                continue
            ax.plot(xs, np.abs(data[:, i]) if ycols is None else data[:, i],
                    label=name, linewidth=1)
        if ycols is None:
            ax.set_yscale("log")
        ax.legend(fontsize=7)
        ax.set_xlabel(header[0])
        fig.tight_layout()
        png = os.path.join(out_dir, stem + ".png")
        fig.savefig(png, dpi=120)
        plt.close(fig)
        print(f"wrote {png}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="csv")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    erf_exp_error_curves(args.out)
    transmittance_curve(args.out)
    maybe_plot(args.out)


if __name__ == "__main__":
    main()
