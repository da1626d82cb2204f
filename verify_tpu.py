"""On-device correctness verification — compiled Pallas vs XLA vs oracle.

The analog of the reference's img-error test run on the PRODUCTION backend
(src/volumetric-ray-tracer/tests/img-error.cpp:27-60): every check here runs
the Mosaic-COMPILED kernel (interpret=False) on the actual accelerator and
compares pixels AND gradients against the pure-XLA formulation (ops.render)
and the un-fused oracle (ops.reference). The pytest suite runs the same
math in interpret mode on CPU; this script is the hardware evidence.

Run directly (prints a JSON report) or via bench.py, which embeds the
`parity_ok` verdict in the headline benchmark line.

Checks:
  1. fused forward, untiled: render_rays_pallas vs render_rays (XLA)
     vs render_rays_reference (oracle), cube scene, 64x64 rays.
  2. fused forward, tiled + counts-bounded: render_orbit_frame
     (backend=pallas) vs (backend=xla), 256x256, cube + teapot.
  3. gradients, untiled: custom VJP of render_rays_pallas vs jax.grad of
     the XLA path, all four scene fields.
  4. gradients, tiled through the frame train loss (gather + kernel +
     scatter-add transpose): pallas vs xla backend gradients, teapot.
  5. counts semantics on hardware: kernel at capacity with counts=c equals
     kernel on the c-truncated batch (fwd + bwd).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

CUBE_OBJ = "/root/reference/test-objects/cube.obj"
TEAPOT_OBJ = "/root/reference/test-objects/teapot.obj"


def _scene(path, n_fallback):
    from sgrt_tpu.models.gaussians import scene_from_obj, scene_from_vertices

    if os.path.exists(path):
        return scene_from_obj(path)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n_fallback, 3)).astype(np.float32)
    pts /= np.maximum(np.abs(pts).max(axis=1, keepdims=True), 1e-6)
    return scene_from_vertices(pts)


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = max(float(np.max(np.abs(b))), 1e-12)
    return float(np.max(np.abs(a - b)) / denom)


def run_checks(quick: bool = False):
    import jax
    import jax.numpy as jnp

    from sgrt_tpu.models.camera import Camera
    from sgrt_tpu.ops.frame import orbit_camera, probe_capacity, render_orbit_frame
    from sgrt_tpu.ops.pallas_kernel import render_rays_pallas_impl, tw_pallas
    from sgrt_tpu.ops.reference import render_rays_reference
    from sgrt_tpu.ops.render import render_rays_impl

    backend = jax.default_backend()
    interpret = backend != "tpu"  # compiled on TPU; interpret elsewhere
    report = {"device": str(jax.devices()[0]), "compiled": not interpret,
              "checks": {}}
    ok = True

    import time

    t_start = time.perf_counter()

    def record(name, err, tol):
        nonlocal ok
        passed = bool(err <= tol)
        ok = ok and passed
        report["checks"][name] = {"max_rel_err": err, "tol": tol, "ok": passed}
        print(f"[verify {time.perf_counter() - t_start:7.1f}s] {name}: "
              f"err={err:.2e} {'ok' if passed else 'FAIL'}", file=sys.stderr)

    cube = _scene(CUBE_OBJ, 386)
    cam = orbit_camera(30.0, -4.0, 1.0, 64, 64)
    o, dirs = cam.rays()

    # --- 1. forward untiled: pallas vs xla vs oracle -----------------------
    px_pallas = np.asarray(jax.jit(
        lambda: render_rays_pallas_impl(o, dirs, cube, erf_name="as5",
                                        interpret=interpret))())
    px_xla = np.asarray(jax.jit(lambda: render_rays_impl(o, dirs, cube))())
    record("fwd_untiled_vs_xla", _rel_err(px_pallas, px_xla), 2e-5)
    if not quick:
        px_oracle = np.asarray(jax.jit(
            lambda: render_rays_reference(o, dirs, cube))())
        # oracle tolerance: the fused path hoists erf1 and collapses the pdf
        # (ops.render docstring) — algebraically equal, but the f32 rounding
        # of the different association accumulates over N Gaussians
        record("fwd_untiled_vs_oracle", _rel_err(px_pallas, px_oracle), 2.5e-4)

    # --- 2. forward tiled + counts, full frames ----------------------------
    scenes = [("cube", cube)] if quick else [
        ("cube", cube), ("teapot", _scene(TEAPOT_OBJ, 3644))]
    for name, sc in scenes:
        capacity = max(64, int(probe_capacity(sc, [30.0], -4.0, 1.0, 16) * 1.2))
        img_p, ovf = render_orbit_frame(
            sc, 30.0, -4.0, 1.0, width=256, height=256, tiles=16,
            capacity=capacity, backend="pallas", erf_name="as5")
        img_x, _ = render_orbit_frame(
            sc, 30.0, -4.0, 1.0, width=256, height=256, tiles=16,
            capacity=capacity, backend="xla")
        assert int(ovf) == 0, f"{name}: tile capacity overflow in verify"
        # pallas uses the as5 erf (f32-exact per element, |err|<=1.5e-7);
        # summed over thousands of Gaussians then exponentiated, the
        # accumulated deviation vs lax.erf reaches ~1e-4 relative
        record(f"fwd_tiled_{name}", _rel_err(img_p, img_x), 2.5e-4)

    # --- 3. gradients untiled: custom VJP vs XLA autodiff ------------------
    tgt = jnp.zeros((dirs.shape[0], 3), jnp.float32)

    def loss_pallas(s):
        c = render_rays_pallas_impl(o, dirs, s, erf_name="as5",
                                    interpret=interpret)
        return jnp.mean((c - tgt) ** 2)

    def loss_xla(s):
        return jnp.mean((render_rays_impl(o, dirs, s) - tgt) ** 2)

    g_p = jax.jit(jax.grad(loss_pallas))(cube)
    g_x = jax.jit(jax.grad(loss_xla))(cube)
    for f in ("mu", "sigma", "magnitude", "albedo"):
        record(f"grad_untiled_{f}",
               _rel_err(getattr(g_p, f), getattr(g_x, f)), 5e-4)

    # --- 4. gradients through the tiled frame train loss -------------------
    if not quick:
        from sgrt_tpu.parallel.fit import make_frame_value_and_grad

        sc = scenes[-1][1]
        capacity = max(64, int(probe_capacity(sc, [0.0], -4.0, 1.0, 8) * 1.2))
        cam_t = orbit_camera(0.0, -4.0, 1.0, 128, 128)
        o_t, dirs_t = cam_t.rays()
        target = jnp.zeros((128, 128, 3), jnp.float32)
        grads = {}
        for be in ("pallas", "xla"):
            vg = jax.jit(make_frame_value_and_grad(
                width=128, height=128, tiles=8, capacity=capacity,
                backend=be, erf_name="as5" if be == "pallas" else "exact"))
            (loss, ovf), g = vg(sc, cam_t.view_matrix, o_t, dirs_t, target)
            assert int(ovf) == 0
            grads[be] = jax.tree_util.tree_map(np.asarray, g)
        for f in ("mu", "sigma", "magnitude", "albedo"):
            record(f"grad_tiled_teapot_{f}",
                   _rel_err(getattr(grads["pallas"], f),
                            getattr(grads["xla"], f)), 5e-4)

    # --- 5. counts semantics on hardware (fwd + bwd) -----------------------
    # Contract (ops.pallas_kernel module docstring): counts bound the LIVE
    # PREFIX — rows >= count must be inert (coeff=0), exactly what
    # gather_tiles' dummy-index padding produces. tw for dead rows is
    # unspecified (the pipeline multiplies it by coeff=0), so comparisons
    # mask to live rows.
    rng = np.random.default_rng(1)
    n_cap, n_live, r = 64, 40, 128
    zmask = np.arange(n_cap) < n_live
    z = jnp.asarray(zmask)[None, :, None]
    mu_bar = jnp.asarray(rng.normal(size=(1, n_cap, r)), jnp.float32)
    # physical scale: small positive weights keep |exponent| ~ O(1) so tw
    # stays O(1) and relative error is meaningful
    coeff = jnp.asarray(rng.uniform(0.01, 0.1, (1, n_cap, r)),
                        jnp.float32) * z
    sigma = jnp.asarray(rng.uniform(0.5, 1.5, (1, n_cap)), jnp.float32)
    inv = 1.0 / (1.4142135 * sigma)
    counts = jnp.full((1,), n_live, jnp.int32)

    def s_counted(args):
        mb, co = args
        return jnp.sum(tw_pallas(mb, co, sigma, inv, counts,
                                 interpret=interpret) * z)

    def s_full(args):
        # same inert-padded inputs, no counts: full-capacity loops
        mb, co = args
        return jnp.sum(tw_pallas(mb, co, sigma, inv, None,
                                 interpret=interpret) * z)

    v_c, g_c = jax.jit(jax.value_and_grad(s_counted))((mu_bar, coeff))
    v_t, g_t = jax.jit(jax.value_and_grad(s_full))((mu_bar, coeff))
    record("counts_fwd", _rel_err(v_c, v_t), 1e-5)
    record("counts_bwd_dmu",
           _rel_err(np.asarray(g_c[0])[:, zmask], np.asarray(g_t[0])[:, zmask]),
           1e-4)
    record("counts_bwd_dcoeff",
           _rel_err(np.asarray(g_c[1])[:, zmask], np.asarray(g_t[1])[:, zmask]),
           1e-4)

    report["parity_ok"] = ok
    return report


def main():
    quick = "--quick" in sys.argv
    report = run_checks(quick=quick)
    print(json.dumps(report, indent=2))
    return 0 if report["parity_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
