"""Certify BASELINE.json configs 3 & 5 AT THEIR STATED RESOLUTIONS on the
TPU, with cross-backend parity — writes docs/BASELINE_CONFIGS.json.

  config 3: "teapot.obj scene with tile-based Gaussian culling
             (tiling_projection) at 512x512"
  config 5: "monkey.obj at 1024x1024, rays sharded across multi-host pod
             slice, grad allreduce overlap"

For each: production (Pallas, bucketed-tiled) forward timed over an orbit,
pixel parity vs the pure-XLA backend at the same tile configuration,
gradient parity between the two backends, and timed fwd+bwd train steps —
config 5's step runs through the MESH path (shard_map + pmean over a
1-device mesh: the full multi-chip program; this host has one chip, so
N>1 execution is certified separately by the 8-virtual-device tests and
MULTICHIP dryrun). Overflow is asserted zero everywhere, so no Gaussian is
silently dropped at either resolution.

Reference configs: BASELINE.json configs[2], configs[4]; scenes
/root/reference/test-objects/{teapot,monkey}.obj. Run on the TPU:
    python scripts/baseline_configs.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ANGLES = [0.0, 30.0, 45.0, 60.0, 90.0]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "BASELINE_CONFIGS.json")


def _log(*a):
    print(*a, flush=True)


def certify(name, obj_path, res, tiles, use_mesh):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from sgrt_tpu.models.gaussians import scene_from_obj
    from sgrt_tpu.ops.frame import (orbit_camera, probe_buckets,
                                    probe_capacity, render_orbit_frame)
    from sgrt_tpu.parallel.fit import (init_state, make_frame_train_step,
                                       make_frame_value_and_grad)

    scene = scene_from_obj(obj_path)
    row = {"scene": os.path.basename(obj_path), "n_gaussians": scene.n,
           "resolution": f"{res}x{res}", "tiles": list(tiles),
           "sharded_step": use_mesh}
    if use_mesh:
        # self-describing artifact: this rig has ONE real chip; the sharded
        # mechanics are validated separately on an 8-device virtual mesh
        # (tests/test_parallel.py, __graft_entry__.dryrun_multichip)
        row["sharded_note"] = ("sharded-step mechanics validated on an "
                               "8-device virtual CPU mesh; timings here are "
                               f"from a mesh of {jax.device_count()} real "
                               "device(s)")

    _log(f"[{name}] probing {row}")
    cap = max(64, int(probe_capacity(scene, ANGLES, -4.0, 1.0, tiles) * 1.3))
    cfg = probe_buckets(scene, ANGLES, -4.0, 1.0, tiles, margin=1.3)
    row["capacity"] = cap
    row["buckets"] = {"n_dense": cfg.n_dense, "cap_dense": cfg.cap_dense,
                      "cap_sparse": cfg.cap_sparse}

    # --- production forward (Pallas, bucketed) over an orbit -------------
    common = dict(width=res, height=res, tiles=tiles, capacity=cap)
    img, ovf = render_orbit_frame(scene, 30.0, -4.0, 1.0, backend="pallas",
                                  bucket_cfg=cfg, **common)
    assert int(ovf) == 0, f"{name}: forward overflow"
    float(jnp.sum(img))
    frames = 20
    t0 = time.perf_counter()
    for i in range(frames):
        img, _ = render_orbit_frame(scene, i * (360.0 / frames), -4.0, 1.0,
                                    backend="pallas", bucket_cfg=cfg, **common)
    float(jnp.sum(img))
    dt = (time.perf_counter() - t0) / frames
    row["forward_ms"] = round(dt * 1e3, 2)
    row["forward_rays_per_s"] = round(res * res / dt, 1)
    _log(f"[{name}] forward {row['forward_ms']} ms")

    # --- pixel parity vs the pure-XLA backend ----------------------------
    img_p, _ = render_orbit_frame(scene, 30.0, -4.0, 1.0, backend="pallas",
                                  bucket_cfg=cfg, **common)
    img_x, ovf_x = render_orbit_frame(scene, 30.0, -4.0, 1.0, backend="xla",
                                      **common)
    assert int(ovf_x) == 0
    a, b = np.asarray(img_p), np.asarray(img_x)
    row["pixel_max_abs_diff"] = float(np.abs(a - b).max())
    row["pixel_mse"] = float(np.mean((a - b) ** 2))
    # parity criterion: float maxdiff well under one u8 quantum (1/255 —
    # the reference's output precision, rt.h:239-243) and the packed u8
    # frames agreeing on (effectively) every pixel.
    u8a = (np.minimum(np.clip(a, 0, None), 1.0) * 255.0).astype(np.uint8)
    u8b = (np.minimum(np.clip(b, 0, None), 1.0) * 255.0).astype(np.uint8)
    row["u8_diff_pixels"] = int((u8a != u8b).sum())
    row["pixel_allclose"] = bool(
        row["pixel_max_abs_diff"] < 1.0 / 255.0
        and row["u8_diff_pixels"] <= a.size // 10000)
    _log(f"[{name}] pixel parity maxdiff {row['pixel_max_abs_diff']:.2e} "
         f"u8diff {row['u8_diff_pixels']}")

    # --- gradient parity between backends --------------------------------
    cam = orbit_camera(30.0, -4.0, 1.0, res, res)
    o, dirs = cam.rays()
    # target = the scene rendered from ANOTHER angle: a real gradient
    # signal (rendering the same view would sit at the loss minimum and
    # compare pure noise gradients)
    target, ovf_t = render_orbit_frame(scene, 35.0, -4.0, 1.0,
                                       backend="pallas", bucket_cfg=cfg,
                                       **common)
    assert int(ovf_t) == 0
    grad_rel = {}
    grads = {}

    # production (Pallas bucketed) gradients: one program, full frame
    vg = make_frame_value_and_grad(width=res, height=res, tiles=tiles,
                                   capacity=cap, backend="pallas",
                                   bucket_cfg=cfg)
    t0 = time.perf_counter()
    (loss, ovf_g), g = jax.jit(vg)(scene, cam.view_matrix, o, dirs, target)
    assert int(ovf_g) == 0
    grads["pallas"] = jax.device_get(g)
    float(loss)
    _log(f"[{name}] pallas vg done in {time.perf_counter()-t0:.1f} s")

    # XLA-oracle gradients, slab-accumulated: gradients over disjoint pixel
    # sets add linearly, so the frame gradient is the sum of per-tile-slab
    # gradients / total size. One full-frame XLA vg program at these
    # resolutions exceeds what this runtime will execute in one call, so
    # each slab is its own (short) device program.
    from sgrt_tpu.ops.render import _tile_rays
    from sgrt_tpu.ops.tiling import as_grid, gather_tiles, tile_indices
    from sgrt_tpu.parallel.fit import _xla_tile_render

    @jax.jit
    def slab_grad(scene, idx_b, d_b, t_b, o):
        def f(s):
            tiled = gather_tiles(s, idx_b)
            colors = _xla_tile_render(tiled, o, d_b, 32, 2)
            return jnp.sum((colors - t_b) ** 2)
        return jax.value_and_grad(f)(scene)

    t0 = time.perf_counter()
    cap_r = -(-cap // 32) * 32   # _radiance_block needs K % q_block == 0
    idx, counts = jax.jit(tile_indices, static_argnames=("tiles", "capacity"))(
        scene, cam.view_matrix, tiles=tiles, capacity=cap_r)
    assert int(jnp.max(counts)) <= cap
    d = _tile_rays(dirs, res, res, tiles)
    t = _tile_rays(target.reshape(-1, 3), res, res, tiles)
    tx_, ty_ = as_grid(tiles)
    t2 = tx_ * ty_
    slab = t2 // 32
    acc_loss, acc = 0.0, None
    for s0 in range(0, t2, slab):
        sl, sg = slab_grad(scene, idx[s0:s0 + slab], d[s0:s0 + slab],
                           t[s0:s0 + slab], o)
        acc_loss += float(sl)
        sg = jax.device_get(sg)
        acc = sg if acc is None else jax.tree_util.tree_map(
            lambda a_, b_: a_ + b_, acc, sg)
    size = t2 * d.shape[1] * 3
    grads["xla"] = jax.tree_util.tree_map(lambda a_: a_ / size, acc)
    _log(f"[{name}] xla slab vg done in {time.perf_counter()-t0:.1f} s "
         f"(loss {acc_loss / size:.3e})")
    for f in ("mu", "sigma", "magnitude", "albedo"):
        gp, gx = np.asarray(getattr(grads["pallas"], f)), np.asarray(
            getattr(grads["xla"], f))
        denom = max(float(np.abs(gx).max()), 1e-12)
        grad_rel[f] = float(np.abs(gp - gx).max() / denom)
    row["grad_max_rel_diff"] = grad_rel
    row["grad_allclose"] = bool(all(v < 1e-3 for v in grad_rel.values()))

    # --- fwd+bwd train step ----------------------------------------------
    mesh = None
    if use_mesh:
        from sgrt_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices()[:1])
        row["mesh_devices"] = mesh.devices.size
    opt = optax.adam(1e-3)
    step = make_frame_train_step(opt, width=res, height=res, tiles=tiles,
                                 capacity=cap, backend="pallas",
                                 erf_name="as5", bucket_cfg=cfg, mesh=mesh)
    state = init_state(scene, opt, mesh)
    state, loss, ovf_s = step(state, cam.view_matrix, o, dirs, target)
    assert int(ovf_s) == 0, f"{name}: step overflow"
    first_loss = float(loss)
    steps = 10
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, _ = step(state, cam.view_matrix, o, dirs, target)
    last_loss = float(loss)
    dt = (time.perf_counter() - t0) / steps
    row["step_ms"] = round(dt * 1e3, 2)
    row["step_rays_per_s"] = round(res * res / dt, 1)
    row["step_compiles"] = step._cache_size()
    row["loss_first"] = first_loss
    row["loss_after_10"] = last_loss
    assert last_loss < first_loss, f"{name}: loss did not decrease"
    assert step._cache_size() == 1, f"{name}: step recompiled"
    row["ok"] = bool(row["pixel_allclose"] and row["grad_allclose"])
    return row


def certify_aniso(name, obj_path, res, tiles, scale_mul=(1.6, 0.7, 1.0)):
    """Production ANISOTROPIC benchmark row (BASELINE config-4 wording
    'fit means/covariances/opacities' exercised beyond the isotropic
    sigma): stretched-scale teapot, fused aniso kernel fwd over an orbit,
    pixel parity vs the XLA aniso formulation, gradient parity, and timed
    fwd+bwd aniso train steps (bucketed, saved-T backward)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from sgrt_tpu.models.gaussians import scene_from_obj
    from sgrt_tpu.ops import anisotropic as an
    from sgrt_tpu.ops.frame import orbit_camera, probe_buckets, probe_capacity
    from sgrt_tpu.parallel.fit import init_state, make_aniso_frame_train_step

    iso = scene_from_obj(obj_path)
    scene = an.from_isotropic(iso)
    scene = scene.replace(scale=scene.scale * jnp.asarray([scale_mul],
                                                          jnp.float32))
    proxy = an.iso_proxy(scene)
    row = {"scene": os.path.basename(obj_path), "n_gaussians": scene.n,
           "resolution": f"{res}x{res}", "tiles": list(tiles),
           "scale_multipliers": list(scale_mul)}

    cap = max(64, int(probe_capacity(proxy, ANGLES, -4.0, 1.0, tiles) * 1.3))
    cfg = probe_buckets(proxy, ANGLES, -4.0, 1.0, tiles, margin=1.3)
    row["capacity"] = cap
    row["buckets"] = {"n_dense": cfg.n_dense, "cap_dense": cfg.cap_dense,
                      "cap_sparse": cfg.cap_sparse}
    _log(f"[{name}] {row}")

    cam = orbit_camera(30.0, -4.0, 1.0, res, res)

    def frame(angle, backend):
        return an.render_tiled_aniso(
            scene, orbit_camera(angle, -4.0, 1.0, res, res), tiles=tiles,
            capacity=cap, backend=backend,
            bucket_cfg=cfg if backend == "pallas" else None)

    img, ovf = frame(30.0, "pallas")
    assert int(ovf) == 0, f"{name}: forward overflow"
    float(jnp.sum(img))
    frames = 20
    t0 = time.perf_counter()
    for i in range(frames):
        img, _ = frame(i * (360.0 / frames), "pallas")
    float(jnp.sum(img))
    dt = (time.perf_counter() - t0) / frames
    row["forward_ms"] = round(dt * 1e3, 2)
    row["forward_rays_per_s"] = round(res * res / dt, 1)
    _log(f"[{name}] forward {row['forward_ms']} ms")

    # pixel parity vs the XLA aniso formulation (same tiling)
    img_p, _ = frame(30.0, "pallas")
    img_x, ovf_x = frame(30.0, "xla")
    assert int(ovf_x) == 0
    a, b = np.asarray(img_p), np.asarray(img_x)
    row["pixel_max_abs_diff"] = float(np.abs(a - b).max())
    row["pixel_allclose"] = bool(np.abs(a - b).max() < 2e-3)

    # gradient parity: fused-kernel VJP vs XLA autodiff (64x64 sub-frame)
    gcam = orbit_camera(30.0, -4.0, 1.0, 64, 64)
    go, gdirs = gcam.rays()
    from sgrt_tpu.ops.anisotropic import render_rays_aniso_impl
    from sgrt_tpu.ops.pallas_aniso import render_rays_pallas_aniso_impl

    def loss_p(s):
        return jnp.sum(render_rays_pallas_aniso_impl(go, gdirs, s) ** 2)

    def loss_x(s):
        return jnp.sum(render_rays_aniso_impl(go, gdirs, s) ** 2)

    gp = jax.jit(jax.grad(loss_p))(scene)
    gx = jax.jit(jax.grad(loss_x))(scene)
    rel = {}
    for fld in ("mu", "scale", "magnitude", "albedo"):
        pa, xa = np.asarray(getattr(gp, fld)), np.asarray(getattr(gx, fld))
        rel[fld] = float(np.abs(pa - xa).max() / max(np.abs(xa).max(), 1e-8))
    row["grad_max_rel_diff"] = rel
    # per-axis scale grads chain through invd = scale^-2 (an extra x^-3
    # factor), amplifying f32 accumulation-order noise on stretched
    # scenes — the looser bound mirrors tests/test_aniso.py's rtol
    row["grad_allclose"] = bool(
        all(v < (3e-3 if k == "scale" else 1e-3) for k, v in rel.items()))

    # fwd+bwd aniso train step (bucketed, saved-T)
    opt = optax.adam(1e-3)
    target, _ = frame(35.0, "pallas")
    step = make_aniso_frame_train_step(opt, width=res, height=res,
                                       tiles=tiles, capacity=cap,
                                       bucket_cfg=cfg)
    state = init_state(scene, opt)
    o, dirs = cam.rays()
    state, loss, ovf_s = step(state, cam.view_matrix, o, dirs, target)
    assert int(ovf_s) == 0, f"{name}: step overflow"
    first_loss = float(loss)
    steps = 10
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, _ = step(state, cam.view_matrix, o, dirs, target)
    last_loss = float(loss)
    dt = (time.perf_counter() - t0) / steps
    row["step_ms"] = round(dt * 1e3, 2)
    row["step_rays_per_s"] = round(res * res / dt, 1)
    row["loss_first"] = first_loss
    row["loss_after_10"] = last_loss
    assert last_loss < first_loss, f"{name}: loss did not decrease"
    row["ok"] = bool(row["pixel_allclose"] and row["grad_allclose"])
    return row


def main():
    import jax

    only = sys.argv[1] if len(sys.argv) > 1 else None
    report = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    report["device"] = str(jax.devices()[0])
    if only in (None, "config3"):
        report["config3_teapot_512"] = certify(
            "config3", "/root/reference/test-objects/teapot.obj", 512,
            (64, 32), use_mesh=False)
    if only in (None, "config5"):
        report["config5_monkey_1024"] = certify(
            "config5", "/root/reference/test-objects/monkey.obj", 1024,
            (64, 32), use_mesh=True)
    if only in (None, "aniso"):
        report["config4_aniso_teapot_256"] = certify_aniso(
            "aniso", "/root/reference/test-objects/teapot.obj", 256,
            (32, 16))
    if "config3_teapot_512" in report and "config5_monkey_1024" in report:
        report["ok"] = bool(report["config3_teapot_512"]["ok"]
                            and report["config5_monkey_1024"]["ok"])
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"written: {OUT}")


if __name__ == "__main__":
    main()
