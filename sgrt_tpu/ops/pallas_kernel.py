"""Fused Pallas TPU kernel for the transmittance-weighted footprint sum —
the hot O(N^2)-per-ray loop of the renderer — with a flash-attention-style
custom VJP (recompute-in-backward, nothing materialized in HBM).

This supersedes the reference's hottest code (broadcast_transmittance /
broadcast_radiance, src/vrt/rt.h:102-127, 205-223, and the HIP GPU kernel
rocm-rt.hip:109-153): rays are VPU lanes, Gaussians a VMEM-blocked reduction
axis. The surrounding linear algebra (mu_bar matmul, final albedo matmul)
stays in XLA where the MXU handles it; the kernel computes exactly the part
XLA cannot fuse well — the pairwise (sample x Gaussian) erf reduction.

Definitions (see ops.reference for the math contract; scenes are padded so
dummy Gaussians have coeff=0 and contribute nothing):

    mu_bar(r,q)  = (mu_q - o) . n_r
    coeff(r,q)   = sigma_q * sqrt(pi/2) * cbar(r,q)
    inv(q)       = 1 / (sqrt(2) sigma_q)
    arg          = (mu_bar(r,p) + k*sigma_p - mu_bar(r,q)) * inv(q)
    acc_k(r,p)   = sum_q coeff(r,q) * erf(arg)
    base(r)      = sum_q coeff(r,q) * erf(-mu_bar(r,q) * inv(q))
    tw(r,p)      = sum_k w_k * exp(base(r) - acc_k(r,p)),  w_k = exp(-k^2/2)

i.e. tw(r,p) = sum_k w_k * T(o, n_r, s_pk) — the transmittance factors of the
5-tap footprint quadrature. The caller finishes the radiance as
colors = (sigma * cbar * tw) @ albedo (MXU matmul).

**Variable work per batch entry**: a `counts (B,) int32` scalar-prefetch
input bounds the live Gaussian prefix of each batch entry (per-tile counts
from ops.tiling). The p/q loops run only ceil(count/block) iterations and
whole p-blocks past the count are skipped, so per-tile cost scales with
count^2, not capacity^2 — the TPU analog of the reference's per-tile
std::vector sizes (rt.cpp:64), which a fixed-capacity design would otherwise
flatten to worst-case.

erf inside the kernel is the f32-exact Abramowitz-Stegun 5-term polynomial
(ops.approx.erf_as5) — jax.lax.erf does not lower through Mosaic, and the
backward pass reuses its exp(-x^2) for erf' at no extra cost.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import GaussianScene, pad_scene
from sgrt_tpu.ops.approx import ERF_AND_GAUSS_IMPLS, ERF_IMPLS
from sgrt_tpu.ops.reference import INV_SQRT_2_PI, SQRT_2

K_TAPS = (-4.0, -3.0, -2.0, -1.0, 0.0)
K_WEIGHTS = tuple(math.exp(-k * k / 2.0) for k in K_TAPS)
_DERF = 1.1283791670955126  # 2/sqrt(pi)


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(counts_ref, mu_full_ref, co_full_ref, mu_p_ref, sig_p_ref,
                inv_ref, tw_ref, *, pb: int, qb: int, erf):
    count = counts_ref[pl.program_id(0)]
    j = pl.program_id(2)
    rb = mu_full_ref.shape[1]
    nq = pl.cdiv(count, qb)

    @pl.when(j * pb >= count)
    def _():
        tw_ref[0] = jnp.zeros((rb, pb), jnp.float32)

    @pl.when(j * pb < count)
    def _():
        mu = mu_full_ref[0]                     # (RB, N)
        co = co_full_ref[0]                     # (RB, N)
        mu_p = mu_p_ref[0]                      # (RB, PB)
        sig_p = sig_p_ref[0]                    # (1, PB)
        inv = inv_ref[0]                        # (1, N)

        base = jnp.sum(co * erf(-mu * inv), axis=1, keepdims=True)   # (RB, 1)

        def body(qi, accs):
            q0 = pl.multiple_of(qi * qb, qb)
            mu_q = mu_full_ref[0, :, pl.ds(q0, qb)]                   # (RB, QB)
            co_q = co_full_ref[0, :, pl.ds(q0, qb)][:, None, :]       # (RB, 1, QB)
            inv_q = inv_ref[0, :, pl.ds(q0, qb)].reshape(1, 1, qb)    # (1, 1, QB)
            darg = (mu_p[:, :, None] - mu_q[:, None, :]) * inv_q      # (RB, PB, QB)
            ks = sig_p.reshape(1, pb, 1) * inv_q                      # (1, PB, QB)
            return tuple(
                acc + jnp.sum(co_q * erf(darg + k * ks), axis=2)
                for acc, k in zip(accs, K_TAPS)
            )

        acc0 = tuple(jnp.zeros((rb, pb), jnp.float32) for _ in K_TAPS)
        accs = jax.lax.fori_loop(0, nq, body, acc0)
        tw = sum(w * jnp.exp(base - acc) for w, acc in zip(K_WEIGHTS, accs))
        tw_ref[0] = tw


# ---------------------------------------------------------------------------
# backward kernel (flash-style: recompute acc_k, then a gradient q-pass)
# ---------------------------------------------------------------------------

def _bwd_kernel(counts_ref, mu_ref, co_ref, sig_ref, inv_ref, g_ref,
                dmu_ref, dco_ref, dsig_ref, dinv_ref,
                dmu_s, dco_s, dsig_s, dinv_s, db_s,
                *, pb: int, qb: int, erf, erf_and_gauss):
    count = counts_ref[pl.program_id(0)]
    mu = mu_ref[0]                          # (RB, N)
    co = co_ref[0]
    sig = sig_ref[0]                        # (1, N)
    inv = inv_ref[0]                        # (1, N)
    rb, n = mu.shape
    np_dyn = pl.cdiv(count, pb)
    nq_dyn = pl.cdiv(count, qb)

    # base pass (fused: erf1 and exp(-arg1^2) both needed for its gradient)
    e1, g1 = erf_and_gauss(-mu * inv)                            # (RB, N) x2
    base = jnp.sum(co * e1, axis=1, keepdims=True)               # (RB, 1)

    dmu_s[:] = jnp.zeros(dmu_s.shape, jnp.float32)
    dco_s[:] = jnp.zeros(dco_s.shape, jnp.float32)
    dsig_s[:] = jnp.zeros(dsig_s.shape, jnp.float32)
    dinv_s[:] = jnp.zeros(dinv_s.shape, jnp.float32)
    db_s[:] = jnp.zeros(db_s.shape, jnp.float32)

    def p_body(pi, _):
        p0 = pl.multiple_of(pi * pb, pb)
        mu_p = mu_ref[0, :, pl.ds(p0, pb)]                       # (RB, PB)
        sig_p = sig_ref[0, :, pl.ds(p0, pb)]                     # (1, PB)
        g_p = g_ref[0, :, pl.ds(p0, pb)]                         # (RB, PB)

        # --- pass A: recompute acc_k for this p block -------------------
        def qa_body(qi, accs):
            q0 = pl.multiple_of(qi * qb, qb)
            mu_q = mu_ref[0, :, pl.ds(q0, qb)]
            co_q = co_ref[0, :, pl.ds(q0, qb)][:, None, :]
            inv_q = inv_ref[0, :, pl.ds(q0, qb)].reshape(1, 1, qb)
            darg = (mu_p[:, :, None] - mu_q[:, None, :]) * inv_q
            ks = sig_p.reshape(1, pb, 1) * inv_q
            return tuple(
                acc + jnp.sum(co_q * erf(darg + k * ks), axis=2)
                for acc, k in zip(accs, K_TAPS)
            )

        acc0 = tuple(jnp.zeros((rb, pb), jnp.float32) for _ in K_TAPS)
        accs = jax.lax.fori_loop(0, nq_dyn, qa_body, acc0)
        T = tuple(w * jnp.exp(base - acc) for w, acc in zip(K_WEIGHTS, accs))
        tw_p = sum(T)
        db_s[:] += jnp.sum(g_p * tw_p, axis=1, keepdims=True)    # (RB, 1)
        G = tuple(g_p * t for t in T)                            # dacc_k = -G_k

        # --- pass B: gradient accumulation ------------------------------
        def qb_body(qi, carry):
            dmu_p, dsig_p = carry                                # (RB,PB), (1,PB)
            q0 = pl.multiple_of(qi * qb, qb)
            mu_q = mu_ref[0, :, pl.ds(q0, qb)]
            co_q = co_ref[0, :, pl.ds(q0, qb)][:, None, :]       # (RB,1,QB)
            inv_q = inv_ref[0, :, pl.ds(q0, qb)].reshape(1, 1, qb)
            d = mu_p[:, :, None] - mu_q[:, None, :]              # (RB,PB,QB)
            sig_p3 = sig_p.reshape(1, pb, 1)                     # (1,PB,1)

            dco_blk = jnp.zeros((rb, qb), jnp.float32)
            dmuq_blk = jnp.zeros((rb, qb), jnp.float32)
            dinv_blk = jnp.zeros((rb, qb), jnp.float32)
            for k, Gk in zip(K_TAPS, G):
                off = d + k * sig_p3                              # = arg / inv_q
                e, gau = erf_and_gauss(off * inv_q)
                dco_blk -= jnp.sum(Gk[:, :, None] * e, axis=1)
                # cotangent w.r.t. arg, times inv_q (shared by 3 of 4 grads)
                dargk = (-_DERF) * Gk[:, :, None] * co_q * gau    # (RB,PB,QB)
                di = dargk * inv_q                                # (RB,PB,QB)
                di_q = jnp.sum(di, axis=2)                        # (RB,PB)
                dmu_p += di_q
                dmuq_blk -= jnp.sum(di, axis=1)
                dsig_p += k * di_q
                dinv_blk += jnp.sum(dargk * off, axis=1)

            dco_s[:, pl.ds(q0, qb)] += dco_blk
            dmu_s[:, pl.ds(q0, qb)] += dmuq_blk
            dinv_s[:, pl.ds(q0, qb)] += dinv_blk
            return dmu_p, dsig_p

        dmu_p0 = jnp.zeros((rb, pb), jnp.float32)
        dsig_p0 = jnp.zeros((rb, pb), jnp.float32)
        dmu_p, dsig_p = jax.lax.fori_loop(0, nq_dyn, qb_body, (dmu_p0, dsig_p0))
        dmu_s[:, pl.ds(p0, pb)] += dmu_p
        dsig_s[:, pl.ds(p0, pb)] += dsig_p
        return 0

    jax.lax.fori_loop(0, np_dyn, p_body, 0)

    # base-path gradients (need the completed db = sum_p g*tw).
    db = db_s[:]                                                  # (RB, 1)
    dco_s[:] += db * e1
    derf1 = _DERF * db * co * g1                                  # d/d(arg1)
    dmu_s[:] += derf1 * (-inv)
    dinv_s[:] += derf1 * (-mu)

    dmu_ref[0] = dmu_s[:]
    dco_ref[0] = dco_s[:]

    # Reduce dsig/dinv over the ray axis with an MXU matvec (a (1,RB)@(RB,N)
    # dot); a plain axis-0 jnp.sum to a (1,N) row trips a Mosaic relayout
    # bug (replicated-sublane destination).
    ones_row = jnp.ones((1, rb), jnp.float32)
    dsig_row = jnp.dot(ones_row, dsig_s[:], preferred_element_type=jnp.float32)
    dinv_row = jnp.dot(ones_row, dinv_s[:], preferred_element_type=jnp.float32)

    # dsig/dinv: revisit-accumulated over the ray-block grid dimension.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dsig_ref[0] = jnp.zeros((1, n), jnp.float32)
        dinv_ref[0] = jnp.zeros((1, n), jnp.float32)

    dsig_ref[0] += dsig_row
    dinv_ref[0] += dinv_row


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _fwd_call(mu_bar, coeff, sigma, inv, counts, *, rb, pb, qb, erf_name,
              interpret):
    b, r, n = mu_bar.shape
    erf = ERF_IMPLS[erf_name]
    kernel = functools.partial(_fwd_kernel, pb=pb, qb=qb, erf=erf)
    n_erf = 6 * b * r * n * n  # 5 taps + base, per (ray, p, q) at capacity
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r // rb, n // pb),
        in_specs=[
            pl.BlockSpec((1, rb, n), lambda bb, i, j, c: (bb, i, 0)),
            pl.BlockSpec((1, rb, n), lambda bb, i, j, c: (bb, i, 0)),
            pl.BlockSpec((1, rb, pb), lambda bb, i, j, c: (bb, i, j)),
            pl.BlockSpec((1, 1, pb), lambda bb, i, j, c: (bb, 0, j)),
            pl.BlockSpec((1, 1, n), lambda bb, i, j, c: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, pb), lambda bb, i, j, c: (bb, i, j)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, r, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=14 * n_erf, bytes_accessed=4 * b * r * n * 3,
            transcendentals=n_erf,
        ),
        interpret=interpret,
    )(counts, mu_bar, coeff, mu_bar, sigma[:, None, :], inv[:, None, :])


def _bwd_call(mu_bar, coeff, sigma, inv, counts, g, *, rb, pb, qb, erf_name,
              interpret):
    b, r, n = mu_bar.shape
    erf = ERF_IMPLS[erf_name]
    eag = ERF_AND_GAUSS_IMPLS.get(erf_name, ERF_AND_GAUSS_IMPLS["as5"])
    kernel = functools.partial(_bwd_kernel, pb=pb, qb=qb, erf=erf,
                               erf_and_gauss=eag)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r // rb),
        in_specs=[
            pl.BlockSpec((1, rb, n), lambda bb, i, c: (bb, i, 0)),
            pl.BlockSpec((1, rb, n), lambda bb, i, c: (bb, i, 0)),
            pl.BlockSpec((1, 1, n), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, rb, n), lambda bb, i, c: (bb, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, n), lambda bb, i, c: (bb, i, 0)),
            pl.BlockSpec((1, rb, n), lambda bb, i, c: (bb, i, 0)),
            pl.BlockSpec((1, 1, n), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda bb, i, c: (bb, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, n), jnp.float32),
            pltpu.VMEM((rb, n), jnp.float32),
            pltpu.VMEM((rb, n), jnp.float32),
            pltpu.VMEM((rb, n), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.float32),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, r, n), jnp.float32),
            jax.ShapeDtypeStruct((b, r, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )
    dmu, dco, dsig, dinv = call(counts, mu_bar, coeff, sigma[:, None, :],
                                inv[:, None, :], g)
    return dmu, dco, dsig[:, 0, :], dinv[:, 0, :]


@functools.lru_cache(maxsize=None)
def _make_tw_op(rb, pb, qb, rb_bwd, erf_name, interpret):
    """Cached custom-VJP op for a (block config, erf impl) pair.

    tw_op(mu_bar (B,R,N), coeff (B,R,N), sigma (B,N), inv (B,N),
          counts (B,) int32) -> (B,R,N)
    """

    @jax.custom_vjp
    def tw_op(mu_bar, coeff, sigma, inv, counts):
        return _fwd_call(mu_bar, coeff, sigma, inv, counts, rb=rb, pb=pb,
                         qb=qb, erf_name=erf_name, interpret=interpret)

    def fwd(mu_bar, coeff, sigma, inv, counts):
        return tw_op(mu_bar, coeff, sigma, inv, counts), (
            mu_bar, coeff, sigma, inv, counts)

    def bwd(res, g):
        mu_bar, coeff, sigma, inv, counts = res
        dmu, dco, dsig, dinv = _bwd_call(
            mu_bar, coeff, sigma, inv, counts, g, rb=rb_bwd, pb=pb, qb=qb,
            erf_name=erf_name, interpret=interpret,
        )
        dcounts = np.zeros(counts.shape, jax.dtypes.float0)  # int arg
        return dmu, dco, dsig, dinv, dcounts

    tw_op.defvjp(fwd, bwd)
    return tw_op


def tw_pallas(mu_bar, coeff, sigma, inv, counts=None, *, rb: int = 16,
              pb: int = 128, qb: int = 128, rb_bwd: int = 16,
              erf_name: str = "as5", interpret: bool | None = None):
    """Transmittance-weight kernel (see module docstring). Shapes:
    mu_bar/coeff (B, R, N); sigma/inv (B, N); counts (B,) int32 live-prefix
    lengths (None → all N live) → tw (B, R, N). R % rb == 0,
    N % pb == N % qb == 0 (pad with inert Gaussians / dummy rays)."""
    if interpret is None:
        interpret = _auto_interpret()
    b, r, n = mu_bar.shape
    rb = min(rb, r)
    rb_bwd = min(rb_bwd, r)
    pb = min(pb, n)
    qb = min(qb, n)
    if r % rb or n % pb or n % qb or r % rb_bwd:
        raise ValueError(f"shape (R={r}, N={n}) not divisible by blocks "
                         f"(rb={rb}, rb_bwd={rb_bwd}, pb={pb}, qb={qb})")
    if counts is None:
        counts = jnp.full((b,), n, jnp.int32)
    op = _make_tw_op(rb, pb, qb, rb_bwd, erf_name, interpret)
    return op(mu_bar, coeff, sigma, inv, counts.astype(jnp.int32))


# ---------------------------------------------------------------------------
# renderer entry points (Pallas backend)
# ---------------------------------------------------------------------------

def _prep_terms(o, dirs, scene: GaussianScene):
    """XLA-side per-(ray, Gaussian) prep feeding the kernel. dirs: (..., R, 3),
    scene leaves with matching leading batch dims."""
    oc = scene.mu - o                                        # (..., N, 3)
    oc_sq = jnp.sum(oc * oc, axis=-1)                        # (..., N)
    mu_bar = jnp.einsum("...rc,...nc->...rn", dirs, oc,
                        precision=jax.lax.Precision.HIGHEST)  # (..., R, N)
    inv_2s2 = 1.0 / (2.0 * scene.sigma**2)
    cbar = scene.magnitude[..., None, :] * jnp.exp(
        -(oc_sq[..., None, :] - mu_bar**2) * inv_2s2[..., None, :]
    )
    coeff = (scene.sigma * INV_SQRT_2_PI)[..., None, :] * cbar
    inv = 1.0 / (SQRT_2 * scene.sigma)
    return mu_bar, cbar, coeff, inv


def render_rays_pallas_impl(o, dirs, scene: GaussianScene, *, rb: int = 16,
                            pb: int = 128, qb: int = 128, rb_bwd: int = 16,
                            erf_name: str = "as5",
                            interpret: bool | None = None) -> jnp.ndarray:
    """Pallas-backend render of a flat ray batch: dirs (R,3) → colors (R,3).
    Differentiable via the custom VJP. Unjitted; compose freely."""
    n_live = scene.n
    scene = pad_scene(scene, max(pb, qb))
    r = dirs.shape[0]
    pad = (-r) % rb
    dirs_p = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)]) if pad else dirs
    mu_bar, cbar, coeff, inv = _prep_terms(o[None, :], dirs_p, scene)
    counts = jnp.full((1,), n_live, jnp.int32)
    tw = tw_pallas(mu_bar[None], coeff[None], scene.sigma[None], inv[None],
                   counts, rb=rb, pb=pb, qb=qb, rb_bwd=rb_bwd,
                   erf_name=erf_name, interpret=interpret)[0]
    weights = scene.sigma[None, :] * cbar * tw               # (R, N)
    colors = jnp.matmul(weights, scene.albedo,
                        precision=jax.lax.Precision.HIGHEST)
    return colors[:r]


render_rays_pallas = jax.jit(
    render_rays_pallas_impl,
    static_argnames=("rb", "pb", "qb", "rb_bwd", "erf_name", "interpret"),
)


def render_pallas(scene: GaussianScene, camera: Camera, origin=None,
                  **kw) -> jnp.ndarray:
    """Full-frame Pallas render → float32 (H, W, 3), unclamped."""
    o, dirs = camera.rays(origin)
    colors = render_rays_pallas(o, dirs, scene, **kw)
    return colors.reshape(camera.height, camera.width, 3)


def render_tiles_pallas(tiled_scene: GaussianScene, o, tile_dirs, counts=None,
                        *, rb: int = 16, pb: int = 128, qb: int = 128,
                        rb_bwd: int = 16, erf_name: str = "as5",
                        interpret: bool | None = None) -> jnp.ndarray:
    """Batched per-tile render: tiled_scene leaves (T2, K, ...), tile_dirs
    (T2, P, 3), counts (T2,) live Gaussians per tile → per-tile colors
    (T2, P, 3). The tile axis is the leading Pallas grid dimension (the
    analog of the reference's thread-pool tile tasks, rt.h:344-404); counts
    make per-tile cost scale with the true member count, like the
    reference's per-tile vectors."""
    mu_bar, cbar, coeff, inv = _prep_terms(o[None, None, :], tile_dirs, tiled_scene)
    tw = tw_pallas(mu_bar, coeff, tiled_scene.sigma, inv, counts, rb=rb,
                   pb=pb, qb=qb, rb_bwd=rb_bwd, erf_name=erf_name,
                   interpret=interpret)
    weights = tiled_scene.sigma[:, None, :] * cbar * tw      # (T2, P, K)
    return jnp.einsum("tpk,tkc->tpc", weights, tiled_scene.albedo,
                      precision=jax.lax.Precision.HIGHEST)
