"""Fused Pallas TPU kernel for ANISOTROPIC (diagonal-covariance) Gaussians.

The anisotropic twin of ops.pallas_kernel's fully-fused op (same layout:
rays on the 128-wide lane axis, Gaussians VMEM-blocked on sublanes, counts
as scalar prefetch, flash-style recompute backward). What changes: the 1-D
ray restriction's sigma_bar and 1/(sqrt2 sigma_bar) are per-(Gaussian, ray)
PLANES instead of per-Gaussian columns (ops/anisotropic.py holds the math:
A = n^2.(1/d), Bt = (oc/d).n, C = oc^2.(1/d), sigma_bar = 1/sqrt(A),
mu_bar = Bt/A, cbar = mag * exp(-(C - Bt^2/A)/2), with oc = mu - o and
d = scale^2 — Cauchy-Schwarz in the D^-1/2 metric keeps the exponent
<= 0, so padding cannot overflow).

The in-kernel prep runs three MXU matmuls ((1/d) @ n^2, (oc/d) @ n, and
the C row-sum) and the custom VJP chains the accumulated plane cotangents
(d mu_bar, d coeff, d inv, d sigma_bar) back through that quadratic form
to (d oc, d invd, d mag, d albedo, d dirs) — the per-axis covariance
gradient. The wrapper exposes invd = scale^-2 so the outer autodiff chains
d scale = -2 scale^-3 * d invd for free.

Backward schedules: recompute (pass A + gradient pass B) and SAVED-T
(the differentiated forward materializes the 5 T_k factors; the backward
skips pass A), auto-selected under the same padded-byte budget as the
isotropic kernel — full schedule parity with ops.pallas_kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgrt_tpu.ops.anisotropic import AnisoScene, pad_scene_aniso
from sgrt_tpu.ops.approx import ERF_AND_GAUSS_IMPLS, ERF_IMPLS, EXP_IMPLS
from sgrt_tpu.ops.pallas_kernel import (
    _VMEM_LIMIT,
    _auto_interpret,
    _base_path_grads,
    _block_sizes,
    _kernel_erf_name,
    _ones_row_sum,
    K_TAPS,
    K_WEIGHTS,
    _DERF,
    _SQRT_2_PI,
)

_INV_SQRT_2_PI = 1.2533141373155003   # sqrt(pi/2)
_SQRT_2 = 1.4142135623730951

# Backward VMEM ceiling on the per-call Gaussian axis — MEASURED on the
# v5e (round 5): the recompute backward compiles and runs at N=6144 and
# fails Mosaic compilation at N=7168 (despite its 8 full (N, RB) planes
# vs the isotropic kernel's 6 — both kernels hit the same wall, so the
# binding constraint is the shared (PB, QB, RB) loop temporaries plus
# block double-buffering, not the plane count). Scenes denser than this
# need a finer tile grid; the isotropic path additionally has the
# chunked-kernel route (ops.pallas_chunked).
MAX_BWD_CAPACITY_ANISO = 6144


def _prep_scratch_aniso(oc, invd, mag, d, mb_s, co_s, inv_s, sb_s, exp):
    """In-kernel anisotropic prep → fills mu_bar/coeff/inv/sigma_bar planes.

    oc (N,3) = mu - o; invd (N,3) = scale^-2; mag (N,1); d (3,RB).
    Returns nothing extra — A and Bt are recoverable from the planes
    (A = 2 inv^2, Bt = mu_bar * A), which the backward epilogue exploits.
    """
    d2 = d * d                                                   # (3, RB)
    A = jnp.dot(invd, d2, preferred_element_type=jnp.float32)    # (N, RB)
    Bt = jnp.dot(oc * invd, d, preferred_element_type=jnp.float32)
    C = jnp.sum(oc * oc * invd, axis=1, keepdims=True)           # (N, 1)
    sb = jax.lax.rsqrt(A)                                        # (N, RB)
    mb = Bt * sb * sb                                            # Bt / A
    e = exp(-0.5 * (C - Bt * mb))                                # (N, RB)
    mb_s[:] = mb
    co_s[:] = (mag * _INV_SQRT_2_PI) * sb * e
    inv_s[:] = jnp.sqrt(0.5 * A)              # 1/(sqrt2 sigma_bar)
    sb_s[:] = sb


def _acc_pass_aniso(read_mu, read_co, read_inv, mu_p, sb_p, nq, *, pb, qb,
                    rb, erf):
    """Pass A with per-(Gaussian, ray) inv planes: acc_k(p, r) =
    sum_q co(q,r) * erf((mu_p - mu_q + k*sb_p) * inv_q), all operands
    (·, RB) planes."""

    def body(qi, accs):
        q0 = pl.multiple_of(qi * qb, qb)
        mu_q = read_mu(q0, qb)                               # (QB, RB)
        co_q = read_co(q0, qb)[None]                         # (1, QB, RB)
        inv_q = read_inv(q0, qb)[None]                       # (1, QB, RB)
        darg = (mu_p[:, None, :] - mu_q[None, :, :]) * inv_q  # (PB, QB, RB)
        ks = sb_p[:, None, :] * inv_q                         # (PB, QB, RB)
        return tuple(
            acc + jnp.sum(co_q * erf(darg + k * ks), axis=1)
            for acc, k in zip(accs, K_TAPS)
        )

    acc0 = tuple(jnp.zeros((pb, rb), jnp.float32) for _ in K_TAPS)
    return jax.lax.fori_loop(0, nq, body, acc0)


def _grad_pass_aniso(read_mu, read_co, read_inv, dco_s, dmu_s, dinv_s,
                     mu_p, sb_p, G, nq, *, pb, qb, rb, erf_and_gauss):
    """Pass B with planes. Returns the p-side (dmu_p, dsb_p), both
    (PB, RB); accumulates q-side dco/dmu/dinv into the (N, RB) scratches.
    Same S0/S1 folding as the isotropic _grad_pass (off_k = dd + k*sb_p ⇒
    sum_k dargk*off_k = S0*dd + S1*sb_p)."""

    def body(qi, carry):
        dmu_p, dsb_p = carry
        q0 = pl.multiple_of(qi * qb, qb)
        mu_q = read_mu(q0, qb)
        co_q = read_co(q0, qb)[None]                         # (1, QB, RB)
        inv_q = read_inv(q0, qb)[None]                       # (1, QB, RB)
        dd = mu_p[:, None, :] - mu_q[None, :, :]             # (PB, QB, RB)
        sb_p3 = sb_p[:, None, :]                             # (PB, 1, RB)

        dco_blk = jnp.zeros((qb, rb), jnp.float32)
        s0 = jnp.zeros((pb, qb, rb), jnp.float32)
        s1 = jnp.zeros((pb, qb, rb), jnp.float32)
        for k, Gk in zip(K_TAPS, G):
            off = dd + k * sb_p3
            ee, gau = erf_and_gauss(off * inv_q)
            dco_blk -= jnp.sum(Gk[:, None, :] * ee, axis=0)
            dargk = (-_DERF) * Gk[:, None, :] * co_q * gau
            s0 += dargk
            s1 += k * dargk

        di = s0 * inv_q                                      # (PB, QB, RB)
        di_q = jnp.sum(di, axis=1)                           # (PB, RB)
        dco_s[pl.ds(q0, qb), :] += dco_blk
        dmu_s[pl.ds(q0, qb), :] += -jnp.sum(di, axis=0)
        dinv_s[pl.ds(q0, qb), :] += jnp.sum(s0 * dd + s1 * sb_p3, axis=0)
        return dmu_p + di_q, dsb_p + jnp.sum(s1 * inv_q, axis=1)

    z = jnp.zeros((pb, rb), jnp.float32)
    return jax.lax.fori_loop(0, nq, body, (z, z))


def _fused_fwd_aniso_kernel(counts_ref, oc_ref, invd_ref, mag_ref, alb_ref,
                            dirs_ref, col_ref, mb_s, co_s, inv_s, sb_s,
                            *, pb: int, qb: int, erf, exp):
    count = counts_ref[pl.program_id(0)]
    rb = dirs_ref.shape[2]
    np_dyn = pl.cdiv(count, pb)
    nq_dyn = pl.cdiv(count, qb)

    _prep_scratch_aniso(oc_ref[0], invd_ref[0], mag_ref[0], dirs_ref[0],
                        mb_s, co_s, inv_s, sb_s, exp)
    base = _ones_row_sum(co_s[:] * erf(-mb_s[:] * inv_s[:]))     # (1, RB)
    col_ref[0] = jnp.zeros((3, rb), jnp.float32)

    def p_body(pi, _):
        p0 = pl.multiple_of(pi * pb, pb)
        mu_p = mb_s[pl.ds(p0, pb), :]
        sb_p = sb_s[pl.ds(p0, pb), :]
        co_p = co_s[pl.ds(p0, pb), :]
        alb_p = alb_ref[0, pl.ds(p0, pb), :]

        accs = _acc_pass_aniso(
            lambda s, l: mb_s[pl.ds(s, l), :],
            lambda s, l: co_s[pl.ds(s, l), :],
            lambda s, l: inv_s[pl.ds(s, l), :],
            mu_p, sb_p, nq_dyn, pb=pb, qb=qb, rb=rb, erf=erf)
        tw = sum(w * exp(base - acc) for w, acc in zip(K_WEIGHTS, accs))
        w_p = _SQRT_2_PI * co_p * tw
        col_ref[0] += jax.lax.dot_general(
            alb_p, w_p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, np_dyn, p_body, 0)


def _aniso_epilogue(oc, invd, mag, d, mb_s, co_s, inv_s, sb_s,
                    dmb_s, dco_s, dsb_s, dinv_s, dalb_s,
                    doc_ref, dinvd_ref, dmag_ref, dalb_ref, ddirs_ref, n):
    """Chain the plane cotangents through the quadratic-form prep.

    Intermediates recovered from the planes: A = 2*inv^2, Bt = mu_bar*A,
    M = oc*invd. Chain (see module docstring for the forward):
      dsb_tot = dsb + dco*co/sb - dinv*inv/sb
      dg      = dco*co                          [g = -(C - Bt*mu_bar)/2]
      dBt     = dmb/A + dg*mu_bar
      dA      = -dmb*mu_bar/A - dsb_tot*sb/(2A) - dg*mu_bar^2/2
      dC(col) = -sum_r dg / 2
      dM      = dBt @ d^T;    dA_d2 = dA @ (d^2)^T
      dinvd   = dA_d2 + dC*oc^2 + dM*oc
      doc     = dM*invd + 2*dC*oc*invd
      ddirs   = 2*d*(invd^T @ dA) + M^T @ dBt
      dmag    = sum_r dco*co / mag
    """
    mb = mb_s[:]
    co = co_s[:]
    inv = inv_s[:]
    sb = sb_s[:]
    A = 2.0 * inv * inv                                           # (N, RB)
    dmb = dmb_s[:]
    dco = dco_s[:]
    dcoco = dco * co

    dsb_tot = dsb_s[:] + dcoco / sb - dinv_s[:] * inv / sb
    dg = dcoco
    inv_a = sb * sb                                               # 1/A
    dBt = dmb * inv_a + dg * mb
    # d sigma_bar/dA = -sb/(2A) = -0.5*sb*inv_a
    dA = -dmb * mb * inv_a - 0.5 * dsb_tot * sb * inv_a - 0.5 * dg * mb * mb
    dC = -0.5 * jnp.sum(dg, axis=1, keepdims=True)                # (N, 1)

    M = oc * invd                                                 # (N, 3)
    dM = jax.lax.dot_general(dBt, d, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (N, 3)
    dA_d2 = jax.lax.dot_general(dA, d * d, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dinvd = dA_d2 + dC * (oc * oc) + dM * oc
    doc = dM * invd + 2.0 * dC * oc * invd
    ddirs_ref[0] = (2.0 * d * jax.lax.dot_general(
        invd, dA, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + jax.lax.dot_general(M, dBt, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32))
    # guard only mag == 0 (inert padding; dcoco is 0 there since co ∝ mag):
    # negative magnitudes from unconstrained fitting keep the true-signed
    # d mag = Σ dco*co/mag
    dmag_col = jnp.sum(dcoco, axis=1, keepdims=True) / jnp.where(
        mag == 0, 1.0, mag)

    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        doc_ref[0] = jnp.zeros((n, 3), jnp.float32)
        dinvd_ref[0] = jnp.zeros((n, 3), jnp.float32)
        dmag_ref[0] = jnp.zeros((n, 1), jnp.float32)
        dalb_ref[0] = jnp.zeros((n, 3), jnp.float32)

    doc_ref[0] += doc
    dinvd_ref[0] += dinvd
    dmag_ref[0] += dmag_col
    dalb_ref[0] += dalb_s[:]


def _fused_fwd_t_aniso_kernel(counts_ref, oc_ref, invd_ref, mag_ref, alb_ref,
                              dirs_ref, col_ref, t_ref,
                              mb_s, co_s, inv_s, sb_s,
                              *, pb: int, qb: int, erf, exp):
    """Anisotropic forward that ALSO materializes the 5 transmittance
    factors T_k to HBM — the aniso twin of pallas_kernel's saved-T
    forward (closing the round-4 'deferred for a later round' gap)."""
    count = counts_ref[pl.program_id(0)]
    rb = dirs_ref.shape[2]
    n = oc_ref.shape[1]
    np_dyn = pl.cdiv(count, pb)
    nq_dyn = pl.cdiv(count, qb)

    _prep_scratch_aniso(oc_ref[0], invd_ref[0], mag_ref[0], dirs_ref[0],
                        mb_s, co_s, inv_s, sb_s, exp)
    base = _ones_row_sum(co_s[:] * erf(-mb_s[:] * inv_s[:]))     # (1, RB)
    col_ref[0] = jnp.zeros((3, rb), jnp.float32)
    t_ref[0] = jnp.zeros((len(K_TAPS), n, rb), jnp.float32)

    def p_body(pi, _):
        p0 = pl.multiple_of(pi * pb, pb)
        mu_p = mb_s[pl.ds(p0, pb), :]
        sb_p = sb_s[pl.ds(p0, pb), :]
        co_p = co_s[pl.ds(p0, pb), :]
        alb_p = alb_ref[0, pl.ds(p0, pb), :]

        accs = _acc_pass_aniso(
            lambda s, l: mb_s[pl.ds(s, l), :],
            lambda s, l: co_s[pl.ds(s, l), :],
            lambda s, l: inv_s[pl.ds(s, l), :],
            mu_p, sb_p, nq_dyn, pb=pb, qb=qb, rb=rb, erf=erf)
        T = tuple(w * exp(base - acc) for w, acc in zip(K_WEIGHTS, accs))
        for ki, tk in enumerate(T):
            t_ref[0, ki, pl.ds(p0, pb), :] = tk
        tw = sum(T)
        w_p = _SQRT_2_PI * co_p * tw
        col_ref[0] += jax.lax.dot_general(
            alb_p, w_p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, np_dyn, p_body, 0)


def _fused_bwd_t_aniso_kernel(counts_ref, oc_ref, invd_ref, mag_ref, alb_ref,
                              dirs_ref, t_ref, dcol_ref,
                              doc_ref, dinvd_ref, dmag_ref, dalb_ref,
                              ddirs_ref,
                              mb_s, co_s, inv_s, sb_s,
                              dmb_s, dco_s, dsb_s, dinv_s, db_s, dalb_s,
                              *, pb: int, qb: int, erf, exp, erf_and_gauss):
    """Saved-T anisotropic backward: pass A (the O(N²) acc recompute)
    replaced by reading the forward's T factors; only the gradient q-pass
    remains. Mirrors pallas_kernel._fused_bwd_t_kernel."""
    count = counts_ref[pl.program_id(0)]
    n = oc_ref.shape[1]
    rb = dirs_ref.shape[2]
    np_dyn = pl.cdiv(count, pb)
    nq_dyn = pl.cdiv(count, qb)

    oc = oc_ref[0]
    invd = invd_ref[0]
    mag = mag_ref[0]
    d = dirs_ref[0]
    dcol = dcol_ref[0]                                           # (3, RB)

    _prep_scratch_aniso(oc, invd, mag, d, mb_s, co_s, inv_s, sb_s, exp)
    mb = mb_s[:]
    co = co_s[:]
    inv = inv_s[:]
    e1, g1 = erf_and_gauss(-mb * inv)

    dmb_s[:] = jnp.zeros(dmb_s.shape, jnp.float32)
    dco_s[:] = jnp.zeros(dco_s.shape, jnp.float32)
    dsb_s[:] = jnp.zeros(dsb_s.shape, jnp.float32)
    dinv_s[:] = jnp.zeros(dinv_s.shape, jnp.float32)
    db_s[:] = jnp.zeros(db_s.shape, jnp.float32)
    dalb_s[:] = jnp.zeros(dalb_s.shape, jnp.float32)

    def p_body(pi, _):
        p0 = pl.multiple_of(pi * pb, pb)
        mu_p = mb_s[pl.ds(p0, pb), :]
        sb_p = sb_s[pl.ds(p0, pb), :]
        co_p = co_s[pl.ds(p0, pb), :]
        alb_p = alb_ref[0, pl.ds(p0, pb), :]
        A_p = jnp.dot(alb_p, dcol, preferred_element_type=jnp.float32)
        g_p = _SQRT_2_PI * co_p * A_p

        T = tuple(t_ref[0, ki, pl.ds(p0, pb), :]
                  for ki in range(len(K_TAPS)))
        tw_p = sum(T)
        db_s[:] += _ones_row_sum(g_p * tw_p)
        G = tuple(g_p * t for t in T)

        dco_s[pl.ds(p0, pb), :] += _SQRT_2_PI * tw_p * A_p
        w_p = _SQRT_2_PI * co_p * tw_p
        dalb_s[pl.ds(p0, pb), :] += jax.lax.dot_general(
            w_p, dcol, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        dmu_p, dsb_p = _grad_pass_aniso(
            lambda s, l: mb_s[pl.ds(s, l), :],
            lambda s, l: co_s[pl.ds(s, l), :],
            lambda s, l: inv_s[pl.ds(s, l), :],
            dco_s, dmb_s, dinv_s, mu_p, sb_p, G, nq_dyn,
            pb=pb, qb=qb, rb=rb, erf_and_gauss=erf_and_gauss)
        dmb_s[pl.ds(p0, pb), :] += dmu_p
        dsb_s[pl.ds(p0, pb), :] += dsb_p
        return 0

    jax.lax.fori_loop(0, np_dyn, p_body, 0)

    _base_path_grads(db_s[:], e1, g1, mb, co, inv, dco_s, dmb_s, dinv_s)

    _aniso_epilogue(oc, invd, mag, d, mb_s, co_s, inv_s, sb_s,
                    dmb_s, dco_s, dsb_s, dinv_s, dalb_s,
                    doc_ref, dinvd_ref, dmag_ref, dalb_ref, ddirs_ref, n)


def _fused_bwd_aniso_kernel(counts_ref, oc_ref, invd_ref, mag_ref, alb_ref,
                            dirs_ref, dcol_ref,
                            doc_ref, dinvd_ref, dmag_ref, dalb_ref, ddirs_ref,
                            mb_s, co_s, inv_s, sb_s,
                            dmb_s, dco_s, dsb_s, dinv_s, db_s, dalb_s,
                            *, pb: int, qb: int, erf, exp, erf_and_gauss):
    count = counts_ref[pl.program_id(0)]
    n = oc_ref.shape[1]
    rb = dirs_ref.shape[2]
    np_dyn = pl.cdiv(count, pb)
    nq_dyn = pl.cdiv(count, qb)

    oc = oc_ref[0]
    invd = invd_ref[0]
    mag = mag_ref[0]
    d = dirs_ref[0]
    dcol = dcol_ref[0]                                           # (3, RB)

    _prep_scratch_aniso(oc, invd, mag, d, mb_s, co_s, inv_s, sb_s, exp)
    mb = mb_s[:]
    co = co_s[:]
    inv = inv_s[:]
    e1, g1 = erf_and_gauss(-mb * inv)
    base = _ones_row_sum(co * e1)

    dmb_s[:] = jnp.zeros(dmb_s.shape, jnp.float32)
    dco_s[:] = jnp.zeros(dco_s.shape, jnp.float32)
    dsb_s[:] = jnp.zeros(dsb_s.shape, jnp.float32)
    dinv_s[:] = jnp.zeros(dinv_s.shape, jnp.float32)
    db_s[:] = jnp.zeros(db_s.shape, jnp.float32)
    dalb_s[:] = jnp.zeros(dalb_s.shape, jnp.float32)

    read_mu = lambda s, l: mb_s[pl.ds(s, l), :]
    read_co = lambda s, l: co_s[pl.ds(s, l), :]
    read_inv = lambda s, l: inv_s[pl.ds(s, l), :]

    def p_body(pi, _):
        p0 = pl.multiple_of(pi * pb, pb)
        mu_p = mb_s[pl.ds(p0, pb), :]
        sb_p = sb_s[pl.ds(p0, pb), :]
        co_p = co_s[pl.ds(p0, pb), :]
        alb_p = alb_ref[0, pl.ds(p0, pb), :]
        A_p = jnp.dot(alb_p, dcol, preferred_element_type=jnp.float32)
        g_p = _SQRT_2_PI * co_p * A_p

        accs = _acc_pass_aniso(read_mu, read_co, read_inv, mu_p, sb_p,
                               nq_dyn, pb=pb, qb=qb, rb=rb, erf=erf)
        T = tuple(w * exp(base - acc) for w, acc in zip(K_WEIGHTS, accs))
        tw_p = sum(T)
        db_s[:] += _ones_row_sum(g_p * tw_p)
        G = tuple(g_p * t for t in T)

        dco_s[pl.ds(p0, pb), :] += _SQRT_2_PI * tw_p * A_p
        w_p = _SQRT_2_PI * co_p * tw_p
        dalb_s[pl.ds(p0, pb), :] += jax.lax.dot_general(
            w_p, dcol, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        dmu_p, dsb_p = _grad_pass_aniso(
            read_mu, read_co, read_inv, dco_s, dmb_s, dinv_s, mu_p, sb_p,
            G, nq_dyn, pb=pb, qb=qb, rb=rb, erf_and_gauss=erf_and_gauss)
        dmb_s[pl.ds(p0, pb), :] += dmu_p
        dsb_s[pl.ds(p0, pb), :] += dsb_p
        return 0

    jax.lax.fori_loop(0, np_dyn, p_body, 0)

    # base-path gradients (planewise; reused from the isotropic kernel)
    _base_path_grads(db_s[:], e1, g1, mb, co, inv, dco_s, dmb_s, dinv_s)

    _aniso_epilogue(oc, invd, mag, d, mb_s, co_s, inv_s, sb_s,
                    dmb_s, dco_s, dsb_s, dinv_s, dalb_s,
                    doc_ref, dinvd_ref, dmag_ref, dalb_ref, ddirs_ref, n)


def _fused_fwd_aniso_call(oc, invd, mag, albedo, dirs_t, counts, *, rb, pb,
                          qb, erf_name, exp_name, interpret):
    b, n, _ = oc.shape
    r = dirs_t.shape[2]
    erf = ERF_IMPLS[erf_name]
    exp = EXP_IMPLS[exp_name]
    kernel = functools.partial(_fused_fwd_aniso_kernel, pb=pb, qb=qb,
                               erf=erf, exp=exp)
    n_erf = 6 * b * r * n * n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r // rb),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 1), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, 3, rb), lambda bb, i, c: (bb, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 3, rb), lambda bb, i, c: (bb, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((n, rb), jnp.float32),   # mb
            pltpu.VMEM((n, rb), jnp.float32),   # co
            pltpu.VMEM((n, rb), jnp.float32),   # inv (plane)
            pltpu.VMEM((n, rb), jnp.float32),   # sigma_bar (plane)
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 3, r), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=14 * n_erf, bytes_accessed=4 * b * n * 11,
            transcendentals=n_erf,
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(counts, oc, invd, mag[:, :, None], albedo, dirs_t)


def _fused_fwd_t_aniso_call(oc, invd, mag, albedo, dirs_t, counts, *, rb, pb,
                            qb, erf_name, exp_name, interpret):
    b, n, _ = oc.shape
    r = dirs_t.shape[2]
    nk = len(K_TAPS)
    erf = ERF_IMPLS[erf_name]
    exp = EXP_IMPLS[exp_name]
    kernel = functools.partial(_fused_fwd_t_aniso_kernel, pb=pb, qb=qb,
                               erf=erf, exp=exp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r // rb),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 1), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, 3, rb), lambda bb, i, c: (bb, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, rb), lambda bb, i, c: (bb, 0, i)),
            pl.BlockSpec((1, nk, n, rb), lambda bb, i, c: (bb, 0, 0, i)),
        ],
        scratch_shapes=[pltpu.VMEM((n, rb), jnp.float32)] * 4,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 3, r), jnp.float32),
            jax.ShapeDtypeStruct((b, nk, n, r), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(counts, oc, invd, mag[:, :, None], albedo, dirs_t)


def _fused_bwd_t_aniso_call(oc, invd, mag, albedo, dirs_t, counts, t_saved,
                            dcol, *, rb, pb, qb, erf_name, exp_name,
                            interpret):
    b, n, _ = oc.shape
    r = dirs_t.shape[2]
    nk = len(K_TAPS)
    erf = ERF_IMPLS[erf_name]
    exp = EXP_IMPLS[exp_name]
    eag = ERF_AND_GAUSS_IMPLS.get(erf_name, ERF_AND_GAUSS_IMPLS["as5"])
    kernel = functools.partial(_fused_bwd_t_aniso_kernel, pb=pb, qb=qb,
                               erf=erf, exp=exp, erf_and_gauss=eag)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r // rb),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 1), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, 3, rb), lambda bb, i, c: (bb, 0, i)),
            pl.BlockSpec((1, nk, n, rb), lambda bb, i, c: (bb, 0, 0, i)),
            pl.BlockSpec((1, 3, rb), lambda bb, i, c: (bb, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 1), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, 3, rb), lambda bb, i, c: (bb, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, rb), jnp.float32),   # mb
            pltpu.VMEM((n, rb), jnp.float32),   # co
            pltpu.VMEM((n, rb), jnp.float32),   # inv (plane)
            pltpu.VMEM((n, rb), jnp.float32),   # sigma_bar (plane)
            pltpu.VMEM((n, rb), jnp.float32),   # dmb
            pltpu.VMEM((n, rb), jnp.float32),   # dco
            pltpu.VMEM((n, rb), jnp.float32),   # dsb
            pltpu.VMEM((n, rb), jnp.float32),   # dinv
            pltpu.VMEM((1, rb), jnp.float32),   # db
            pltpu.VMEM((n, 3), jnp.float32),    # dalb
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, r), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )
    doc, dinvd, dmag, dalb, ddirs = call(counts, oc, invd, mag[:, :, None],
                                         albedo, dirs_t, t_saved, dcol)
    return doc, dinvd, dmag[:, :, 0], dalb, ddirs


def _fused_bwd_aniso_call(oc, invd, mag, albedo, dirs_t, counts, dcol, *,
                          rb, pb, qb, erf_name, exp_name, interpret):
    b, n, _ = oc.shape
    r = dirs_t.shape[2]
    erf = ERF_IMPLS[erf_name]
    exp = EXP_IMPLS[exp_name]
    eag = ERF_AND_GAUSS_IMPLS.get(erf_name, ERF_AND_GAUSS_IMPLS["as5"])
    kernel = functools.partial(_fused_bwd_aniso_kernel, pb=pb, qb=qb,
                               erf=erf, exp=exp, erf_and_gauss=eag)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r // rb),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 1), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, 3, rb), lambda bb, i, c: (bb, 0, i)),
            pl.BlockSpec((1, 3, rb), lambda bb, i, c: (bb, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 1), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, n, 3), lambda bb, i, c: (bb, 0, 0)),
            pl.BlockSpec((1, 3, rb), lambda bb, i, c: (bb, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, rb), jnp.float32),   # mb
            pltpu.VMEM((n, rb), jnp.float32),   # co
            pltpu.VMEM((n, rb), jnp.float32),   # inv (plane)
            pltpu.VMEM((n, rb), jnp.float32),   # sigma_bar (plane)
            pltpu.VMEM((n, rb), jnp.float32),   # dmb
            pltpu.VMEM((n, rb), jnp.float32),   # dco
            pltpu.VMEM((n, rb), jnp.float32),   # dsb
            pltpu.VMEM((n, rb), jnp.float32),   # dinv
            pltpu.VMEM((1, rb), jnp.float32),   # db
            pltpu.VMEM((n, 3), jnp.float32),    # dalb
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, r), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )
    doc, dinvd, dmag, dalb, ddirs = call(counts, oc, invd, mag[:, :, None],
                                         albedo, dirs_t, dcol)
    return doc, dinvd, dmag[:, :, 0], dalb, ddirs


@functools.lru_cache(maxsize=64)
def _make_fused_aniso_op(rb, pb, qb, rb_bwd, erf_name, exp_name, interpret,
                         save_t=False):
    """Fully-fused anisotropic custom-VJP op:
    op(oc (B,N,3), invd (B,N,3) = scale^-2, mag (B,N), albedo (B,N,3),
       dirs_t (B,3,R), counts (B,)) -> colors (B,3,R).

    save_t: the differentiated forward materializes the 5 T_k factors to
    HBM and the backward skips the O(N²) acc recompute — the same
    auto-selected schedule pair as the isotropic kernel."""

    @jax.custom_vjp
    def fused_op(oc, invd, mag, albedo, dirs_t, counts):
        return _fused_fwd_aniso_call(oc, invd, mag, albedo, dirs_t, counts,
                                     rb=rb, pb=pb, qb=qb, erf_name=erf_name,
                                     exp_name=exp_name, interpret=interpret)

    if save_t:
        def fwd(oc, invd, mag, albedo, dirs_t, counts):
            colors, t_saved = _fused_fwd_t_aniso_call(
                oc, invd, mag, albedo, dirs_t, counts, rb=rb_bwd, pb=pb,
                qb=qb, erf_name=erf_name, exp_name=exp_name,
                interpret=interpret)
            return colors, (oc, invd, mag, albedo, dirs_t, counts, t_saved)

        def bwd(res, g):
            oc, invd, mag, albedo, dirs_t, counts, t_saved = res
            doc, dinvd, dmag, dalb, ddirs = _fused_bwd_t_aniso_call(
                oc, invd, mag, albedo, dirs_t, counts, t_saved, g,
                rb=rb_bwd, pb=pb, qb=qb, erf_name=erf_name,
                exp_name=exp_name, interpret=interpret)
            dcounts = np.zeros(counts.shape, jax.dtypes.float0)
            return doc, dinvd, dmag, dalb, ddirs, dcounts
    else:
        def fwd(oc, invd, mag, albedo, dirs_t, counts):
            return fused_op(oc, invd, mag, albedo, dirs_t, counts), (
                oc, invd, mag, albedo, dirs_t, counts)

        def bwd(res, g):
            oc, invd, mag, albedo, dirs_t, counts = res
            doc, dinvd, dmag, dalb, ddirs = _fused_bwd_aniso_call(
                oc, invd, mag, albedo, dirs_t, counts, g, rb=rb_bwd, pb=pb,
                qb=qb, erf_name=erf_name, exp_name=exp_name,
                interpret=interpret)
            dcounts = np.zeros(counts.shape, jax.dtypes.float0)
            return doc, dinvd, dmag, dalb, ddirs, dcounts

    fused_op.defvjp(fwd, bwd)
    return fused_op


def render_fused_aniso(scene_oc, invd, mag, albedo, dirs_t, counts=None, *,
                       rb: int = 128, pb: int = 8, qb: int = 32,
                       rb_bwd: int | None = None, erf_name: str = "as5",
                       exp_name: str = "exact", save_t: bool | None = None,
                       interpret: bool | None = None):
    """Batched fused anisotropic render: oc (B,N,3), invd (B,N,3) =
    scale^-2, mag (B,N), albedo (B,N,3), dirs_t (B,3,R) → colors (B,3,R).
    Differentiable (analytic in-kernel VJP incl. d invd and d dirs).
    save_t=None auto-selects the saved-T backward under the same padded-
    byte budget as the isotropic kernel (pallas_kernel.SAVE_T_MAX_BYTES)."""
    from sgrt_tpu.ops.pallas_kernel import SAVE_T_MAX_BYTES

    erf_name = _kernel_erf_name(erf_name)
    if interpret is None:
        interpret = _auto_interpret()
    b, n, _ = scene_oc.shape
    r = dirs_t.shape[2]
    rb = min(rb, r)
    rb_bwd = rb if rb_bwd is None else min(rb_bwd, r)
    pb = min(pb, n)
    qb = min(qb, n)
    if r % rb or n % pb or n % qb or r % rb_bwd or pb % 8 or qb % 8:
        raise ValueError(f"shape (R={r}, N={n}) not divisible by blocks "
                         f"(rb={rb}, rb_bwd={rb_bwd}, pb={pb}, qb={qb})")
    if counts is None:
        counts = jnp.full((b,), n, jnp.int32)
    counts = jnp.minimum(counts.astype(jnp.int32), n)
    if save_t is None:
        r_pad = -(-r // 128) * 128   # trailing dim lane-pads (see iso auto)
        save_t = 4 * len(K_TAPS) * b * n * r_pad <= SAVE_T_MAX_BYTES
    op = _make_fused_aniso_op(rb, pb, qb, rb_bwd, erf_name, exp_name,
                              interpret, save_t)
    return op(scene_oc, invd, mag, albedo, dirs_t, counts)


def render_tiles_pallas_aniso(tiled: AnisoScene, o, tile_dirs, counts=None,
                              *, rb: int = 128, pb: int | None = None,
                              qb: int | None = None,
                              rb_bwd: int | None = None,
                              erf_name: str = "as5", exp_name: str = "exact",
                              save_t: bool | None = None,
                              interpret: bool | None = None):
    """Per-tile anisotropic render: tiled scene leaves (T2, K, ...),
    tile_dirs (T2, P, 3) → colors (T2, P, 3). The anisotropic twin of
    pallas_kernel.render_tiles_pallas."""
    k = tiled.scale.shape[1]
    if pb is None or qb is None:
        dpb, dqb = _block_sizes(k)
        pb = dpb if pb is None else pb
        qb = dqb if qb is None else qb
    oc = tiled.mu - o[None, None, :]
    invd = 1.0 / (tiled.scale * tiled.scale)
    dirs_tr = jnp.transpose(tile_dirs, (0, 2, 1))
    colors_t = render_fused_aniso(
        oc, invd, tiled.magnitude, tiled.albedo, dirs_tr, counts,
        rb=rb, pb=pb, qb=qb, rb_bwd=rb_bwd, erf_name=erf_name,
        exp_name=exp_name, save_t=save_t, interpret=interpret)
    return jnp.transpose(colors_t, (0, 2, 1))


def render_rays_pallas_aniso_impl(o, dirs, scene: AnisoScene, *,
                                  rb: int = 128, pb: int | None = None,
                                  qb: int | None = None,
                                  rb_bwd: int | None = None,
                                  erf_name: str = "as5",
                                  exp_name: str = "exact",
                                  interpret: bool | None = None):
    """Pallas-backend anisotropic render of a flat ray batch (R,3) → (R,3).
    Differentiable w.r.t. mu, scale (via invd chain), magnitude, albedo
    and ray directions."""
    n_live = scene.n
    if pb is None or qb is None:
        dpb, dqb = _block_sizes(n_live)
        pb = dpb if pb is None else pb
        qb = dqb if qb is None else qb
    scene = pad_scene_aniso(scene, max(pb, qb))
    r = dirs.shape[0]
    rb = min(rb, r)
    pad = (-r) % rb
    if pad:
        # any pad direction is safe here (Cauchy-Schwarz in the D^-1/2
        # metric bounds the exponent for EVERY n) — unit kept for symmetry
        # with the isotropic path
        unit = jnp.zeros((pad, 3), dirs.dtype).at[:, 2].set(1.0)
        dirs_p = jnp.concatenate([dirs, unit])
    else:
        dirs_p = dirs
    counts = jnp.full((1,), n_live, jnp.int32)
    oc = scene.mu - o[None, :]
    invd = 1.0 / (scene.scale * scene.scale)
    colors_t = render_fused_aniso(
        oc[None], invd[None], scene.magnitude[None], scene.albedo[None],
        dirs_p.T[None], counts, rb=rb, pb=pb, qb=qb, rb_bwd=rb_bwd,
        erf_name=erf_name, exp_name=exp_name, interpret=interpret)[0]
    return colors_t.T[:r]
