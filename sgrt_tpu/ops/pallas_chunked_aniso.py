"""Gaussian-axis CHUNKED kernel for ANISOTROPIC scenes.

The anisotropic twin of ops.pallas_chunked: the same chunk-pair grid
(exact, by the additive transmittance exponent) and the same packed
Gaussian-minor operand layout, with ops.pallas_aniso's per-(Gaussian, ray)
sigma_bar/inv PLANES in place of the isotropic per-Gaussian columns.
Closes the last capacity cliff in the framework: dense anisotropic scenes
above the monolithic aniso backward's measured ceiling
(pallas_aniso.MAX_BWD_CAPACITY_ANISO = 6144) previously hard-errored;
they now stream chunks exactly like the isotropic path.

Packed operand: (B, 16, N) rows
    [ocx, ocy, ocz, invdx, invdy, invdz, mag, alb_r, alb_g, alb_b, 0*6]
(16 rows: the in-kernel (rows, ck) -> (ck, rows) Mosaic transpose wants a
sublane-aligned row count; 6 spare rows ride along as zeros). Gradients
return as a packed (B, 16, N) cotangent with rows
    [docx, docy, docz, dinvdx, dinvdy, dinvdz, dmag, dalb_r/g/b, 0*6].

Backward schedule: recompute (pass A + gradient q-sweep per p-chunk).
A saved-T chunked variant is possible exactly as in the isotropic module;
at chunked scale the auto-threshold there needs multi-GB residuals, so
recompute is the default production schedule here.

Grid and chain-splitting logic are identical to ops.pallas_chunked (see
its docstring for the derivation); only the prep, the per-plane pass
helpers (from ops.pallas_aniso) and the quadratic-form chain differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgrt_tpu.ops.approx import ERF_AND_GAUSS_IMPLS, ERF_IMPLS, EXP_IMPLS
from sgrt_tpu.ops.pallas_aniso import (
    _acc_pass_aniso,
    _grad_pass_aniso,
    _prep_scratch_aniso,
)
from sgrt_tpu.ops.pallas_chunked import (
    DEFAULT_CHUNK,
    MAX_CHUNKED_CAPACITY,
    _live,
    chunk_plan,
)
from sgrt_tpu.ops.pallas_kernel import (
    _VMEM_LIMIT,
    _auto_interpret,
    _base_path_grads,
    _block_sizes,
    _kernel_erf_name,
    _ones_row_sum,
    K_TAPS,
    K_WEIGHTS,
    _SQRT_2_PI,
)

_N_FIELDS = 16   # ocx ocy ocz invdx invdy invdz mag albr albg albb + 6 pad


def _chunk_cols_aniso(pk_ref, pt_s):
    """Transpose one packed chunk (16, ck) → column scratch (ck, 16) and
    return (oc (ck,3), invd (ck,3), mag (ck,1), alb (ck,3))."""
    pt_s[:] = pk_ref[0].T
    pt = pt_s[:]
    return pt[:, 0:3], pt[:, 3:6], pt[:, 6:7], pt[:, 7:10]


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _chunked_fwd_aniso_kernel(counts_ref, pk_p_ref, pk_q_ref, dirs_ref,
                              col_ref, ptp_s, ptq_s,
                              mbp_s, cop_s, invp_s, sbp_s,
                              mbq_s, coq_s, invq_s, sbq_s,
                              a0_s, a1_s, a2_s, a3_s, a4_s, base_s,
                              *, ck: int, pb: int, qb: int, nc: int,
                              erf, exp):
    count = counts_ref[pl.program_id(0)]
    a = pl.program_id(2)
    bq = pl.program_id(3)
    rb = dirs_ref.shape[2]
    cnt_p = _live(count, a * ck, ck)
    cnt_q = _live(count, bq * ck, ck)
    accs = (a0_s, a1_s, a2_s, a3_s, a4_s)

    @pl.when((a == 0) & (bq == 0))
    def _():
        col_ref[0] = jnp.zeros((3, rb), jnp.float32)

    @pl.when((bq == 0) & (cnt_p > 0))
    def _():
        oc_p, invd_p, mag_p, _ = _chunk_cols_aniso(pk_p_ref, ptp_s)
        _prep_scratch_aniso(oc_p, invd_p, mag_p, dirs_ref[0],
                            mbp_s, cop_s, invp_s, sbp_s, exp)
        for s in accs:
            s[:] = jnp.zeros((ck, rb), jnp.float32)
        base_s[:] = jnp.zeros((1, rb), jnp.float32)

    @pl.when((cnt_p > 0) & (cnt_q > 0))
    def _():
        oc_q, invd_q, mag_q, _ = _chunk_cols_aniso(pk_q_ref, ptq_s)
        _prep_scratch_aniso(oc_q, invd_q, mag_q, dirs_ref[0],
                            mbq_s, coq_s, invq_s, sbq_s, exp)
        base_s[:] += _ones_row_sum(coq_s[:] * erf(-mbq_s[:] * invq_s[:]))
        nq = pl.cdiv(cnt_q, qb)
        np_dyn = pl.cdiv(cnt_p, pb)

        def p_body(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            add = _acc_pass_aniso(
                lambda s, l: mbq_s[pl.ds(s, l), :],
                lambda s, l: coq_s[pl.ds(s, l), :],
                lambda s, l: invq_s[pl.ds(s, l), :],
                mbp_s[pl.ds(p0, pb), :], sbp_s[pl.ds(p0, pb), :],
                nq, pb=pb, qb=qb, rb=rb, erf=erf)
            for s, ak in zip(accs, add):
                s[pl.ds(p0, pb), :] += ak
            return 0

        jax.lax.fori_loop(0, np_dyn, p_body, 0)

    @pl.when((bq == nc - 1) & (cnt_p > 0))
    def _():
        np_dyn = pl.cdiv(cnt_p, pb)

        def p_fin(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            tw = sum(
                w * exp(base_s[:] - s[pl.ds(p0, pb), :])
                for w, s in zip(K_WEIGHTS, accs)
            )
            w_p = _SQRT_2_PI * cop_s[pl.ds(p0, pb), :] * tw
            col_ref[0] += jax.lax.dot_general(
                ptp_s[pl.ds(p0, pb), 7:10], w_p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, np_dyn, p_fin, 0)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _chain_prep_cols_aniso(oc, invd, mag, d, mb, co, inv, sb,
                           dmb, dco, dsb, dinv):
    """Chain accumulated plane cotangents through the anisotropic
    quadratic-form prep (linear) → (doc (K,3), dinvd (K,3), dmag (K,1),
    ddirs (3,RB)). Port of pallas_aniso._aniso_epilogue returning values;
    dsb (p-side tap path) / dinv (q-side) may be None."""
    A = 2.0 * inv * inv                                           # (K, RB)
    dcoco = dco * co
    dsb_tot = dcoco / sb
    if dsb is not None:
        dsb_tot = dsb_tot + dsb
    if dinv is not None:
        dsb_tot = dsb_tot - dinv * inv / sb
    dg = dcoco
    inv_a = sb * sb                                               # 1/A
    dBt = dmb * inv_a + dg * mb
    dA = -dmb * mb * inv_a - 0.5 * dsb_tot * sb * inv_a - 0.5 * dg * mb * mb
    dC = -0.5 * jnp.sum(dg, axis=1, keepdims=True)                # (K, 1)

    M = oc * invd                                                 # (K, 3)
    dM = jax.lax.dot_general(dBt, d, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (K, 3)
    dA_d2 = jax.lax.dot_general(dA, d * d, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dinvd = dA_d2 + dC * (oc * oc) + dM * oc
    doc = dM * invd + 2.0 * dC * oc * invd
    ddirs = (2.0 * d * jax.lax.dot_general(
        invd, dA, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + jax.lax.dot_general(M, dBt, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32))
    dmag = jnp.sum(dcoco, axis=1, keepdims=True) / jnp.where(
        mag == 0, 1.0, mag)
    return doc, dinvd, dmag, ddirs


def _emit_chain_aniso(out16_s, dgrad_ref, ddirs_ref, c0, ck,
                      doc, dinvd, dmag, dalb, ddirs):
    out16_s[:] = jnp.zeros(out16_s.shape, jnp.float32)
    out16_s[:, 0:3] = doc
    out16_s[:, 3:6] = dinvd
    out16_s[:, 6:7] = dmag
    out16_s[:, 7:10] = dalb
    dgrad_ref[0, :, pl.ds(c0, ck)] += out16_s[:].T
    ddirs_ref[0] += ddirs


def _chunked_bwd_aniso_kernel(counts_ref, pk_p_ref, pk_q_ref, dirs_ref,
                              dcol_ref, dgrad_ref, ddirs_ref,
                              ptp_s, ptq_s,
                              mbp_s, cop_s, invp_s, sbp_s,
                              mbq_s, coq_s, invq_s, sbq_s,
                              a0_s, a1_s, a2_s, a3_s, a4_s, base_s, db_s,
                              dmbp_s, dcop_s, dsbp_s, dalbp_s,
                              dmbq_s, dcoq_s, dinvq_s, out16_s,
                              *, ck: int, pb: int, qb: int, nc: int, n: int,
                              erf, exp, erf_and_gauss):
    count = counts_ref[pl.program_id(0)]
    i = pl.program_id(1)
    a = pl.program_id(2)
    phase = pl.program_id(3)
    bq = pl.program_id(4)
    rb = dirs_ref.shape[2]
    d = dirs_ref[0]                                              # (3, RB)
    dcol = dcol_ref[0]                                           # (3, RB)
    cnt_p = _live(count, a * ck, ck)
    cnt_q = _live(count, bq * ck, ck)
    accs = (a0_s, a1_s, a2_s, a3_s, a4_s)
    np_dyn = pl.cdiv(cnt_p, pb)

    @pl.when((i == 0) & (a == 0) & (phase == 0) & (bq == 0))
    def _():
        dgrad_ref[0] = jnp.zeros((_N_FIELDS, n), jnp.float32)

    @pl.when((a == 0) & (phase == 0) & (bq == 0))
    def _():
        ddirs_ref[0] = jnp.zeros((3, rb), jnp.float32)

    # ---- pass A -----------------------------------------------------------
    @pl.when((phase == 0) & (bq == 0) & (cnt_p > 0))
    def _():
        oc_p, invd_p, mag_p, _ = _chunk_cols_aniso(pk_p_ref, ptp_s)
        _prep_scratch_aniso(oc_p, invd_p, mag_p, d,
                            mbp_s, cop_s, invp_s, sbp_s, exp)
        for s in accs:
            s[:] = jnp.zeros((ck, rb), jnp.float32)
        base_s[:] = jnp.zeros((1, rb), jnp.float32)

    @pl.when((phase == 0) & (cnt_p > 0) & (cnt_q > 0))
    def _():
        oc_q, invd_q, mag_q, _ = _chunk_cols_aniso(pk_q_ref, ptq_s)
        _prep_scratch_aniso(oc_q, invd_q, mag_q, d,
                            mbq_s, coq_s, invq_s, sbq_s, exp)
        base_s[:] += _ones_row_sum(coq_s[:] * erf(-mbq_s[:] * invq_s[:]))
        nq = pl.cdiv(cnt_q, qb)

        def p_body(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            add = _acc_pass_aniso(
                lambda s, l: mbq_s[pl.ds(s, l), :],
                lambda s, l: coq_s[pl.ds(s, l), :],
                lambda s, l: invq_s[pl.ds(s, l), :],
                mbp_s[pl.ds(p0, pb), :], sbp_s[pl.ds(p0, pb), :],
                nq, pb=pb, qb=qb, rb=rb, erf=erf)
            for s, ak in zip(accs, add):
                s[pl.ds(p0, pb), :] += ak
            return 0

        jax.lax.fori_loop(0, np_dyn, p_body, 0)

    # ---- pass B step 0: db_a + p-side weights-path terms ------------------
    @pl.when((phase == 1) & (bq == 0) & (cnt_p > 0))
    def _():
        db_s[:] = jnp.zeros((1, rb), jnp.float32)
        dmbp_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dcop_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dsbp_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dalbp_s[:] = jnp.zeros((ck, 3), jnp.float32)

        def p_init(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            co_p = cop_s[pl.ds(p0, pb), :]
            alb_p = ptp_s[pl.ds(p0, pb), 7:10]
            A_p = jnp.dot(alb_p, dcol, preferred_element_type=jnp.float32)
            g_p = _SQRT_2_PI * co_p * A_p
            tw_p = sum(
                w * exp(base_s[:] - s[pl.ds(p0, pb), :])
                for w, s in zip(K_WEIGHTS, accs)
            )
            db_s[:] += _ones_row_sum(g_p * tw_p)
            dcop_s[pl.ds(p0, pb), :] += _SQRT_2_PI * tw_p * A_p
            w_p = _SQRT_2_PI * co_p * tw_p
            dalbp_s[pl.ds(p0, pb), :] += jax.lax.dot_general(
                w_p, dcol, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, np_dyn, p_init, 0)

    # ---- pass B: q-side gradient pass + base path + q chain ---------------
    @pl.when((phase == 1) & (cnt_p > 0) & (cnt_q > 0))
    def _():
        oc_q, invd_q, mag_q, _ = _chunk_cols_aniso(pk_q_ref, ptq_s)
        _prep_scratch_aniso(oc_q, invd_q, mag_q, d,
                            mbq_s, coq_s, invq_s, sbq_s, exp)
        dmbq_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dcoq_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dinvq_s[:] = jnp.zeros((ck, rb), jnp.float32)
        nq = pl.cdiv(cnt_q, qb)

        def p_body(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            mu_p = mbp_s[pl.ds(p0, pb), :]
            sb_p = sbp_s[pl.ds(p0, pb), :]
            co_p = cop_s[pl.ds(p0, pb), :]
            alb_p = ptp_s[pl.ds(p0, pb), 7:10]
            A_p = jnp.dot(alb_p, dcol, preferred_element_type=jnp.float32)
            g_p = _SQRT_2_PI * co_p * A_p
            T = tuple(
                w * exp(base_s[:] - s[pl.ds(p0, pb), :])
                for w, s in zip(K_WEIGHTS, accs)
            )
            G = tuple(g_p * t for t in T)
            dmu_p, dsb_p = _grad_pass_aniso(
                lambda s, l: mbq_s[pl.ds(s, l), :],
                lambda s, l: coq_s[pl.ds(s, l), :],
                lambda s, l: invq_s[pl.ds(s, l), :],
                dcoq_s, dmbq_s, dinvq_s, mu_p, sb_p, G, nq,
                pb=pb, qb=qb, rb=rb, erf_and_gauss=erf_and_gauss)
            dmbp_s[pl.ds(p0, pb), :] += dmu_p
            dsbp_s[pl.ds(p0, pb), :] += dsb_p
            return 0

        jax.lax.fori_loop(0, np_dyn, p_body, 0)

        mbq = mbq_s[:]
        coq = coq_s[:]
        invq = invq_s[:]
        e1, g1 = erf_and_gauss(-mbq * invq)
        _base_path_grads(db_s[:], e1, g1, mbq, coq, invq,
                         dcoq_s, dmbq_s, dinvq_s)
        doc, dinvd, dmag, ddirs = _chain_prep_cols_aniso(
            oc_q, invd_q, mag_q, d, mbq, coq, invq, sbq_s[:],
            dmbq_s[:], dcoq_s[:], None, dinvq_s[:])
        _emit_chain_aniso(out16_s, dgrad_ref, ddirs_ref,
                          pl.multiple_of(bq * ck, ck), ck,
                          doc, dinvd, dmag,
                          jnp.zeros((ck, 3), jnp.float32), ddirs)

    # ---- pass B last step: chain the p-side accumulators ------------------
    @pl.when((phase == 1) & (bq == nc - 1) & (cnt_p > 0))
    def _():
        ptp = ptp_s[:]
        doc, dinvd, dmag, ddirs = _chain_prep_cols_aniso(
            ptp[:, 0:3], ptp[:, 3:6], ptp[:, 6:7], d,
            mbp_s[:], cop_s[:], invp_s[:], sbp_s[:],
            dmbp_s[:], dcop_s[:], dsbp_s[:], None)
        _emit_chain_aniso(out16_s, dgrad_ref, ddirs_ref,
                          pl.multiple_of(a * ck, ck), ck,
                          doc, dinvd, dmag, dalbp_s[:], ddirs)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _chunked_fwd_aniso_call(packed_t, dirs_t, counts, *, ck, rb, pb, qb,
                            erf_name, exp_name, interpret):
    b, _, n = packed_t.shape
    r = dirs_t.shape[2]
    nc = n // ck
    erf = ERF_IMPLS[erf_name]
    exp = EXP_IMPLS[exp_name]
    kernel = functools.partial(_chunked_fwd_aniso_kernel, ck=ck, pb=pb,
                               qb=qb, nc=nc, erf=erf, exp=exp)
    n_erf = 6 * b * r * n * n
    p_spec = pl.BlockSpec((1, _N_FIELDS, ck), lambda bb, i, a, q, c: (bb, 0, a))
    q_spec = pl.BlockSpec((1, _N_FIELDS, ck), lambda bb, i, a, q, c: (bb, 0, q))
    r_spec = pl.BlockSpec((1, 3, rb), lambda bb, i, a, q, c: (bb, 0, i))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r // rb, nc, nc),
        in_specs=[p_spec, q_spec, r_spec],
        out_specs=r_spec,
        scratch_shapes=(
            [pltpu.VMEM((ck, _N_FIELDS), jnp.float32)] * 2    # ptp, ptq
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 4   # mbp cop invp sbp
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 4   # mbq coq invq sbq
            + [pltpu.VMEM((ck, rb), jnp.float32)] * len(K_TAPS)   # acc
            + [pltpu.VMEM((1, rb), jnp.float32)]              # base
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 3, r), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=14 * n_erf, bytes_accessed=4 * b * n * _N_FIELDS * nc,
            transcendentals=n_erf,
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(counts, packed_t, packed_t, dirs_t)


def _chunked_bwd_aniso_call(packed_t, dirs_t, counts, dcol, *, ck, rb, pb,
                            qb, erf_name, exp_name, interpret):
    b, _, n = packed_t.shape
    r = dirs_t.shape[2]
    nc = n // ck
    erf = ERF_IMPLS[erf_name]
    exp = EXP_IMPLS[exp_name]
    eag = ERF_AND_GAUSS_IMPLS.get(erf_name, ERF_AND_GAUSS_IMPLS["as5"])
    kernel = functools.partial(_chunked_bwd_aniso_kernel, ck=ck, pb=pb,
                               qb=qb, nc=nc, n=n, erf=erf, exp=exp,
                               erf_and_gauss=eag)
    p_spec = pl.BlockSpec((1, _N_FIELDS, ck),
                          lambda bb, i, a, ph, q, c: (bb, 0, a))
    q_spec = pl.BlockSpec((1, _N_FIELDS, ck),
                          lambda bb, i, a, ph, q, c: (bb, 0, q))
    r_spec = pl.BlockSpec((1, 3, rb), lambda bb, i, a, ph, q, c: (bb, 0, i))
    g_spec = pl.BlockSpec((1, _N_FIELDS, n),
                          lambda bb, i, a, ph, q, c: (bb, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r // rb, nc, 2, nc),
        in_specs=[p_spec, q_spec, r_spec, r_spec],
        out_specs=[g_spec, r_spec],
        scratch_shapes=(
            [pltpu.VMEM((ck, _N_FIELDS), jnp.float32)] * 2    # ptp, ptq
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 4   # mbp cop invp sbp
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 4   # mbq coq invq sbq
            + [pltpu.VMEM((ck, rb), jnp.float32)] * len(K_TAPS)   # acc
            + [pltpu.VMEM((1, rb), jnp.float32)] * 2          # base, db
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 3   # dmbp dcop dsbp
            + [pltpu.VMEM((ck, 3), jnp.float32)]              # dalbp
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 3   # dmbq dcoq dinvq
            + [pltpu.VMEM((ck, _N_FIELDS), jnp.float32)]      # out16
        ),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, _N_FIELDS, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, r), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )
    dgrad, ddirs = call(counts, packed_t, packed_t, dirs_t, dcol)
    return dgrad, ddirs


@functools.lru_cache(maxsize=64)
def _make_chunked_aniso_op(ck, rb, pb, qb, rb_bwd, erf_name, exp_name,
                           interpret):
    """Chunked anisotropic custom-VJP op over the PACKED operand:
    op(packed_t (B,16,N), dirs_t (B,3,R), counts (B,)) -> colors (B,3,R)."""

    @jax.custom_vjp
    def chunked_op(packed_t, dirs_t, counts):
        return _chunked_fwd_aniso_call(packed_t, dirs_t, counts, ck=ck,
                                       rb=rb, pb=pb, qb=qb,
                                       erf_name=erf_name, exp_name=exp_name,
                                       interpret=interpret)

    def fwd(packed_t, dirs_t, counts):
        return chunked_op(packed_t, dirs_t, counts), (packed_t, dirs_t,
                                                      counts)

    def bwd(res, g):
        packed_t, dirs_t, counts = res
        dgrad, ddirs = _chunked_bwd_aniso_call(
            packed_t, dirs_t, counts, g, ck=ck, rb=rb_bwd, pb=pb, qb=qb,
            erf_name=erf_name, exp_name=exp_name, interpret=interpret)
        dcounts = np.zeros(counts.shape, jax.dtypes.float0)
        return dgrad, ddirs, dcounts

    chunked_op.defvjp(fwd, bwd)
    return chunked_op


def render_fused_chunked_aniso(scene_oc, invd, mag, albedo, dirs_t,
                               counts=None, *, ck: int = DEFAULT_CHUNK,
                               rb: int = 128, pb: int = 8, qb: int = 32,
                               rb_bwd: int | None = None,
                               erf_name: str = "as5",
                               exp_name: str = "exact",
                               interpret: bool | None = None):
    """Chunked fused ANISOTROPIC render: oc (B,N,3), invd (B,N,3) =
    scale^-2, mag (B,N), albedo (B,N,3), dirs_t (B,3,R) → colors (B,3,R),
    the Gaussian axis streamed in C = N/ck chunks with packed (B,16,N)
    operands. Differentiable (analytic VJP incl. d invd and d dirs; the
    caller's invd = scale^-2 chain gives d scale by outer autodiff)."""
    erf_name = _kernel_erf_name(erf_name)
    if interpret is None:
        interpret = _auto_interpret()
    b, n, _ = scene_oc.shape
    r = dirs_t.shape[2]
    rb = min(rb, r)
    rb_bwd = rb if rb_bwd is None else min(rb_bwd, r)
    ck = min(-(-ck // 128) * 128, n)
    pb = min(pb, ck)
    qb = min(qb, ck)
    if (n % ck or ck % pb or ck % qb or r % rb or r % rb_bwd
            or pb % 8 or qb % 8 or ck % 128):
        raise ValueError(
            f"shape (R={r}, N={n}) not divisible by chunk/blocks "
            f"(ck={ck}, rb={rb}, rb_bwd={rb_bwd}, pb={pb}, qb={qb}; "
            "ck must be a multiple of 128)")
    if n > MAX_CHUNKED_CAPACITY:
        raise ValueError(
            f"padded capacity {n} exceeds MAX_CHUNKED_CAPACITY "
            f"({MAX_CHUNKED_CAPACITY}); use a finer tile grid")
    if counts is None:
        counts = jnp.full((b,), n, jnp.int32)
    counts = jnp.minimum(counts.astype(jnp.int32), n)
    pad = jnp.zeros((b, n, _N_FIELDS - 10), scene_oc.dtype)
    packed_t = jnp.concatenate(
        [scene_oc, invd, mag[:, :, None], albedo, pad],
        axis=2).transpose(0, 2, 1)                       # (B, 16, N)
    op = _make_chunked_aniso_op(ck, rb, pb, qb, rb_bwd, erf_name, exp_name,
                                interpret)
    return op(packed_t, dirs_t, counts)


def render_tiles_chunked_aniso(tiled, o, tile_dirs, counts=None, *,
                               ck: int = DEFAULT_CHUNK, rb: int = 128,
                               pb: int | None = None, qb: int | None = None,
                               rb_bwd: int | None = None,
                               erf_name: str = "as5",
                               exp_name: str = "exact",
                               interpret: bool | None = None):
    """Chunked sibling of pallas_aniso.render_tiles_pallas_aniso: tiled
    AnisoScene leaves (T2, K, ...) with K up to MAX_CHUNKED_CAPACITY."""
    k = tiled.scale.shape[1]
    if pb is None or qb is None:
        dpb, dqb = _block_sizes(min(k, ck))
        pb = dpb if pb is None else pb
        qb = dqb if qb is None else qb
    o = jnp.asarray(o)
    o_b = o[None, None, :] if o.ndim == 1 else o[:, None, :]
    oc = tiled.mu - o_b
    invd = 1.0 / (tiled.scale * tiled.scale)
    dirs_t = jnp.transpose(tile_dirs, (0, 2, 1))
    colors_t = render_fused_chunked_aniso(
        oc, invd, tiled.magnitude, tiled.albedo, dirs_t, counts, ck=ck,
        rb=rb, pb=pb, qb=qb, rb_bwd=rb_bwd, erf_name=erf_name,
        exp_name=exp_name, interpret=interpret)
    return jnp.transpose(colors_t, (0, 2, 1))


def tile_renderer_aniso_for(capacity: int, *, erf_name: str = "as5",
                            exp_name: str = "exact", pb: int | None = None,
                            qb: int | None = None, rb: int = 128):
    """Anisotropic twin of pallas_chunked.tile_renderer_for: routes between
    the monolithic aniso kernel (<= pallas_aniso.MAX_BWD_CAPACITY_ANISO)
    and the chunked aniso kernel. Returns (padded_capacity,
    render_fn(tiled_aniso_scene, o, tile_dirs, counts))."""
    import math

    from sgrt_tpu.ops.pallas_aniso import (MAX_BWD_CAPACITY_ANISO,
                                           render_tiles_pallas_aniso)

    if capacity > MAX_BWD_CAPACITY_ANISO:
        cap, ck = chunk_plan(capacity)

        def render_fn(tiled, o, d, counts):
            return render_tiles_chunked_aniso(tiled, o, d, counts, ck=ck,
                                              rb=rb, erf_name=erf_name,
                                              exp_name=exp_name)

        return cap, render_fn

    dpb, dqb = _block_sizes(capacity)
    pb = dpb if pb is None else pb
    qb = dqb if qb is None else qb
    align = math.lcm(pb, qb)
    cap = max(align, -(-capacity // align) * align)

    def render_fn(tiled, o, d, counts):
        return render_tiles_pallas_aniso(tiled, o, d, counts, rb=rb, pb=pb,
                                         qb=qb, erf_name=erf_name,
                                         exp_name=exp_name)

    return cap, render_fn
