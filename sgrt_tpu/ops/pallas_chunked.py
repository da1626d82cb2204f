"""Gaussian-axis CHUNKED fused kernel — breaks the dense-scene capacity wall.

The fused kernels in ops.pallas_kernel hold the whole per-tile Gaussian
axis (capacity N) in VMEM: forward/backward scratch is O(N * RB), which
caps the backward at MAX_BWD_CAPACITY = 4096 rows (measured v5e ceiling).
Scenes whose per-tile counts exceed that — 100k-Gaussian fitting at 512²
reaches ~10k per tile (docs/LARGE_N.md) — simply could not run. The
reference never truncates (per-tile std::vector, src/vrt/rt.cpp:64); this
module restores that contract on TPU.

The math makes chunking exact: the transmittance exponent is ADDITIVE over
Gaussians,

    acc_k(p, r) = sum_q co(q,r) * erf((mb_p + k*sig_p - mb_q) * inv_q)
    base(r)     = sum_q co(q,r) * erf(-mb_q * inv_q)

so splitting the Gaussian axis into C chunks of ck rows turns the kernel
into a chunk-pair iteration: for each p-chunk a, stream the q-chunks
through VMEM, accumulating acc_k(p in a) and base; exponentiate only when
the q sweep is complete. VMEM then holds TWO chunks (plus ck-sized
accumulators) instead of the whole axis — the VMEM wall disappears.

**Operand layout: Gaussians on LANES.** The monolithic kernels take
(B, N, 3)/(B, N, 1) operands, and Pallas constrains them to the default
{2,1,0:T(8,128)} layout — the minor dim (3 or 1) is lane-padded to 128, a
43x HBM blowup that XLA materializes as relayout copies before the call
(measured: 5.06 GB of pure copies for a 256-tile x 10368-capacity
forward, crashing the worker at 100k scale). Here ALL per-Gaussian fields
ride in ONE packed (B, 8, N) operand — rows [ocx, ocy, ocz, sigma, mag,
alb_r, alb_g, alb_b], minor dim N perfectly tiled — and each chunk is
transposed to column form (ck, 8) in ONE in-kernel Mosaic transpose.
Gradients return the same way: a packed (B, 8, N) cotangent assembled by
transposing a (ck, 8) chain output into lane-offset slices. HBM cost:
85 MB where the naive layout needed 5+ GB.

Grid layout (sequential on TPU, last dim fastest):

    forward:  (tiles, ray_blocks, C_p, C_q)
        bq == 0         → transpose+prep p-chunk planes; zero acc/base
        every bq        → prep q-chunk; base += ...; acc_k += pass A vs q
        bq == C-1       → T_k = w_k exp(base - acc_k); colors += albᵀ(co·tw)

    backward: (tiles, ray_blocks, C_p, 2, C_q)   phase 0 = pass A (as fwd),
        phase 1, bq == 0 → db_a = Σ_p g_p tw_p; p-side weights-path terms
        phase 1, every bq → q-side gradient pass + base-path (db_a) +
                            chain through q prep into the output rows of bq
        phase 1, bq == C-1 → chain accumulated p-side grads into rows of a

    Both chains are LINEAR in the accumulated cotangents, so applying the
    prep chain per (a, bq) step and revisit-summing into the output block
    equals the monolithic epilogue of ops.pallas_kernel.

Per-tile counts keep their prefix semantics across the WHOLE chunked axis
(tile compaction packs live indices first): chunk a's live rows are
clip(count - a*ck, 0, ck), and fully dead chunk pairs are skipped, so cost
still scales with count², not (C*ck)². Rows beyond count must be inert
(sigma=1, magnitude=0 dummy padding — the compaction contract), exactly
as in the monolithic kernels.

Supersedes nothing — ops.pallas_kernel remains the fast path for
capacity <= MAX_BWD_CAPACITY (fewer grid steps, saved-T backward);
parallel.fit routes to this module above it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgrt_tpu.ops.approx import ERF_AND_GAUSS_IMPLS, ERF_IMPLS, EXP_IMPLS
from sgrt_tpu.ops.pallas_kernel import (
    _VMEM_LIMIT,
    _acc_pass,
    _auto_interpret,
    _base_path_grads,
    _block_sizes,
    _grad_pass,
    _kernel_erf_name,
    _ones_row_sum,
    _prep_scratch,
    K_TAPS,
    K_WEIGHTS,
    _SQRT_2_PI,
)

# Ceiling on the TOTAL per-tile padded capacity (C * ck). With the packed
# (B, 8, N) layout the backward's VMEM residents are ck-sized scratch
# planes plus a (8, N) output block (8*N*4 B — 2 MB at N=65536), so the
# binding constraint is HBM for the operands/outputs and grid-step count
# (C² per ray block), not VMEM. 16x the monolithic kernel's
# MAX_BWD_CAPACITY.
MAX_CHUNKED_CAPACITY = 65536

# Default chunk size: multiple of 128 (the in-kernel (8, ck) transpose
# wants a lane-aligned ck; also keeps lane-offset output writes aligned).
# 2048 rows keeps the per-(a, bq) step's erf work far above per-step
# prep/DMA overhead while the ~17 (ck, 128) f32 scratch planes stay ~17 MB.
DEFAULT_CHUNK = 2048

_N_FIELDS = 8   # packed rows: ocx ocy ocz sigma magnitude alb_r alb_g alb_b


def _live(count, c0, ck):
    """Live rows of the chunk starting at row c0 (prefix-fill semantics)."""
    return jnp.clip(count - c0, 0, ck)


def tile_renderer_for(capacity: int, *, erf_name: str = "as5",
                      exp_name: str = "exact", pb: int | None = None,
                      qb: int | None = None, rb: int = 128):
    """Route a per-tile renderer by capacity — THE single place deciding
    between the monolithic fused kernel (<= pallas_kernel.MAX_BWD_CAPACITY)
    and this module's chunked kernel (above it; up to
    MAX_CHUNKED_CAPACITY). Returns (padded_capacity,
    render_fn(tiled_scene, o, tile_dirs, counts)) — callers gather/compact
    at the padded capacity. pb/qb override the monolithic block sizes
    (the chunked kernel picks its own from the chunk size)."""
    import math

    from sgrt_tpu.ops.pallas_kernel import (MAX_BWD_CAPACITY,
                                            render_tiles_pallas)

    if capacity > MAX_BWD_CAPACITY:
        cap, ck = chunk_plan(capacity)

        def render_fn(tiled, o, d, counts):
            return render_tiles_chunked(tiled, o, d, counts, ck=ck, rb=rb,
                                        erf_name=erf_name,
                                        exp_name=exp_name)

        return cap, render_fn

    dpb, dqb = _block_sizes(capacity)
    pb = dpb if pb is None else pb
    qb = dqb if qb is None else qb
    align = math.lcm(pb, qb)
    cap = max(align, -(-capacity // align) * align)

    def render_fn(tiled, o, d, counts):
        return render_tiles_pallas(tiled, o, d, counts, rb=rb, pb=pb, qb=qb,
                                   erf_name=erf_name, exp_name=exp_name)

    return cap, render_fn


def chunk_plan(capacity: int) -> tuple[int, int]:
    """Size the chunk axis for a requested per-tile capacity: the smallest
    chunk count C = ceil(capacity / DEFAULT_CHUNK), with the chunk size ck
    rounded up to 128 lanes. Returns (padded_capacity, ck) with
    padded_capacity = C * ck >= capacity — callers gather/compact at the
    padded capacity so the kernel's N divides exactly into chunks."""
    c = max(1, -(-capacity // DEFAULT_CHUNK))
    per = -(-capacity // c)                      # ceil(capacity / C)
    ck = -(-per // 128) * 128                    # lane-aligned chunk size
    return c * ck, ck


def _chunk_cols(pk_ref, pt_s):
    """Transpose one packed chunk (8, ck) → column scratch (ck, 8) and
    return the column views (oc (ck,3), sig (ck,1), mag (ck,1),
    alb (ck,3))."""
    pt_s[:] = pk_ref[0].T
    pt = pt_s[:]
    return pt[:, 0:3], pt[:, 3:4], pt[:, 4:5], pt[:, 5:8]


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _chunked_fwd_kernel(counts_ref, pk_p_ref, pk_q_ref, dirs_ref, col_ref,
                        ptp_s, ptq_s, mbp_s, cop_s, invp_s,
                        mbq_s, coq_s, invq_s,
                        a0_s, a1_s, a2_s, a3_s, a4_s, base_s,
                        *, ck: int, pb: int, qb: int, nc: int, erf, exp):
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
        oc_p, sig_p, mag_p, _ = _chunk_cols(pk_p_ref, ptp_s)
        _prep_scratch(oc_p, sig_p, mag_p, dirs_ref[0],
                      mbp_s, cop_s, invp_s, exp)
        for s in accs:
            s[:] = jnp.zeros((ck, rb), jnp.float32)
        base_s[:] = jnp.zeros((1, rb), jnp.float32)

    @pl.when((cnt_p > 0) & (cnt_q > 0))
    def _():
        oc_q, sig_q, mag_q, _ = _chunk_cols(pk_q_ref, ptq_s)
        _prep_scratch(oc_q, sig_q, mag_q, dirs_ref[0],
                      mbq_s, coq_s, invq_s, exp)
        base_s[:] += _ones_row_sum(coq_s[:] * erf(-mbq_s[:] * invq_s[:]))
        nq = pl.cdiv(cnt_q, qb)
        np_dyn = pl.cdiv(cnt_p, pb)

        def p_body(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            mu_p = mbp_s[pl.ds(p0, pb), :]
            sig_p = ptp_s[pl.ds(p0, pb), 3:4]
            add = _acc_pass(
                lambda s, l: mbq_s[pl.ds(s, l), :],
                lambda s, l: coq_s[pl.ds(s, l), :],
                lambda s, l: invq_s[pl.ds(s, l), :],
                mu_p, sig_p, nq, pb=pb, qb=qb, rb=rb, erf=erf)
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
                ptp_s[pl.ds(p0, pb), 5:8], w_p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, np_dyn, p_fin, 0)


def _chunked_fwd_t_kernel(counts_ref, pk_p_ref, pk_q_ref, dirs_ref, col_ref,
                          t_ref, ptp_s, ptq_s, mbp_s, cop_s, invp_s,
                          mbq_s, coq_s, invq_s,
                          a0_s, a1_s, a2_s, a3_s, a4_s, base_s,
                          *, ck: int, pb: int, qb: int, nc: int, erf, exp):
    """Forward that ALSO materializes the 5 per-(p, ray) transmittance
    factors T_k = w_k exp(base - acc_k) to HBM, per chunk block — the
    chunked twin of pallas_kernel's saved-T forward. T is O(5*N*R) next
    to the O(N²*R) pass-A recompute it saves in the backward. Dead rows
    within a live chunk carry garbage-free values whose gradients vanish
    through co_p = 0; fully dead chunks are zeroed up front."""
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

    @pl.when(bq == 0)
    def _():
        t_ref[0] = jnp.zeros((len(K_TAPS), ck, rb), jnp.float32)

    @pl.when((bq == 0) & (cnt_p > 0))
    def _():
        oc_p, sig_p, mag_p, _ = _chunk_cols(pk_p_ref, ptp_s)
        _prep_scratch(oc_p, sig_p, mag_p, dirs_ref[0],
                      mbp_s, cop_s, invp_s, exp)
        for s in accs:
            s[:] = jnp.zeros((ck, rb), jnp.float32)
        base_s[:] = jnp.zeros((1, rb), jnp.float32)

    @pl.when((cnt_p > 0) & (cnt_q > 0))
    def _():
        oc_q, sig_q, mag_q, _ = _chunk_cols(pk_q_ref, ptq_s)
        _prep_scratch(oc_q, sig_q, mag_q, dirs_ref[0],
                      mbq_s, coq_s, invq_s, exp)
        base_s[:] += _ones_row_sum(coq_s[:] * erf(-mbq_s[:] * invq_s[:]))
        nq = pl.cdiv(cnt_q, qb)
        np_dyn = pl.cdiv(cnt_p, pb)

        def p_body(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            add = _acc_pass(
                lambda s, l: mbq_s[pl.ds(s, l), :],
                lambda s, l: coq_s[pl.ds(s, l), :],
                lambda s, l: invq_s[pl.ds(s, l), :],
                mbp_s[pl.ds(p0, pb), :], ptp_s[pl.ds(p0, pb), 3:4],
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
            T = tuple(
                w * exp(base_s[:] - s[pl.ds(p0, pb), :])
                for w, s in zip(K_WEIGHTS, accs)
            )
            for ki, tk in enumerate(T):
                t_ref[0, ki, pl.ds(p0, pb), :] = tk
            tw = sum(T)
            w_p = _SQRT_2_PI * cop_s[pl.ds(p0, pb), :] * tw
            col_ref[0] += jax.lax.dot_general(
                ptp_s[pl.ds(p0, pb), 5:8], w_p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, np_dyn, p_fin, 0)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _chain_prep_cols(oc, sig, mag, d, mb, co, dmb, dco, dsig, dinv, inv):
    """Chain accumulated plane cotangents through the in-kernel prep
    (linear — see module docstring) → (doc (K,3), dsig_col (K,1),
    dmag_col (K,1), ddirs (3,RB)). Mirrors pallas_kernel's
    _fused_prep_epilogue; dsig/dinv may be None (q-side has no tap-path
    dsig; p-side has no dinv)."""
    ocsq = jnp.sum(oc * oc, axis=1, keepdims=True)
    inv2s2 = 1.0 / (2.0 * sig * sig)
    dcoco = dco * co
    dmb = dmb + dcoco * (2.0 * inv2s2) * mb
    docsq = jnp.sum(dcoco, axis=1, keepdims=True) * (-inv2s2)
    s_row = jnp.sum(dcoco, axis=1, keepdims=True)
    s_qmb = jnp.sum(dcoco * (ocsq - mb * mb), axis=1, keepdims=True)
    dsig_col = s_row / sig + s_qmb / (sig * sig * sig)
    if dsig is not None:
        dsig_col += jnp.sum(dsig, axis=1, keepdims=True)
    if dinv is not None:
        dsig_col += jnp.sum(dinv, axis=1, keepdims=True) * (-inv / sig)
    dmag_col = mag * s_row / jnp.where(mag == 0, 1.0, mag * mag)
    doc = (jax.lax.dot_general(dmb, d, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + 2.0 * oc * docsq)
    ddirs = jax.lax.dot_general(oc, dmb, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return doc, dsig_col, dmag_col, ddirs


def _emit_chain(out8_s, dgrad_ref, ddirs_ref, c0, ck,
                doc, dsig_col, dmag_col, dalb, ddirs):
    """Assemble the packed (ck, 8) chain output and accumulate it (one
    Mosaic transpose) into the (8, N) gradient block at lane offset c0."""
    out8_s[:, 0:3] = doc
    out8_s[:, 3:4] = dsig_col
    out8_s[:, 4:5] = dmag_col
    out8_s[:, 5:8] = dalb
    dgrad_ref[0, :, pl.ds(c0, ck)] += out8_s[:].T
    ddirs_ref[0] += ddirs


def _chunked_bwd_kernel(counts_ref, pk_p_ref, pk_q_ref, dirs_ref, dcol_ref,
                        dgrad_ref, ddirs_ref,
                        ptp_s, ptq_s, mbp_s, cop_s, invp_s,
                        mbq_s, coq_s, invq_s,
                        a0_s, a1_s, a2_s, a3_s, a4_s, base_s, db_s,
                        dmbp_s, dcop_s, dsigp_s, dalbp_s,
                        dmbq_s, dcoq_s, dinvq_s, out8_s,
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

    # ---- pass A: identical acc/base accumulation to the forward ----------
    @pl.when((phase == 0) & (bq == 0) & (cnt_p > 0))
    def _():
        oc_p, sig_p, mag_p, _ = _chunk_cols(pk_p_ref, ptp_s)
        _prep_scratch(oc_p, sig_p, mag_p, d, mbp_s, cop_s, invp_s, exp)
        for s in accs:
            s[:] = jnp.zeros((ck, rb), jnp.float32)
        base_s[:] = jnp.zeros((1, rb), jnp.float32)

    @pl.when((phase == 0) & (cnt_p > 0) & (cnt_q > 0))
    def _():
        oc_q, sig_q, mag_q, _ = _chunk_cols(pk_q_ref, ptq_s)
        _prep_scratch(oc_q, sig_q, mag_q, d, mbq_s, coq_s, invq_s, exp)
        base_s[:] += _ones_row_sum(coq_s[:] * erf(-mbq_s[:] * invq_s[:]))
        nq = pl.cdiv(cnt_q, qb)

        def p_body(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            add = _acc_pass(
                lambda s, l: mbq_s[pl.ds(s, l), :],
                lambda s, l: coq_s[pl.ds(s, l), :],
                lambda s, l: invq_s[pl.ds(s, l), :],
                mbp_s[pl.ds(p0, pb), :], ptp_s[pl.ds(p0, pb), 3:4],
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
        dsigp_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dalbp_s[:] = jnp.zeros((ck, 3), jnp.float32)

        def p_init(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            co_p = cop_s[pl.ds(p0, pb), :]
            alb_p = ptp_s[pl.ds(p0, pb), 5:8]
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
        oc_q, sig_q, mag_q, _ = _chunk_cols(pk_q_ref, ptq_s)
        _prep_scratch(oc_q, sig_q, mag_q, d, mbq_s, coq_s, invq_s, exp)
        dmbq_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dcoq_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dinvq_s[:] = jnp.zeros((ck, rb), jnp.float32)
        nq = pl.cdiv(cnt_q, qb)

        def p_body(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            mu_p = mbp_s[pl.ds(p0, pb), :]
            sig_p = ptp_s[pl.ds(p0, pb), 3:4]
            co_p = cop_s[pl.ds(p0, pb), :]
            alb_p = ptp_s[pl.ds(p0, pb), 5:8]
            A_p = jnp.dot(alb_p, dcol, preferred_element_type=jnp.float32)
            g_p = _SQRT_2_PI * co_p * A_p
            T = tuple(
                w * exp(base_s[:] - s[pl.ds(p0, pb), :])
                for w, s in zip(K_WEIGHTS, accs)
            )
            G = tuple(g_p * t for t in T)
            dmu_p, dsig_p = _grad_pass(
                lambda s, l: mbq_s[pl.ds(s, l), :],
                lambda s, l: coq_s[pl.ds(s, l), :],
                lambda s, l: invq_s[pl.ds(s, l), :],
                dcoq_s, dmbq_s, dinvq_s, mu_p, sig_p, G, nq,
                pb=pb, qb=qb, rb=rb, erf_and_gauss=erf_and_gauss)
            dmbp_s[pl.ds(p0, pb), :] += dmu_p
            dsigp_s[pl.ds(p0, pb), :] += dsig_p
            return 0

        jax.lax.fori_loop(0, np_dyn, p_body, 0)

        # base-path gradients for this q chunk, using this a's complete db
        mbq = mbq_s[:]
        coq = coq_s[:]
        invq = invq_s[:]
        e1, g1 = erf_and_gauss(-mbq * invq)
        _base_path_grads(db_s[:], e1, g1, mbq, coq, invq,
                         dcoq_s, dmbq_s, dinvq_s)

        # chain this q chunk's accumulated cotangents into the outputs
        doc, dsig_col, dmag_col, ddirs = _chain_prep_cols(
            oc_q, sig_q, mag_q, d, mbq, coq,
            dmbq_s[:], dcoq_s[:], None, dinvq_s[:], invq)
        _emit_chain(out8_s, dgrad_ref, ddirs_ref,
                    pl.multiple_of(bq * ck, ck), ck,
                    doc, dsig_col, dmag_col,
                    jnp.zeros((ck, 3), jnp.float32), ddirs)

    # ---- pass B last step: chain the p-side accumulators ------------------
    @pl.when((phase == 1) & (bq == nc - 1) & (cnt_p > 0))
    def _():
        ptp = ptp_s[:]
        doc, dsig_col, dmag_col, ddirs = _chain_prep_cols(
            ptp[:, 0:3], ptp[:, 3:4], ptp[:, 4:5], d, mbp_s[:], cop_s[:],
            dmbp_s[:], dcop_s[:], dsigp_s[:], None, None)
        _emit_chain(out8_s, dgrad_ref, ddirs_ref,
                    pl.multiple_of(a * ck, ck), ck,
                    doc, dsig_col, dmag_col, dalbp_s[:], ddirs)


def _chunked_bwd_t_kernel(counts_ref, pk_p_ref, pk_q_ref, dirs_ref, dcol_ref,
                          t_ref, dgrad_ref, ddirs_ref,
                          ptp_s, ptq_s, mbp_s, cop_s, invp_s,
                          mbq_s, coq_s, invq_s, db_s,
                          dmbp_s, dcop_s, dsigp_s, dalbp_s,
                          dmbq_s, dcoq_s, dinvq_s, out8_s,
                          *, ck: int, pb: int, qb: int, nc: int, n: int,
                          erf, exp, erf_and_gauss):
    """Saved-T backward: the O(N²) pass-A recompute is replaced by reading
    the forward's T_k chunk blocks; only the gradient q-sweep remains —
    grid (b, i, a, bq) with NO phase dimension (vs the recompute
    backward's (b, i, a, 2, bq))."""
    count = counts_ref[pl.program_id(0)]
    i = pl.program_id(1)
    a = pl.program_id(2)
    bq = pl.program_id(3)
    rb = dirs_ref.shape[2]
    d = dirs_ref[0]                                              # (3, RB)
    dcol = dcol_ref[0]                                           # (3, RB)
    cnt_p = _live(count, a * ck, ck)
    cnt_q = _live(count, bq * ck, ck)
    np_dyn = pl.cdiv(cnt_p, pb)

    @pl.when((i == 0) & (a == 0) & (bq == 0))
    def _():
        dgrad_ref[0] = jnp.zeros((_N_FIELDS, n), jnp.float32)

    @pl.when((a == 0) & (bq == 0))
    def _():
        ddirs_ref[0] = jnp.zeros((3, rb), jnp.float32)

    # ---- step 0: p prep + db_a + p-side weights-path terms ----------------
    @pl.when((bq == 0) & (cnt_p > 0))
    def _():
        oc_p, sig_p, mag_p, _ = _chunk_cols(pk_p_ref, ptp_s)
        _prep_scratch(oc_p, sig_p, mag_p, d, mbp_s, cop_s, invp_s, exp)
        db_s[:] = jnp.zeros((1, rb), jnp.float32)
        dmbp_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dcop_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dsigp_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dalbp_s[:] = jnp.zeros((ck, 3), jnp.float32)

        def p_init(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            co_p = cop_s[pl.ds(p0, pb), :]
            alb_p = ptp_s[pl.ds(p0, pb), 5:8]
            A_p = jnp.dot(alb_p, dcol, preferred_element_type=jnp.float32)
            g_p = _SQRT_2_PI * co_p * A_p
            tw_p = sum(t_ref[0, ki, pl.ds(p0, pb), :]
                       for ki in range(len(K_TAPS)))
            db_s[:] += _ones_row_sum(g_p * tw_p)
            dcop_s[pl.ds(p0, pb), :] += _SQRT_2_PI * tw_p * A_p
            w_p = _SQRT_2_PI * co_p * tw_p
            dalbp_s[pl.ds(p0, pb), :] += jax.lax.dot_general(
                w_p, dcol, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, np_dyn, p_init, 0)

    # ---- every bq: q-side gradient pass + base path + q chain -------------
    @pl.when((cnt_p > 0) & (cnt_q > 0))
    def _():
        oc_q, sig_q, mag_q, _ = _chunk_cols(pk_q_ref, ptq_s)
        _prep_scratch(oc_q, sig_q, mag_q, d, mbq_s, coq_s, invq_s, exp)
        dmbq_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dcoq_s[:] = jnp.zeros((ck, rb), jnp.float32)
        dinvq_s[:] = jnp.zeros((ck, rb), jnp.float32)
        nq = pl.cdiv(cnt_q, qb)

        def p_body(pi, _):
            p0 = pl.multiple_of(pi * pb, pb)
            mu_p = mbp_s[pl.ds(p0, pb), :]
            sig_p = ptp_s[pl.ds(p0, pb), 3:4]
            co_p = cop_s[pl.ds(p0, pb), :]
            alb_p = ptp_s[pl.ds(p0, pb), 5:8]
            A_p = jnp.dot(alb_p, dcol, preferred_element_type=jnp.float32)
            g_p = _SQRT_2_PI * co_p * A_p
            G = tuple(g_p * t_ref[0, ki, pl.ds(p0, pb), :]
                      for ki in range(len(K_TAPS)))
            dmu_p, dsig_p = _grad_pass(
                lambda s, l: mbq_s[pl.ds(s, l), :],
                lambda s, l: coq_s[pl.ds(s, l), :],
                lambda s, l: invq_s[pl.ds(s, l), :],
                dcoq_s, dmbq_s, dinvq_s, mu_p, sig_p, G, nq,
                pb=pb, qb=qb, rb=rb, erf_and_gauss=erf_and_gauss)
            dmbp_s[pl.ds(p0, pb), :] += dmu_p
            dsigp_s[pl.ds(p0, pb), :] += dsig_p
            return 0

        jax.lax.fori_loop(0, np_dyn, p_body, 0)

        mbq = mbq_s[:]
        coq = coq_s[:]
        invq = invq_s[:]
        e1, g1 = erf_and_gauss(-mbq * invq)
        _base_path_grads(db_s[:], e1, g1, mbq, coq, invq,
                         dcoq_s, dmbq_s, dinvq_s)
        doc, dsig_col, dmag_col, ddirs = _chain_prep_cols(
            oc_q, sig_q, mag_q, d, mbq, coq,
            dmbq_s[:], dcoq_s[:], None, dinvq_s[:], invq)
        _emit_chain(out8_s, dgrad_ref, ddirs_ref,
                    pl.multiple_of(bq * ck, ck), ck,
                    doc, dsig_col, dmag_col,
                    jnp.zeros((ck, 3), jnp.float32), ddirs)

    # ---- last step: chain the p-side accumulators -------------------------
    @pl.when((bq == nc - 1) & (cnt_p > 0))
    def _():
        ptp = ptp_s[:]
        doc, dsig_col, dmag_col, ddirs = _chain_prep_cols(
            ptp[:, 0:3], ptp[:, 3:4], ptp[:, 4:5], d, mbp_s[:], cop_s[:],
            dmbp_s[:], dcop_s[:], dsigp_s[:], None, None)
        _emit_chain(out8_s, dgrad_ref, ddirs_ref,
                    pl.multiple_of(a * ck, ck), ck,
                    doc, dsig_col, dmag_col, dalbp_s[:], ddirs)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP (packed (B, 8, N) layout)
# ---------------------------------------------------------------------------

def _chunked_fwd_call(packed_t, dirs_t, counts, *, ck, rb, pb, qb,
                      erf_name, exp_name, interpret):
    b, _, n = packed_t.shape
    r = dirs_t.shape[2]
    nc = n // ck
    erf = ERF_IMPLS[erf_name]
    exp = EXP_IMPLS[exp_name]
    kernel = functools.partial(_chunked_fwd_kernel, ck=ck, pb=pb, qb=qb,
                               nc=nc, erf=erf, exp=exp)
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
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 2         # mbp, cop
            + [pltpu.VMEM((ck, 1), jnp.float32)]              # invp
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 2         # mbq, coq
            + [pltpu.VMEM((ck, 1), jnp.float32)]              # invq
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


def _chunked_fwd_t_call(packed_t, dirs_t, counts, *, ck, rb, pb, qb,
                        erf_name, exp_name, interpret):
    b, _, n = packed_t.shape
    r = dirs_t.shape[2]
    nc = n // ck
    nk = len(K_TAPS)
    erf = ERF_IMPLS[erf_name]
    exp = EXP_IMPLS[exp_name]
    kernel = functools.partial(_chunked_fwd_t_kernel, ck=ck, pb=pb, qb=qb,
                               nc=nc, erf=erf, exp=exp)
    n_erf = 6 * b * r * n * n
    p_spec = pl.BlockSpec((1, _N_FIELDS, ck), lambda bb, i, a, q, c: (bb, 0, a))
    q_spec = pl.BlockSpec((1, _N_FIELDS, ck), lambda bb, i, a, q, c: (bb, 0, q))
    r_spec = pl.BlockSpec((1, 3, rb), lambda bb, i, a, q, c: (bb, 0, i))
    t_spec = pl.BlockSpec((1, nk, ck, rb), lambda bb, i, a, q, c: (bb, 0, a, i))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r // rb, nc, nc),
        in_specs=[p_spec, q_spec, r_spec],
        out_specs=[r_spec, t_spec],
        scratch_shapes=(
            [pltpu.VMEM((ck, _N_FIELDS), jnp.float32)] * 2    # ptp, ptq
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 2         # mbp, cop
            + [pltpu.VMEM((ck, 1), jnp.float32)]              # invp
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 2         # mbq, coq
            + [pltpu.VMEM((ck, 1), jnp.float32)]              # invq
            + [pltpu.VMEM((ck, rb), jnp.float32)] * len(K_TAPS)   # acc
            + [pltpu.VMEM((1, rb), jnp.float32)]              # base
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 3, r), jnp.float32),
            jax.ShapeDtypeStruct((b, nk, n, r), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * n_erf,
            bytes_accessed=4 * b * (n * _N_FIELDS * nc + nk * n * r),
            transcendentals=n_erf,
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(counts, packed_t, packed_t, dirs_t)


def _chunked_bwd_t_call(packed_t, dirs_t, counts, t_saved, dcol, *, ck, rb,
                        pb, qb, erf_name, exp_name, interpret):
    b, _, n = packed_t.shape
    r = dirs_t.shape[2]
    nc = n // ck
    nk = len(K_TAPS)
    erf = ERF_IMPLS[erf_name]
    exp = EXP_IMPLS[exp_name]
    eag = ERF_AND_GAUSS_IMPLS.get(erf_name, ERF_AND_GAUSS_IMPLS["as5"])
    kernel = functools.partial(_chunked_bwd_t_kernel, ck=ck, pb=pb, qb=qb,
                               nc=nc, n=n, erf=erf, exp=exp,
                               erf_and_gauss=eag)
    p_spec = pl.BlockSpec((1, _N_FIELDS, ck), lambda bb, i, a, q, c: (bb, 0, a))
    q_spec = pl.BlockSpec((1, _N_FIELDS, ck), lambda bb, i, a, q, c: (bb, 0, q))
    r_spec = pl.BlockSpec((1, 3, rb), lambda bb, i, a, q, c: (bb, 0, i))
    t_spec = pl.BlockSpec((1, nk, ck, rb), lambda bb, i, a, q, c: (bb, 0, a, i))
    g_spec = pl.BlockSpec((1, _N_FIELDS, n), lambda bb, i, a, q, c: (bb, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, r // rb, nc, nc),
        in_specs=[p_spec, q_spec, r_spec, r_spec, t_spec],
        out_specs=[g_spec, r_spec],
        scratch_shapes=(
            [pltpu.VMEM((ck, _N_FIELDS), jnp.float32)] * 2    # ptp, ptq
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 2         # mbp, cop
            + [pltpu.VMEM((ck, 1), jnp.float32)]              # invp
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 2         # mbq, coq
            + [pltpu.VMEM((ck, 1), jnp.float32)]              # invq
            + [pltpu.VMEM((1, rb), jnp.float32)]              # db
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 3         # dmbp dcop dsigp
            + [pltpu.VMEM((ck, 3), jnp.float32)]              # dalbp
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 3         # dmbq dcoq dinvq
            + [pltpu.VMEM((ck, _N_FIELDS), jnp.float32)]      # out8
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
    dgrad, ddirs = call(counts, packed_t, packed_t, dirs_t, dcol, t_saved)
    return dgrad, ddirs


def _chunked_bwd_call(packed_t, dirs_t, counts, dcol, *, ck, rb, pb, qb,
                      erf_name, exp_name, interpret):
    b, _, n = packed_t.shape
    r = dirs_t.shape[2]
    nc = n // ck
    erf = ERF_IMPLS[erf_name]
    exp = EXP_IMPLS[exp_name]
    eag = ERF_AND_GAUSS_IMPLS.get(erf_name, ERF_AND_GAUSS_IMPLS["as5"])
    kernel = functools.partial(_chunked_bwd_kernel, ck=ck, pb=pb, qb=qb,
                               nc=nc, n=n, erf=erf, exp=exp,
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
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 2         # mbp, cop
            + [pltpu.VMEM((ck, 1), jnp.float32)]              # invp
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 2         # mbq, coq
            + [pltpu.VMEM((ck, 1), jnp.float32)]              # invq
            + [pltpu.VMEM((ck, rb), jnp.float32)] * len(K_TAPS)   # acc
            + [pltpu.VMEM((1, rb), jnp.float32)] * 2          # base, db
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 3         # dmbp dcop dsigp
            + [pltpu.VMEM((ck, 3), jnp.float32)]              # dalbp
            + [pltpu.VMEM((ck, rb), jnp.float32)] * 3         # dmbq dcoq dinvq
            + [pltpu.VMEM((ck, _N_FIELDS), jnp.float32)]      # out8
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


# bounded for the same reason as pallas_kernel's op caches: sweeps and
# long-lived servers must not accumulate executables forever.
@functools.lru_cache(maxsize=64)
def _make_chunked_op(ck, rb, pb, qb, rb_bwd, erf_name, exp_name, interpret,
                     save_t=False):
    """Chunked custom-VJP op over the PACKED operand:
    op(packed_t (B,8,N), dirs_t (B,3,R), counts (B,)) -> colors (B,3,R),
    with N = C*ck chunked on-axis. packed_t rows: ocx ocy ocz sigma
    magnitude alb_r alb_g alb_b.

    save_t: the differentiated forward materializes the 5 per-(p, ray)
    transmittance factors T_k to HBM (O(5*N*R) bytes) and the backward
    skips the O(N²*R) pass-A recompute — the chunked twin of
    pallas_kernel's saved-T schedule. The undifferentiated primal never
    pays the write."""

    @jax.custom_vjp
    def chunked_op(packed_t, dirs_t, counts):
        return _chunked_fwd_call(packed_t, dirs_t, counts, ck=ck, rb=rb,
                                 pb=pb, qb=qb, erf_name=erf_name,
                                 exp_name=exp_name, interpret=interpret)

    if save_t:
        def fwd(packed_t, dirs_t, counts):
            colors, t_saved = _chunked_fwd_t_call(
                packed_t, dirs_t, counts, ck=ck, rb=rb_bwd, pb=pb, qb=qb,
                erf_name=erf_name, exp_name=exp_name, interpret=interpret)
            return colors, (packed_t, dirs_t, counts, t_saved)

        def bwd(res, g):
            packed_t, dirs_t, counts, t_saved = res
            dgrad, ddirs = _chunked_bwd_t_call(
                packed_t, dirs_t, counts, t_saved, g, ck=ck, rb=rb_bwd,
                pb=pb, qb=qb, erf_name=erf_name, exp_name=exp_name,
                interpret=interpret)
            dcounts = np.zeros(counts.shape, jax.dtypes.float0)
            return dgrad, ddirs, dcounts
    else:
        def fwd(packed_t, dirs_t, counts):
            return chunked_op(packed_t, dirs_t, counts), (packed_t, dirs_t,
                                                          counts)

        def bwd(res, g):
            packed_t, dirs_t, counts = res
            dgrad, ddirs = _chunked_bwd_call(
                packed_t, dirs_t, counts, g, ck=ck, rb=rb_bwd, pb=pb, qb=qb,
                erf_name=erf_name, exp_name=exp_name, interpret=interpret)
            dcounts = np.zeros(counts.shape, jax.dtypes.float0)
            return dgrad, ddirs, dcounts

    chunked_op.defvjp(fwd, bwd)
    return chunked_op


# Auto save-T threshold for the chunked kernel: the residual is
# 5*B*N*R_pad floats. Chunked scenes are fitting-scale (multi-second
# steps), so a larger budget than the monolithic SAVE_T_MAX_BYTES pays:
# 4 GB on a 16 GB chip buys skipping ~a full forward's erf work in the
# backward (measured 2.3x -> ~1.4x fwd).
SAVE_T_CHUNKED_MAX_BYTES = 4 << 30


def render_fused_chunked(scene_oc, sigma, mag, albedo, dirs_t, counts=None,
                         *, ck: int = DEFAULT_CHUNK, rb: int = 128,
                         pb: int = 8, qb: int = 32, rb_bwd: int | None = None,
                         erf_name: str = "as5", exp_name: str = "exact",
                         save_t: bool | None = None,
                         interpret: bool | None = None):
    """Chunked fused render — the render_fused of big per-tile capacities:
    oc (B,N,3), sigma/mag (B,N), albedo (B,N,3), dirs_t (B,3,R) → colors
    (B,3,R), with the Gaussian axis streamed through VMEM in C = N/ck
    chunks and all per-Gaussian operands packed Gaussian-minor (B, 8, N)
    to dodge the lane-padding relayout (see module docstring).
    Differentiable (in-kernel analytic VJP incl. ray directions). Use when
    N exceeds pallas_kernel.MAX_BWD_CAPACITY; N must divide into ck-row
    chunks and stay <= MAX_CHUNKED_CAPACITY."""
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
    counts = jnp.minimum(counts.astype(jnp.int32), n)  # see tw_pallas
    if save_t is None:
        r_pad = -(-r // 128) * 128     # trailing dim lane-pads to 128
        save_t = 4 * len(K_TAPS) * b * n * r_pad <= SAVE_T_CHUNKED_MAX_BYTES
    packed_t = jnp.concatenate(
        [scene_oc, sigma[:, :, None], mag[:, :, None], albedo],
        axis=2).transpose(0, 2, 1)                       # (B, 8, N)
    op = _make_chunked_op(ck, rb, pb, qb, rb_bwd, erf_name, exp_name,
                          interpret, save_t)
    return op(packed_t, dirs_t, counts)


def render_tiles_chunked(tiled_scene, o, tile_dirs, counts=None, *,
                         ck: int = DEFAULT_CHUNK, rb: int = 128,
                         pb: int | None = None, qb: int | None = None,
                         rb_bwd: int | None = None, erf_name: str = "as5",
                         exp_name: str = "exact",
                         save_t: bool | None = None,
                         interpret: bool | None = None):
    """Chunked sibling of pallas_kernel.render_tiles_pallas: tiled_scene
    leaves (T2, K, ...) with K > MAX_BWD_CAPACITY allowed (up to
    MAX_CHUNKED_CAPACITY), tile_dirs (T2, P, 3), counts (T2,) → per-tile
    colors (T2, P, 3)."""
    k = tiled_scene.mu.shape[1]
    if pb is None or qb is None:
        dpb, dqb = _block_sizes(min(k, ck))
        pb = dpb if pb is None else pb
        qb = dqb if qb is None else qb
    o = jnp.asarray(o)
    o_b = o[None, None, :] if o.ndim == 1 else o[:, None, :]
    oc = tiled_scene.mu - o_b
    dirs_t = jnp.transpose(tile_dirs, (0, 2, 1))
    colors_t = render_fused_chunked(
        oc, tiled_scene.sigma, tiled_scene.magnitude, tiled_scene.albedo,
        dirs_t, counts, ck=ck, rb=rb, pb=pb, qb=qb, rb_bwd=rb_bwd,
        erf_name=erf_name, exp_name=exp_name, save_t=save_t,
        interpret=interpret)
    return jnp.transpose(colors_t, (0, 2, 1))
