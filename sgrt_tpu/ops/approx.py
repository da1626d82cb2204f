"""Numerical erf/exp approximations — a first-class feature, as in the
reference (src/vrt/approx.{h,cpp}; thesis verdict at main.tex:1587-1626).

The reference templates its renderer over exp/erf implementations
(f32_func_t typedefs, src/vrt/rt.h:22-23) and ships six approximations:
spline_erf (approx.cpp:9-41), spline_erf_mirror (:45-69), taylor_erf
(:71-88), abramowitz_stegun_erf (:90-110, the production choice), fast_exp
(Schraudolph bit trick, :112-138), spline_exp (:140-189). On TPU the same
role is played by pure-jnp functions that lower both in XLA and inside
Pallas kernels (where `jax.lax.erf` does not lower through Mosaic, so the
fused kernel always uses one of these).

All functions are float32, elementwise, shape-preserving, and valid inside
`pl.pallas_call` bodies. Accuracy contracts are asserted in
tests/test_approx.py (the analog of the reference's accuracy-test,
src/volumetric-ray-tracer/tests/accuracy.cpp:9-58).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_TWO_OVER_SQRT_PI = 1.1283791670955126  # erf'(0) = 2/sqrt(pi)


# ---------------------------------------------------------------------------
# erf
# ---------------------------------------------------------------------------

def erf_exact(x: jnp.ndarray) -> jnp.ndarray:
    """libm-accuracy erf via jax.lax.erf (XLA paths only; does not lower in
    Mosaic/Pallas — use erf_as5 there, which is f32-exact anyway)."""
    return jax.lax.erf(x)


def erf_as5(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 (5-term rational), |err| <= 1.5e-7 —
    below f32 resolution of erf, so this *is* the exact f32 erf.

    The default in-kernel erf. One exp + one reciprocal + degree-5 Horner.
    """
    e, _ = erf_as5_and_gauss(x)
    return e


def erf_as5_and_gauss(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(erf(x), exp(-x^2)) sharing the single exp — the backward pass needs
    both (erf'(x) = 2/sqrt(pi) * exp(-x^2)), so fusing them saves one
    transcendental per element in the gradient kernel."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    g = jnp.exp(-x * x)
    return jnp.sign(x) * (1.0 - poly * g), g


def erf_as3(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.25 (3-term), |err| <= 2.5e-5 — the
    reference's production erf (abramowitz_stegun_erf, approx.cpp:90-110;
    2.47 cycles/value SIMD, thesis main.tex:1804-1818)."""
    e, _ = erf_as3_and_gauss(x)
    return e


def erf_as3_and_gauss(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(erf_as3(x), exp(-x^2)) sharing the single exp (see
    erf_as5_and_gauss) — used by gradient kernels running the production
    3-term A&S erf."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.47047 * a)
    poly = t * (0.3480242 + t * (-0.0958798 + t * 0.7478556))
    g = jnp.exp(-x * x)
    return jnp.sign(x) * (1.0 - poly * g), g


def erf_taylor(x: jnp.ndarray) -> jnp.ndarray:
    """10-term Maclaurin series, input clamped to [-2, 2] (the reference's
    taylor_erf, approx.cpp:71-88). Accurate near 0, ~0.5% off at the clamp."""
    x = jnp.clip(x, -2.0, 2.0)
    x2 = x * x
    # erf(x) = 2/sqrt(pi) * sum_{n=0..9} (-1)^n x^(2n+1) / (n! (2n+1))
    acc = jnp.zeros_like(x)
    coeffs = [
        ((-1.0) ** n) / (float(math.factorial(n)) * (2 * n + 1)) for n in range(10)
    ]
    for c in reversed(coeffs):
        acc = acc * x2 + c
    return _TWO_OVER_SQRT_PI * x * acc


def _fit_segments(f, lo: float, hi: float, n_seg: int, deg: int) -> np.ndarray:
    """Least-squares polynomial per uniform segment → (n_seg, deg+1) coeffs
    (highest power first). Import-time numpy; the analog of the reference's
    Julia-generated spline coefficients (julia/approx_erf.jl:31-67)."""
    edges = np.linspace(lo, hi, n_seg + 1)
    out = np.zeros((n_seg, deg + 1), np.float64)
    for i in range(n_seg):
        xs = np.linspace(edges[i], edges[i + 1], 64)
        out[i] = np.polyfit(xs, f(xs), deg)
    return out


def _np_erf_ref(x: np.ndarray) -> np.ndarray:
    # vectorized math.erf (scipy-free)
    return np.vectorize(math.erf)(x)


_ERF_SEGS = 8
_ERF_HI = 4.0
_ERF_COEF = _fit_segments(_np_erf_ref, 0.0, _ERF_HI, _ERF_SEGS, 3)
# Full-domain fit for the non-mirrored variant: 16 segments over [-4, 4],
# evaluated on raw x (the reference's spline_erf, approx.cpp:9-41, covers
# the whole domain without the odd-symmetry trick — twice the table size
# and branch count of the mirror variant, approx.cpp:45-69).
_ERF_FULL_COEF = _fit_segments(_np_erf_ref, -_ERF_HI, _ERF_HI, 2 * _ERF_SEGS, 3)
_EXP_SEGS = 16
_EXP_LO = -16.0
_EXP_COEF = _fit_segments(np.exp, _EXP_LO, 0.0, _EXP_SEGS, 3)


def _eval_segments(x, coef: np.ndarray, lo: float, hi: float):
    """Piecewise-cubic evaluation with a where-chain (no gathers — TPU/VPU
    friendly, lowers in Mosaic). coef: (n_seg, 4) highest power first."""
    n_seg = coef.shape[0]
    width = (hi - lo) / n_seg
    xc = jnp.clip(x, lo, hi)
    result = jnp.zeros_like(x)
    for i in range(n_seg):
        c3, c2, c1, c0 = (float(c) for c in coef[i])
        val = ((c3 * xc + c2) * xc + c1) * xc + c0
        in_seg = (xc >= lo + i * width) & (xc <= lo + (i + 1) * width + (1e-6 if i == n_seg - 1 else 0.0))
        result = jnp.where(in_seg, val, result)
    return result


def erf_spline_mirror(x: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-cubic erf on [0,4] mirrored by odd symmetry, saturating to
    ±1 beyond (the reference's spline_erf_mirror, approx.cpp:45-69, with
    machine-fitted coefficients like julia/approx_erf.jl)."""
    a = jnp.abs(x)
    val = jnp.where(a >= _ERF_HI, 1.0, _eval_segments(a, _ERF_COEF, 0.0, _ERF_HI))
    return jnp.sign(x) * val


def erf_spline(x: jnp.ndarray) -> jnp.ndarray:
    """Non-mirrored spline variant (reference spline_erf, approx.cpp:9-41):
    a direct piecewise-cubic fit over the full [-4, 4] domain evaluated on
    raw x — no abs/sign mirroring, 2x the segment count (and cost) of
    erf_spline_mirror, saturating to ±1 outside the domain. Distinct
    cost/accuracy point, as in the reference (thesis main.tex:1804-1818:
    spline 4.20 vs spline-mirror 3.37 cycles/value)."""
    val = _eval_segments(x, _ERF_FULL_COEF, -_ERF_HI, _ERF_HI)
    return jnp.where(x <= -_ERF_HI, -1.0, jnp.where(x >= _ERF_HI, 1.0, val))


# ---------------------------------------------------------------------------
# exp
# ---------------------------------------------------------------------------

def exp_exact(x: jnp.ndarray) -> jnp.ndarray:
    """jnp.exp — native on the TPU VPU (the analog of the reference's SVML /
    VCL production exp, approx.h:91-106)."""
    return jnp.exp(x)


def exp_fast(x: jnp.ndarray) -> jnp.ndarray:
    """Schraudolph bit-trick exp (reference fast_exp, approx.cpp:112-138;
    2.29 cycles/value, thesis main.tex:1820-1834): write A*x + B into the
    f32 exponent field via an int32 bitcast. RMS-optimal bias constant;
    max relative error ~3%. Valid for x in (-87, 88); clamped."""
    x = jnp.clip(x, -87.0, 88.0)
    i = (12102203.0 * x + 1064866805.0).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def exp_spline(x: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-cubic exp on [-16, 0], 0 below, exact above 0 is out of the
    renderer's domain (density exponents are <= 0) — reference spline_exp
    (approx.cpp:140-189) has the same domain."""
    below = x < _EXP_LO
    val = _eval_segments(x, _EXP_COEF, _EXP_LO, 0.0)
    return jnp.where(below, 0.0, jnp.where(x > 0.0, jnp.exp(x), val))


# ---------------------------------------------------------------------------
# registries (the analog of the reference's f32_func_t template parameters,
# rt.h:22-23, and the simd::erf/simd::exp defaults, approx.h:110-127)
# ---------------------------------------------------------------------------

ERF_IMPLS = {
    "exact": erf_exact,
    "as5": erf_as5,
    "as3": erf_as3,
    "taylor": erf_taylor,
    "spline": erf_spline,
    "spline_mirror": erf_spline_mirror,
}

EXP_IMPLS = {
    "exact": exp_exact,
    "fast": exp_fast,
    "spline": exp_spline,
}

# (erf, exp(-x^2)) fused pairs for gradient kernels.
ERF_AND_GAUSS_IMPLS = {
    "as5": erf_as5_and_gauss,
    "as3": erf_as3_and_gauss,
    "exact": lambda x: (jax.lax.erf(x), jnp.exp(-x * x)),
}

DEFAULT_KERNEL_ERF = "as5"  # f32-exact and Mosaic-lowerable
