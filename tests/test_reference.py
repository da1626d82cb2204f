"""Oracle verification — analog of the reference's transmittance-test
(tests/transmittance.cpp:7-38): closed-form erf transmittance vs numerical
Riemann integration, plus identities the fused paths rely on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgrt_tpu.models.gaussians import GaussianScene, grid_scene, make_scene, pad_scene
from sgrt_tpu.ops import reference as ref


@pytest.fixture
def three_gaussians():
    # Three Gaussians near the +z axis, ray marches through all of them.
    return make_scene(
        mu=[[0.0, 0.0, 1.0], [0.15, -0.1, 2.0], [-0.2, 0.05, 3.0]],
        sigma=[0.3, 0.25, 0.4],
        magnitude=[1.0, 2.0, 0.7],
        albedo=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
    )


O = jnp.array([0.0, 0.0, 0.0])
N = jnp.array([0.0, 0.0, 1.0])


def test_transmittance_matches_numerical_integration(three_gaussians):
    # Closed form integrates the exact Gaussian line integral; the Riemann
    # sum over [0, s] converges to it for scenes supported in front of o.
    for s in [0.5, 1.0, 2.0, 4.0, 6.0]:
        t_closed = ref.transmittance(O, N, s, three_gaussians)
        t_step = ref.transmittance_step(O, N, s, 1e-3, three_gaussians)
        np.testing.assert_allclose(t_closed, t_step, rtol=2e-2, atol=2e-3)


def test_transmittance_monotone_decreasing(three_gaussians):
    ss = jnp.linspace(0.0, 8.0, 64)
    ts = jax.vmap(lambda s: ref.transmittance(O, N, s, three_gaussians))(ss)
    assert float(ts[0]) <= 1.0 + 1e-6
    assert np.all(np.diff(np.asarray(ts)) <= 1e-6)


def test_density_is_sum_of_pdfs(three_gaussians):
    pt = jnp.array([0.1, 0.2, 1.5])
    d = ref.density(pt, three_gaussians)
    manual = sum(
        float(three_gaussians.magnitude[i])
        * np.exp(
            -np.sum((np.asarray(pt) - np.asarray(three_gaussians.mu[i])) ** 2)
            / (2 * float(three_gaussians.sigma[i]) ** 2)
        )
        for i in range(3)
    )
    np.testing.assert_allclose(d, manual, rtol=1e-6)


def test_pdf_collapses_at_sample_points(three_gaussians):
    """pdf_p(o + s_pk n) == cbar_p * exp(-k^2/2) — the identity that lets the
    fused renderer drop the pdf exp (see ops/render.py docstring)."""
    scene = three_gaussians
    oc = scene.mu - O[None, :]
    mu_bar = oc @ N
    oc_sq = jnp.sum(oc * oc, axis=-1)
    cbar = scene.magnitude * jnp.exp(-(oc_sq - mu_bar**2) / (2 * scene.sigma**2))
    for p in range(3):
        for k in range(-4, 1):
            s = mu_bar[p] + k * scene.sigma[p]
            x = O + s * N
            pdf = scene.magnitude[p] * jnp.exp(
                -jnp.sum((x - scene.mu[p]) ** 2) / (2 * scene.sigma[p] ** 2)
            )
            np.testing.assert_allclose(
                pdf, cbar[p] * np.exp(-(k**2) / 2.0), rtol=1e-5
            )


def test_radiance_padding_invariant(three_gaussians):
    """sigma=1/magnitude=0 padding must not change any result (the masking
    contract inherited from the reference SoA padding, types.cpp:53-63)."""
    c0 = ref.radiance(O, N, three_gaussians)
    c1 = ref.radiance(O, N, pad_scene(three_gaussians, 8))
    np.testing.assert_allclose(c0, c1, rtol=1e-6, atol=1e-7)


def test_grid_scene_matches_reference_construction():
    s = grid_scene(4)
    assert s.n == 16
    # main.cpp:196-205: mu = (-1 + 1/dim + i/(dim/2), ..., 1), sigma=1/(2 dim)
    np.testing.assert_allclose(np.asarray(s.mu[0]), [-0.75, -0.75, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.mu[-1]), [0.75, 0.75, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.sigma), 0.125)
    t = 5 / 16.0  # element i=1, j=1
    np.testing.assert_allclose(np.asarray(s.albedo[5]), [1 - t, 0.0, t], atol=1e-6)


def test_radiance_gradients_finite(three_gaussians):
    """jax.grad through the oracle (the NEW capability vs the fwd-only
    reference) produces finite, nonzero gradients."""

    def loss(scene):
        c = ref.radiance(O, N, scene)
        return jnp.sum(c**2)

    g = jax.grad(loss)(three_gaussians)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(jnp.sum(jnp.abs(g.mu))) > 0.0
