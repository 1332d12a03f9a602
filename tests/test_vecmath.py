"""Unit tests for core vector math — golden values from the formulas in
/root/reference/vec3.hpp and common.hpp."""

import jax.numpy as jnp
import numpy as np

from raytracer_project_tpu.core import colorspace, vecmath


def test_dot_cross():
    u = jnp.asarray([[1.0, 2.0, 3.0]])
    v = jnp.asarray([[4.0, 5.0, 6.0]])
    assert np.isclose(vecmath.dot(u, v)[0], 32.0)
    np.testing.assert_allclose(vecmath.cross(u, v)[0], [-3.0, 6.0, -3.0])


def test_normalize_guard():
    v = jnp.asarray([[0.0, 0.0, 0.0], [3.0, 0.0, 4.0]])
    out = vecmath.normalize(v)
    np.testing.assert_allclose(out[0], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(out[1], [0.6, 0.0, 0.8], rtol=1e-6)


def test_reflect():
    # 45-degree incidence on a floor: (1,-1,0) -> (1,1,0).
    v = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(vecmath.reflect(v, n)[0], [1.0, 1.0, 0.0], atol=1e-6)


def test_refract_normal_incidence():
    # Straight-on rays pass through unchanged regardless of IOR.
    uv = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = vecmath.refract(uv, n, jnp.asarray([0.75]))
    np.testing.assert_allclose(out[0], [0.0, -1.0, 0.0], atol=1e-6)


def test_refract_snell():
    # 45-degree incidence air->glass (eta = 1/1.5): sin(theta_t) = sin(45)/1.5.
    s = np.sqrt(0.5)
    uv = jnp.asarray([[s, -s, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(vecmath.refract(uv, n, jnp.asarray([1.0 / 1.5])))[0]
    sin_t = out[0] / np.linalg.norm(out)
    assert np.isclose(sin_t, s / 1.5, atol=1e-6)


def test_luminance_rec709():
    assert np.isclose(vecmath.luminance(jnp.asarray([1.0, 1.0, 1.0])), 1.0, atol=1e-6)
    assert np.isclose(vecmath.luminance(jnp.asarray([1.0, 0.0, 0.0])), 0.2126)


def test_smoothstep():
    assert vecmath.smoothstep(0.0, 1.0, -1.0) == 0.0
    assert vecmath.smoothstep(0.0, 1.0, 2.0) == 1.0
    assert np.isclose(vecmath.smoothstep(0.0, 1.0, 0.5), 0.5)


def test_direction_from_spherical():
    # Zenith: elevation 90 -> +Y.
    np.testing.assert_allclose(
        vecmath.direction_from_spherical(90.0, 0.0), [0.0, 1.0, 0.0], atol=1e-6
    )
    # Horizon, azimuth 0 -> +X.
    np.testing.assert_allclose(
        vecmath.direction_from_spherical(0.0, 0.0), [1.0, 0.0, 0.0], atol=1e-6
    )


def test_aces_golden():
    # Fixed points of the Narkowicz fit (common.hpp:48-67).
    x = jnp.asarray([0.0, 1.0])
    out = colorspace.apply_aces(x)
    assert np.isclose(out[0], 0.0)
    assert np.isclose(out[1], (2.51 + 0.03) / (2.43 + 0.59 + 0.14), rtol=1e-5)


def test_aces_nan_killer():
    out = colorspace.apply_aces(jnp.asarray([jnp.nan, jnp.inf, -1.0]))
    np.testing.assert_allclose(out, [0.0, 0.0, 0.0])


def test_gamma():
    x = jnp.asarray([0.0, 1.0, 0.5])
    g = colorspace.linear_to_gamma(x)
    assert np.isclose(g[0], 0.0)
    assert np.isclose(g[1], 1.0)
    assert np.isclose(g[2], 0.5 ** (1 / 2.2), rtol=1e-5)
    # Round trip.
    np.testing.assert_allclose(colorspace.gamma_to_linear(g), x, atol=1e-5)
