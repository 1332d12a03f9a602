"""RNG sampler law and determinism tests."""

import jax
import numpy as np

from raytracer_project_tpu.core import rng


def test_unit_vector_law(key):
    v = np.asarray(rng.unit_vector(key, (4096,)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # Mean near zero (uniform over the sphere).
    assert np.all(np.abs(v.mean(axis=0)) < 0.05)
    # Hemispheres balanced.
    np.testing.assert_allclose((v[:, 1] > 0).mean(), 0.5, atol=0.05)


def test_in_unit_disk(key):
    p = np.asarray(rng.in_unit_disk(key, (4096,)))
    r = np.linalg.norm(p[:, :2], axis=-1)
    assert np.all(p[:, 2] == 0.0)
    assert np.all(r <= 1.0 + 1e-6)
    # Uniform area => mean radius = 2/3.
    assert np.isclose(r.mean(), 2.0 / 3.0, atol=0.02)


def test_square_jitter(key):
    j = np.asarray(rng.square_jitter(key, (1024,)))
    assert j.shape == (1024, 2)
    assert np.all(j >= -0.5) and np.all(j <= 0.5)


def test_determinism(key):
    a = np.asarray(rng.unit_vector(key, (16,)))
    b = np.asarray(rng.unit_vector(key, (16,)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(rng.unit_vector(jax.random.fold_in(key, 1), (16,)))
    assert not np.allclose(a, c)
