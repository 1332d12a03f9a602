"""Participating-media tests: free-flight law + integration behavior
(constant_medium.hpp:39-77 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_project_tpu.core import rng as rng_mod
from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.models.scene import SceneBuilder
from raytracer_project_tpu.ops import integrator, intersect, volumes


def _fog_scene(density, kind="sphere"):
    b = SceneBuilder()
    if kind == "sphere":
        b.add_fog_sphere((0.0, 0.0, 0.0), 5.0, density, (1.0, 1.0, 1.0))
    else:
        b.add_fog_box((-5.0, -5.0, -5.0), (5.0, 5.0, 5.0), density,
                      (1.0, 1.0, 1.0))
    return b.build(with_bvh=True)


def _keys(key, n):
    return rng_mod.per_lane_keys(key, jnp.arange(n, dtype=jnp.int32))


def test_free_flight_distribution(key):
    """Scatter probability through a slab of length L is 1 - exp(-d*L)."""
    density = 0.2
    scene = _fog_scene(density)
    n = 8192
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 20.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    surface = intersect.intersect(scene, o, d, 1e-3)  # no surfaces: all miss
    t, mat, is_vol = volumes.sample_interaction(
        scene.volumes, o, d, jnp.full((n,), 1e-3), surface, _keys(key, n)
    )
    frac = float(np.asarray(is_vol).mean())
    expected = 1.0 - np.exp(-density * 10.0)  # chord length 10
    assert np.isclose(frac, expected, atol=0.02)
    # Scatter points lie inside the boundary span [15, 25].
    ts = np.asarray(t)[np.asarray(is_vol)]
    assert ts.min() >= 15.0 - 1e-3 and ts.max() <= 25.0 + 1e-3


def test_ray_starting_inside(key):
    """Origin inside the medium: span clamps to [tmin, exit]."""
    density = 5.0  # essentially opaque
    scene = _fog_scene(density)
    n = 512
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    surface = intersect.intersect(scene, o, d, 1e-3)
    t, mat, is_vol = volumes.sample_interaction(
        scene.volumes, o, d, jnp.full((n,), 1e-3), surface, _keys(key, n)
    )
    assert np.asarray(is_vol).mean() > 0.99
    assert np.asarray(t)[np.asarray(is_vol)].max() <= 5.0 + 1e-3


def test_surface_preempts_distant_volume(key):
    """A wall before the fog region: volume cannot scatter past the wall."""
    b = SceneBuilder()
    wall = b.materials.lambertian("w", (0.5, 0.5, 0.5))
    b.geometry.add_box((-10, -10, -1.5), (10, 10, -1.0), wall)
    b.add_fog_sphere((0.0, 0.0, -5.0), 2.0, 50.0, (1, 1, 1))  # behind wall
    scene = b.build()
    n = 256
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    surface = intersect.intersect(scene, o, d, 1e-3)
    t, mat, is_vol = volumes.sample_interaction(
        scene.volumes, o, d, jnp.full((n,), 1e-3), surface, _keys(key, n)
    )
    assert not np.asarray(is_vol).any()
    np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-4)


@pytest.mark.slow
def test_fog_render_darkens_background(key):
    """Dense dark fog attenuates a bright background (integration check)."""
    def render(with_fog):
        b = SceneBuilder()
        if with_fog:
            b.add_fog_sphere((0.0, 0.0, 0.0), 10.0, 0.5, (0.1, 0.1, 0.1))
        scene = b.build()
        cfg = integrator.RenderConfig(width=8, height=8, samples_per_pixel=16,
                                      max_depth=8,
                                      env_mode=env_mod.SOLID_COLOR)
        cam = cam_mod.make_camera(image_width=8, image_height=8, vfov=40.0,
                                  lookfrom=(0, 0, 0), lookat=(0, 0, -1))
        env = env_mod.make_environment(background_color=(1.0, 1.0, 1.0))
        return float(np.asarray(
            integrator.render(scene, cam, env, key, cfg)["beauty"]
        ).mean())

    assert render(True) < render(False) * 0.35


def test_cornell_with_fog_builds(key):
    from raytracer_project_tpu.models import presets

    scene = presets.cornell_box_scene(with_fog=True, fog_density=0.01)
    assert scene.volumes is not None and scene.volumes.count == 1
    cfg = integrator.RenderConfig(width=8, height=8, samples_per_pixel=2,
                                  max_depth=4, env_mode=env_mod.SOLID_COLOR)
    cam = cam_mod.make_camera(image_width=8, image_height=8, vfov=40.0,
                              lookfrom=(278, 278, -800), lookat=(278, 278, 0))
    env = env_mod.make_environment(background_color=(0.0, 0.0, 0.0))
    out = integrator.render(scene, cam, env, key, cfg)
    assert np.isfinite(np.asarray(out["beauty"])).all()