"""End-to-end integrator tests on tiny deterministic renders."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.models.scene import SceneBuilder
from raytracer_project_tpu.ops import integrator


def _camera(cfg, **kw):
    kw.setdefault("lookfrom", (0.0, 0.0, 5.0))
    kw.setdefault("lookat", (0.0, 0.0, 0.0))
    kw.setdefault("vfov", 40.0)
    return cam_mod.make_camera(
        image_width=cfg.width, image_height=cfg.height, **kw
    )


def test_empty_scene_is_background(key):
    scene = SceneBuilder().build(with_bvh=False)
    cfg = integrator.RenderConfig(width=8, height=6, samples_per_pixel=2,
                                  max_depth=4, env_mode=env_mod.SOLID_COLOR)
    env = env_mod.make_environment(background_color=(0.2, 0.4, 0.6), intensity=2.0)
    out = integrator.render(scene, _camera(cfg), env, key, cfg)
    np.testing.assert_allclose(
        out["beauty"], np.broadcast_to([0.4, 0.8, 1.2], (6, 8, 3)), rtol=1e-5
    )
    # Miss pixels carry the normal-pass sentinel (camera.hpp:523).
    np.testing.assert_allclose(
        out["normal"], np.broadcast_to([0.5, 0.5, 1.0], (6, 8, 3)), rtol=1e-5
    )
    np.testing.assert_allclose(out["z_depth"], 0.0, atol=1e-7)


def test_emissive_sphere_fills_view(key):
    b = SceneBuilder()
    light = b.materials.diffuse_light("l", (3.0, 1.5, 0.75))
    b.geometry.add_sphere((0.0, 0.0, 0.0), 2.0, light)
    scene = b.build(with_bvh=False)
    cfg = integrator.RenderConfig(width=6, height=6, samples_per_pixel=2,
                                  max_depth=4, env_mode=env_mod.SOLID_COLOR)
    # Narrow fov so every ray hits the sphere.
    out = integrator.render(
        scene, _camera(cfg, vfov=10.0),
        env_mod.make_environment(background_color=(0.0, 0.0, 0.0)), key, cfg,
    )
    np.testing.assert_allclose(
        out["beauty"], np.broadcast_to([3.0, 1.5, 0.75], (6, 6, 3)), rtol=1e-5
    )
    # Emissive albedo AOV is clamped at 1 (material.hpp:266-275).
    np.testing.assert_allclose(
        out["albedo"], np.broadcast_to([1.0, 1.0, 0.75], (6, 6, 3)), rtol=1e-5
    )


def test_zdepth_and_normal_aov(key):
    b = SceneBuilder()
    m = b.materials.lambertian("m", (0.5, 0.5, 0.5))
    b.geometry.add_sphere((0.0, 0.0, 0.0), 1.0, m)
    scene = b.build(with_bvh=False)
    cfg = integrator.RenderConfig(width=5, height=5, samples_per_pixel=4,
                                  max_depth=2, env_mode=env_mod.SOLID_COLOR,
                                  z_depth_max_dist=10.0)
    out = integrator.render(
        scene, _camera(cfg, vfov=5.0),
        env_mod.make_environment(background_color=(1.0, 1.0, 1.0)), key, cfg,
    )
    # Camera directions are unnormalized with |d| ~ focus_dist = 10
    # (camera.hpp:791), so the 4-world-unit hit has t ~ 0.4 and
    # z = 1 - 0.4/10 = 0.96 — matching the reference's z-depth units.
    assert np.isclose(out["z_depth"][2, 2, 0], 0.96, atol=0.005)
    # Center normal faces the camera: view-space (0.5, 0.5, ~1).
    assert out["normal"][2, 2, 2] > 0.95


def test_shadowing_darkens(key):
    # A ground plane lit by a solid sky; a big blocker above the measurement
    # point must darken it.
    def render_with_blocker(blocker):
        b = SceneBuilder()
        ground = b.materials.lambertian("g", (0.8, 0.8, 0.8))
        b.geometry.add_sphere((0.0, -1000.0, 0.0), 1000.0, ground)
        if blocker:
            dark = b.materials.lambertian("d", (0.0, 0.0, 0.0))
            b.geometry.add_sphere((0.0, 3.0, 0.0), 2.5, dark)
        scene = b.build(with_bvh=False)
        cfg = integrator.RenderConfig(width=4, height=4, samples_per_pixel=32,
                                      max_depth=4, env_mode=env_mod.SOLID_COLOR)
        cam = cam_mod.make_camera(image_width=4, image_height=4, vfov=30.0,
                                  lookfrom=(3.0, 1.0, 0.0), lookat=(0.0, 0.0, 0.0))
        env = env_mod.make_environment(background_color=(1.0, 1.0, 1.0))
        return integrator.render(scene, cam, env, jax.random.PRNGKey(7), cfg)

    lit = float(np.asarray(render_with_blocker(False)["beauty"]).mean())
    shadowed = float(np.asarray(render_with_blocker(True)["beauty"]).mean())
    assert shadowed < lit * 0.8


def test_render_deterministic(key):
    b = SceneBuilder()
    m = b.materials.metal("m", (0.9, 0.8, 0.7), fuzz=0.3)
    b.geometry.add_sphere((0.0, 0.0, 0.0), 1.0, m)
    scene = b.build(with_bvh=False)
    cfg = integrator.RenderConfig(width=6, height=4, samples_per_pixel=4,
                                  max_depth=6, env_mode=env_mod.PHYSICAL_SUN)
    env = env_mod.make_environment()
    a = integrator.render(scene, _camera(cfg), env, key, cfg)
    bout = integrator.render(scene, _camera(cfg), env, key, cfg)
    np.testing.assert_array_equal(np.asarray(a["beauty"]), np.asarray(bout["beauty"]))


def test_reflection_pass(key):
    b = SceneBuilder()
    m = b.materials.metal("m", (1.0, 1.0, 1.0), fuzz=0.0)
    b.geometry.add_sphere((0.0, 0.0, 0.0), 1.0, m)
    scene = b.build(with_bvh=False)
    cfg = integrator.RenderConfig(width=4, height=4, samples_per_pixel=4,
                                  max_depth=4, env_mode=env_mod.SOLID_COLOR,
                                  use_reflection=True, use_refraction=True)
    env = env_mod.make_environment(background_color=(0.5, 0.5, 0.5))
    out = integrator.render(scene, _camera(cfg, vfov=10.0), env, key, cfg)
    # Perfect mirror: reflection pass carries energy, refraction none.
    assert np.asarray(out["reflection"]).mean() > 0.1
    np.testing.assert_allclose(out["refraction"], 0.0, atol=1e-6)


def test_environment_modes(key):
    env = env_mod.make_environment(intensity=1.0)
    d = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    sky = env_mod.background_color(env, d, env_mod.PHYSICAL_SUN)
    assert np.all(np.asarray(sky) >= 0.0)
    # Zenith brighter than below-horizon.
    assert np.asarray(sky)[0].sum() > np.asarray(sky)[2].sum()

    solid = env_mod.background_color(env, d, env_mod.SOLID_COLOR)
    np.testing.assert_allclose(solid[0], np.asarray(env.background_color))

    hdr = env_mod.make_environment(
        hdr_image=np.full((4, 8, 3), 2.5, np.float32), intensity=2.0
    )
    hdr_out = env_mod.background_color(hdr, d, env_mod.HDR_MAP)
    np.testing.assert_allclose(hdr_out, 5.0, rtol=1e-6)
