"""BVH wireframe visualizer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.models.scene import SceneBuilder
from raytracer_project_tpu.ops import debugviz, integrator


def _scene():
    b = SceneBuilder()
    m = b.materials.lambertian("m", (0.5, 0.5, 0.5))
    for x in (-2.0, 0.0, 2.0):
        b.geometry.add_sphere((x, 0.0, 0.0), 0.8, m)
    return b.build(with_bvh=True)


def test_wireframe_renders_edges_and_interior(key):
    scene = _scene()
    cfg = integrator.RenderConfig(width=64, height=40, samples_per_pixel=1,
                                  max_depth=2, env_mode=env_mod.SOLID_COLOR)
    cam = cam_mod.make_camera(image_width=cfg.width, image_height=cfg.height,
                              lookfrom=(0, 2.0, 8.0), lookat=(0, 0, 0),
                              vfov=45.0)
    img = np.asarray(debugviz.render_bvh_debug(scene, cam, key, cfg,
                                               level=-1, thickness=2.0))
    assert img.shape == (40, 64, 3)
    assert np.isfinite(img).all()
    # Neon edges present (brightness 4 scale => values > 1).
    assert img.max() > 1.0
    # Dark geometry interiors present.
    vals = img.reshape(-1, 3)
    assert ((vals > 0.005) & (vals < 0.05)).any()
    # Background black.
    assert (img[0, 0] == 0.0).all()


def test_level_selector(key):
    scene = _scene()
    cfg = integrator.RenderConfig(width=32, height=20, samples_per_pixel=1,
                                  max_depth=2, env_mode=env_mod.SOLID_COLOR)
    cam = cam_mod.make_camera(image_width=cfg.width, image_height=cfg.height,
                              lookfrom=(0, 2.0, 8.0), lookat=(0, 0, 0),
                              vfov=45.0)
    img0 = np.asarray(debugviz.render_bvh_debug(scene, cam, key, cfg,
                                                level=0, thickness=2.0))
    # Level 0 = root box: edge color has g = 0 -> pure (0.4, 0, 1)*4 edges.
    edges = img0[img0[..., 0] > 1.0]
    if edges.size:
        np.testing.assert_allclose(edges[:, 1], 0.0, atol=1e-6)

def test_composite_wireframe_into_beauty(key):
    """Wireframe composited INTO the live render (bvh.hpp:56-109):
    wire-crossing pixels take the emissive edge color when the edge is in
    front of the surface; everything else keeps the path-traced beauty;
    wires behind geometry are occluded."""
    scene = _scene()
    cfg = integrator.RenderConfig(width=64, height=40, samples_per_pixel=2,
                                  max_depth=3, env_mode=env_mod.SOLID_COLOR)
    cam = cam_mod.make_camera(image_width=cfg.width, image_height=cfg.height,
                              lookfrom=(0, 2.0, 8.0), lookat=(0, 0, 0),
                              vfov=45.0)
    env = env_mod.make_environment(background_color=(0.4, 0.5, 0.7))
    beauty = integrator.render(scene, cam, env, key, cfg)["beauty"]
    comp = np.asarray(debugviz.composite_wireframe(scene, cam, beauty,
                                                   level=-1, thickness=2.0))
    beauty = np.asarray(beauty)
    assert comp.shape == beauty.shape
    wire_px = (comp != beauty).any(-1)
    assert wire_px.any()                      # overlay present
    assert not wire_px.all()                  # beauty survives elsewhere
    # Wire pixels carry the emissive neon palette (x4 scale -> bright).
    assert comp[wire_px].max() > 1.0
    np.testing.assert_array_equal(comp[~wire_px], beauty[~wire_px])
    # Occlusion: rays that hit a surface BEFORE any box edge keep beauty.
    # (t-competition is the composite's defining property; assert at
    # least some geometry pixels are NOT overdrawn even with thick wires)
    from raytracer_project_tpu.ops import intersect as isect
    assert (~wire_px).sum() > wire_px.sum() * 0.1


def test_session_display_wire(key):
    from raytracer_project_tpu.utils.session import RenderSession

    scene = _scene()
    cfg = integrator.RenderConfig(width=48, height=27, samples_per_pixel=2,
                                  max_depth=3, env_mode=env_mod.SOLID_COLOR,
                                  wavefront=True)
    cam = cam_mod.make_camera(image_width=cfg.width, image_height=cfg.height,
                              lookfrom=(0, 2.0, 8.0), lookat=(0, 0, 0),
                              vfov=45.0)
    env = env_mod.make_environment(background_color=(0.4, 0.5, 0.7))
    sess = RenderSession(scene, cam, env, cfg, key=key, chunk_samples=2)
    sess.step()
    plain = sess.display()
    wired = sess.display_wire(level=-1, thickness=2.0)
    assert wired.shape == plain.shape and wired.dtype == np.uint8
    assert (wired != plain).any()
