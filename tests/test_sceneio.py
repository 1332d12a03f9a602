"""JSON scene format + CLI coverage."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.models import sceneio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_demo_scene_loads_and_renders(key):
    scene, cam, env, config = sceneio.load_scene_file(
        os.path.join(REPO, "examples", "scene_demo.json"), with_bvh=False
    )
    assert scene.spheres.count >= 4
    assert scene.boxes.count == 1  # one cube -> one native box primitive
    assert config.env_mode == env_mod.PHYSICAL_SUN
    # Astronomical block resolved into a concrete sun direction.
    assert float(np.linalg.norm(np.asarray(env.sun_direction))) > 0.5

    import dataclasses

    from raytracer_project_tpu.ops import integrator

    small = dataclasses.replace(config, width=32, height=18,
                                samples_per_pixel=2, max_depth=3)
    from raytracer_project_tpu.models.camera import make_camera

    cam = make_camera(image_width=32, image_height=18, vfov=30.0,
                      lookfrom=(8.0, 2.2, 7.0), lookat=(0.0, 1.0, 0.0))
    out = integrator.render(scene, cam, env, key, small)
    img = np.asarray(out["beauty"])
    assert img.shape == (18, 32, 3)
    assert np.isfinite(img).all() and img.max() > 0.01


def test_transform_chain(tmp_path, key):
    doc = {
        "materials": {"m": {"type": "lambertian", "albedo": [1, 0, 0]}},
        "objects": [
            {"type": "sphere", "center": [0, 0, 0], "radius": 1.0,
             "material": "m",
             "transform": [{"scale": 2.0}, {"translate": [5, 0, 0]}]},
        ],
        "render": {"width": 8, "height": 8, "samples_per_pixel": 1},
    }
    p = tmp_path / "s.json"
    p.write_text(json.dumps(doc))
    scene, cam, env, config = sceneio.load_scene_file(str(p), with_bvh=False)
    c = np.asarray(scene.spheres.center)
    r = np.asarray(scene.spheres.radius)
    live = r > 0
    np.testing.assert_allclose(c[live][0], [5, 0, 0], atol=1e-5)
    np.testing.assert_allclose(r[live][0], 2.0, atol=1e-5)


def test_unknown_types_raise(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"objects": [{"type": "torus"}]}))
    with pytest.raises(ValueError, match="unknown object type"):
        sceneio.load_scene_file(str(p))


@pytest.mark.slow
def test_cli_render_smoke(tmp_path):
    """End-to-end: CLI renders the demo scene at tiny settings to PNGs."""
    out = tmp_path / "out"
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=os.environ.get("XLA_FLAGS", ""))
    res = subprocess.run(
        [sys.executable, "-m", "raytracer_project_tpu", "render",
         "--scene-file", os.path.join(REPO, "examples", "scene_demo.json"),
         "--width", "48", "--height", "27", "--spp", "2", "--max-depth", "3",
         "--passes", "rgb,normals", "--out", str(out), "--quiet",
         "--checkpoint", str(tmp_path / "ck.npz")],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert (out / "render_rgb.png").exists()
    assert (out / "render_normals.png").exists()
    assert (tmp_path / "ck.npz").exists()
