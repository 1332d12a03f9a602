"""Interactive adjust-while-rendering loop (utils/interactive.py).

Exercises the reference's dirty-flag trichotomy end-to-end
(main.cpp:274-275, 1484-1534; environment.hpp:17):
  redo-post   -> accumulator preserved, post chain re-run
  restart     -> world rebuilt, accumulator zeroed
  sync-ui     -> engine-derived env state surfaced
plus scene-file watching and the stdin-driven run loop.
"""

import io
import json
import os

import jax
import numpy as np
import pytest

from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.models.scene import SceneBuilder
from raytracer_project_tpu.ops import integrator
from raytracer_project_tpu.utils.interactive import InteractiveLoop

pytestmark = pytest.mark.slow


def _tiny_scene():
    b = SceneBuilder()
    red = b.materials.lambertian("red", (0.7, 0.2, 0.1))
    lamp = b.materials.diffuse_light("lamp", (4.0, 3.0, 2.0))
    b.geometry.add_sphere((0.0, -100.5, 0.0), 100.0, red)
    b.geometry.add_sphere((0.0, 0.5, 0.0), 0.5, red)
    b.geometry.add_sphere((0.0, 2.0, 0.0), 0.5, lamp)
    return b.build(with_bvh=False)


def _loop(**kw):
    cfg = integrator.RenderConfig(
        width=32, height=18, samples_per_pixel=8, max_depth=4,
        env_mode=env_mod.PHYSICAL_SUN, wavefront=True)
    return InteractiveLoop(
        _tiny_scene(), env_mod.make_environment(), cfg,
        dict(vfov=40.0, lookfrom=(0.0, 1.0, 4.0), lookat=(0.0, 0.5, 0.0)),
        key=jax.random.PRNGKey(0), chunk_samples=2, **kw)


def test_post_edit_is_post_only():
    loop = _loop()
    loop.tick()
    loop.tick()
    done_before = loop.session.samples_done
    assert done_before == 4
    before = loop.session.display()
    resp = loop.handle_command("set post.exposure 2.0")
    assert "post-only" in resp
    notes = loop.tick()  # applies needs_update, renders one more chunk
    assert any("post chain updated" in n for n in notes)
    # Accumulator was NOT reset: progress continued from where it was.
    assert loop.session.samples_done == done_before + 2
    after = loop.session.display()
    assert not np.array_equal(before, after)  # brighter image


def test_camera_edit_restarts():
    loop = _loop()
    loop.tick()
    assert loop.session.samples_done == 2
    old_du = np.asarray(loop.session.camera.pixel_delta_u)
    resp = loop.handle_command("set camera.vfov 20")
    assert "restart" in resp
    notes = loop.tick()
    assert any("restart" in n for n in notes)
    # Accumulator zeroed, then exactly one fresh chunk accumulated.
    assert loop.session.samples_done == 2
    assert loop.camera_params["vfov"] == 20.0
    # The session really runs the new camera (narrower field of view).
    new_du = np.asarray(loop.session.camera.pixel_delta_u)
    assert np.linalg.norm(new_du) < np.linalg.norm(old_du)


def test_env_and_config_edits_restart():
    loop = _loop()
    loop.tick()
    loop.handle_command("set env.sun_intensity 2.5")
    loop.tick()
    assert float(loop.env.sun_intensity) == 2.5
    assert loop.session.samples_done == 2
    loop.handle_command("set config.samples_per_pixel 4")
    loop.tick()
    assert loop.target_spp == 4
    # Render-to-target stops at the new spp.
    for _ in range(6):
        loop.tick()
    assert loop.session.samples_done == 4


def test_astronomical_sun_syncs_ui():
    loop = _loop()
    resp = loop.handle_command("sun 45 172 12")  # noon, midsummer, 45N
    assert "astronomical" in resp
    notes = loop.tick()
    assert any("sun synced" in n for n in notes)
    d = np.asarray(loop.env.sun_direction)
    assert d[1] > 0.8  # high noon sun
    # Derived auto color applied (main.cpp:855-871).
    assert float(loop.env.sun_color[0]) == pytest.approx(1.0, abs=1e-3)


def test_pass_switch_save_and_stats(tmp_path):
    import dataclasses

    loop = _loop()
    loop.config = dataclasses.replace(loop.config, use_albedo=True,
                                      use_normal=True)
    loop.should_restart = True
    loop.tick()
    assert "albedo" in loop.handle_command("pass albedo")
    out = str(tmp_path / "albedo.png")
    assert out in loop.handle_command(f"save albedo {out}")
    assert os.path.exists(out)
    stats = loop.handle_command("stats")
    assert "spp" in stats
    shown = loop.handle_command("show all")
    assert "camera:" in shown and "env:" in shown and "post:" in shown


def test_scene_file_watch_triggers_restart(tmp_path):
    doc = {
        "render": {"width": 32, "height": 18, "samples_per_pixel": 8,
                   "max_depth": 4},
        "environment": {"mode": "sun"},
        "camera": {"vfov": 40.0, "lookfrom": [0.0, 1.0, 4.0],
                   "lookat": [0.0, 0.5, 0.0]},
        "materials": {
            "red": {"type": "lambertian", "albedo": [0.7, 0.2, 0.1]},
        },
        "objects": [
            {"type": "sphere", "center": [0.0, -100.5, 0.0],
             "radius": 100.0, "material": "red"},
            {"type": "sphere", "center": [0.0, 0.5, 0.0], "radius": 0.5,
             "material": "red"},
        ],
    }
    path = tmp_path / "scene.json"
    path.write_text(json.dumps(doc))
    loop = _loop(scene_file=str(path))
    loop.tick()
    assert loop.session.samples_done == 2
    doc["objects"].append({"type": "sphere", "center": [1.5, 0.5, 0.0],
                           "radius": 0.5, "material": "red"})
    path.write_text(json.dumps(doc))
    os.utime(path, (0, 2_000_000_000))  # force a new mtime
    notes = loop.tick()
    assert any("restart" in n for n in notes)
    # The reloaded world is the edited file (2 + 1 spheres), not the
    # construction-time scene.
    assert loop.scene.spheres.count == 3
    assert np.allclose(np.asarray(loop.scene.spheres.center)[-1],
                       [1.5, 0.5, 0.0])
    assert loop.session.samples_done == 2  # fresh accumulator + 1 chunk


def test_run_loop_with_scripted_stdin(tmp_path):
    cmds = io.StringIO("set post.exposure 1.5\nquit\n")
    out = io.StringIO()
    loop = _loop(watch_png=str(tmp_path / "preview.png"))
    loop.run(stdin=cmds, max_ticks=20, out=out)
    text = out.getvalue()
    assert "post-only" in text or "post chain updated" in text
    assert os.path.exists(tmp_path / "preview.png")


def test_error_handling():
    loop = _loop()
    assert "error" in loop.handle_command("set post.bogus 1")
    assert "error" in loop.handle_command("flibber")
    assert "commands" in loop.handle_command("help")
