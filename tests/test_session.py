"""Session tests: progressive accumulation, cancel, checkpoint/resume,
display/export, denoise."""

import os

import jax
import numpy as np
import pytest

from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.models.scene import SceneBuilder
from raytracer_project_tpu.ops import denoise, integrator, post
from raytracer_project_tpu.utils import applog, session


def _session(tmp=None, spp_chunk=2):
    b = SceneBuilder()
    m = b.materials.lambertian("m", (0.6, 0.3, 0.2))
    light = b.materials.diffuse_light("l", (5.0, 5.0, 5.0))
    b.geometry.add_sphere((0.0, -1000.0, 0.0), 1000.0, m)
    b.geometry.add_sphere((0.0, 1.0, 0.0), 1.0, light)
    scene = b.build()
    cfg = integrator.RenderConfig(width=12, height=8, samples_per_pixel=8,
                                  max_depth=4, env_mode=env_mod.SOLID_COLOR)
    cam = cam_mod.make_camera(image_width=cfg.width, image_height=cfg.height,
                              lookfrom=(0, 2, 6), lookat=(0, 1, 0), vfov=35.0)
    env = env_mod.make_environment(background_color=(0.6, 0.7, 0.9))
    return session.RenderSession(scene, cam, env, cfg,
                                 key=jax.random.PRNGKey(9),
                                 chunk_samples=spp_chunk)


def test_progressive_matches_one_shot():
    s1 = _session()
    s1.render_progressive(8)
    assert s1.samples_done == 8

    s2 = _session(spp_chunk=8)
    s2.step(8)
    np.testing.assert_allclose(
        np.asarray(s1.buffers()["beauty"]),
        np.asarray(s2.buffers()["beauty"]), rtol=1e-6, atol=1e-7,
    )


def test_cancellation_preserves_partial():
    s = _session()

    def cancel_after_first(sess):
        sess.cancel()

    s.render_progressive(8, callback=cancel_after_first)
    assert s.samples_done == 2  # one chunk
    assert np.asarray(s.buffers()["beauty"]).mean() > 0.0


def test_progress_and_eta():
    s = _session()
    assert s.progress(8) == 0.0
    s.step(2)
    assert s.progress(8) == 0.25
    assert s.eta_seconds(8) < float("inf")


def test_checkpoint_resume(tmp_path):
    s = _session()
    s.render_progressive(4)
    ckpt = str(tmp_path / "ck.npz")
    s.checkpoint(ckpt)

    s2 = _session()
    s2.restore(ckpt)
    assert s2.samples_done == 4
    s.render_progressive(8)
    s2.render_progressive(8)
    np.testing.assert_allclose(
        np.asarray(s.buffers()["beauty"]),
        np.asarray(s2.buffers()["beauty"]), rtol=1e-6, atol=1e-7,
    )


def test_checkpoint_config_mismatch(tmp_path):
    s = _session()
    s.step(2)
    ckpt = str(tmp_path / "ck.npz")
    s.checkpoint(ckpt)
    s2 = _session()
    s2.config = __import__("dataclasses").replace(s2.config, max_depth=6)
    with pytest.raises(ValueError):
        s2.restore(ckpt)


def test_display_and_export(tmp_path):
    s = _session()
    s.render_progressive(4)
    frame = s.display(post.PASS_RGB)
    assert frame.shape == (8, 12, 3) and frame.dtype == np.uint8
    paths = s.save_all_passes(str(tmp_path / "out"))
    assert len(paths) == 6
    for p in paths:
        assert os.path.exists(p)


def test_denoise_display():
    s = _session()
    s.render_progressive(4)
    frame = s.display(post.PASS_DENOISE)
    assert frame.shape == (8, 12, 3)


def test_atrous_reduces_noise(key):
    rng = np.random.default_rng(3)
    clean = np.tile(np.linspace(0.2, 0.8, 32)[None, :, None], (32, 1, 3))
    noisy = clean + rng.normal(0, 0.2, clean.shape)
    albedo = np.ones_like(clean) * 0.5
    normal = np.ones_like(clean) * 0.5
    out = np.asarray(denoise.atrous_denoise(
        __import__("jax.numpy", fromlist=["asarray"]).asarray(noisy, "float32"),
        albedo.astype("float32"), normal.astype("float32")))
    err_noisy = np.abs(noisy - clean).mean()
    err_out = np.abs(out - clean).mean()
    assert err_out < err_noisy * 0.6


def test_applog():
    log = applog.AppLog(capacity=3)
    log.error("boom %d", 1)
    log.render("go")
    assert applog.AppLog.severity_of(log.entries[0]) == "Error"
    log.system("a")
    log.debug("b")
    assert len(log.entries) == 3  # ring wrapped
    assert applog.rays_per_second(100, 100, 10, 8, 2.0) == 100 * 100 * 10 * 4