"""Denoiser quality evidence: PSNR/SSIM of à-trous-denoised low-spp
renders against high-spp references on two scenes.

This is the quantitative counterpart of the reference's OIDN claim that
denoising cuts required samples 10-50x (/root/reference/README.md:556-561,
camera.hpp:581-699): we measure the PSNR of a denoised LOW_SPP render and
of raw renders at increasing spp against a HIGH_SPP reference, and assert
the denoised image matches or beats a raw render with EQUIV_FACTOR x more
samples. Run with `-s` to see the dB numbers (also recorded in README.md).
"""

import numpy as np
import jax
import pytest

from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import denoise as denoise_mod
from raytracer_project_tpu.ops import integrator
from raytracer_project_tpu.utils import metrics

pytestmark = pytest.mark.slow

W, H = 96, 54
LOW_SPP = 8
EQUIV_SPP = 32          # the raw-spp render the denoised LOW_SPP must beat
HIGH_SPP = 384          # reference
EQUIV_FACTOR = EQUIV_SPP // LOW_SPP


def _render(scene, cam, env, mode, spp, key):
    cfg = integrator.RenderConfig(
        width=W, height=H, samples_per_pixel=spp, max_depth=8, env_mode=mode,
        use_albedo=True, use_normal=True, use_z_depth=False, wavefront=True)
    out = jax.jit(integrator.render, static_argnames="config")(
        scene, cam, env, key, cfg)
    img = lambda name: np.asarray(out[name]).reshape(H, W, 3)
    return img("beauty"), img("albedo"), img("normal")


SCENES = {
    "shirley": (
        lambda: presets.shirley_final_scene(grid=5, with_bvh=False),
        cam_mod.make_camera(image_width=W, image_height=H, vfov=20,
                            lookfrom=(13, 2, 3), lookat=(0, 0, 0),
                            defocus_angle=0.0, focus_dist=10.0),
        env_mod.make_environment(sun_direction=(0.4, 0.6, 0.2),
                                 sun_intensity=5.0),
        env_mod.PHYSICAL_SUN,
    ),
    "cornell": (
        lambda: presets.cornell_box_scene(with_bvh=False),
        cam_mod.make_camera(image_width=W, image_height=H, vfov=40,
                            lookfrom=(278, 278, -800),
                            lookat=(278, 278, 0)),
        env_mod.make_environment(background_color=(0.0, 0.0, 0.0)),
        env_mod.SOLID_COLOR,
    ),
}


@pytest.mark.parametrize("name", list(SCENES))
def test_denoise_beats_equiv_spp(name):
    build, cam, env, mode = SCENES[name]
    scene = build()
    key = jax.random.PRNGKey(42)
    ref, _, _ = _render(scene, cam, env, mode, HIGH_SPP, key)
    noisy, albedo, normal = _render(scene, cam, env, mode, LOW_SPP, key)
    equiv, _, _ = _render(scene, cam, env, mode, EQUIV_SPP, key)
    den = np.asarray(denoise_mod.atrous_denoise(noisy, albedo, normal))

    p_noisy = float(metrics.psnr(noisy, ref))
    p_equiv = float(metrics.psnr(equiv, ref))
    p_den = float(metrics.psnr(den, ref))
    s_noisy = float(metrics.ssim(noisy, ref))
    s_den = float(metrics.ssim(den, ref))
    print(f"\n[{name}] PSNR vs {HIGH_SPP}spp: raw {LOW_SPP}spp={p_noisy:.2f} dB, "
          f"raw {EQUIV_SPP}spp={p_equiv:.2f} dB, "
          f"denoised {LOW_SPP}spp={p_den:.2f} dB | "
          f"SSIM raw={s_noisy:.4f} denoised={s_den:.4f}")

    # The denoiser must be a real improvement...
    assert p_den > p_noisy + 2.0, "denoise should gain >2 dB over raw"
    assert s_den > s_noisy
    # ...and worth at least EQUIV_FACTOR x the samples (OIDN-claim analog).
    assert p_den >= p_equiv - 0.25, (
        f"denoised {LOW_SPP}spp ({p_den:.2f} dB) should match raw "
        f"{EQUIV_SPP}spp ({p_equiv:.2f} dB)")
