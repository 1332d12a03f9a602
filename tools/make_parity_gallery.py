"""Render the feature-by-feature parity gallery into docs/parity/.

Each image exercises one reference capability; PARITY.md documents the
expected appearance with reference citations. Run on CPU (DN_CPU-style
forced) so the gallery is reproducible anywhere:

    python tools/make_parity_gallery.py       # from the repo root
"""
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.getcwd())

from raytracer_project_tpu.core import colorspace
from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import denoise as dn_mod
from raytracer_project_tpu.ops import integrator, post as post_mod
from raytracer_project_tpu.utils import image_io

OUT = "docs/parity"
os.makedirs(OUT, exist_ok=True)
W, H = 200, 112


def render(scene, cam, env, mode, spp=24, depth=8, aovs=False, key=0):
    cfg = integrator.RenderConfig(
        width=W, height=H, samples_per_pixel=spp, max_depth=depth,
        env_mode=mode, use_albedo=aovs, use_normal=aovs, use_z_depth=aovs,
        wavefront=True)
    out = jax.jit(integrator.render, static_argnames="config")(
        scene, cam, env, jax.random.PRNGKey(key), cfg)
    return {k: np.asarray(v) for k, v in out.items()}


def save(name, img_linear, gamma_only=False):
    u8 = np.asarray(colorspace.to_srgb_u8(np.clip(img_linear, 0, None)))
    image_io.save_png(os.path.join(OUT, name), u8)
    print("wrote", name, flush=True)


def main():
    t0 = time.time()
    # 1. Shirley final scene (BASELINE config 1; README hero image).
    scene = presets.shirley_final_scene(grid=7)
    cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=20,
                              lookfrom=(13, 2, 3), lookat=(0, 0, 0),
                              defocus_angle=0.6, focus_dist=10.0)
    env = env_mod.make_environment()
    out = render(scene, cam, env, env_mod.SOLID_COLOR, spp=32)
    save("01_shirley_final.png", out["beauty"])

    # 2. Cornell box GI.
    scene = presets.cornell_box_scene()
    cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=40,
                              lookfrom=(278, 278, -800), lookat=(278, 278, 0))
    env = env_mod.make_environment(background_color=(0, 0, 0))
    out = render(scene, cam, env, env_mod.SOLID_COLOR, spp=320)
    save("02_cornell.png", out["beauty"])

    # 3. Showcase hero objects + neon field (scene_management.hpp:103-236).
    scene = presets.showcase_scene()
    cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30,
                              lookfrom=(12, 2.5, 6), lookat=(0, 1, 0))
    env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2),
                                   sun_intensity=6.0)
    out = render(scene, cam, env, env_mod.PHYSICAL_SUN, spp=32, aovs=True)
    save("03_showcase.png", out["beauty"])
    save("04_showcase_albedo.png", out["albedo"])
    save("05_showcase_normals.png", out["normal"])
    save("06_showcase_zdepth.png", out["z_depth"])

    # 7-9. Physical sun at day / sunset / night (camera.hpp:871-925).
    sphere_scene = presets.shirley_final_scene(grid=2)
    cam2 = cam_mod.make_camera(image_width=W, image_height=H, vfov=26,
                               lookfrom=(13, 2, 3), lookat=(0, 0.6, 0))
    for name, sd in (("07_sun_day.png", (0.3, 0.8, 0.2)),
                     ("08_sun_sunset.png", (0.95, 0.012, 0.2)),
                     ("09_sun_night.png", (0.5, -0.4, 0.2))):
        env = env_mod.make_environment(sun_direction=sd, sun_intensity=6.0)
        out = render(sphere_scene, cam2, env, env_mod.PHYSICAL_SUN, spp=24)
        save(name, out["beauty"])

    # 10. HDRI equirect with yaw/tilt (camera.hpp:837-870): a procedural
    # sky-gradient + bright-patch map so rotation is visible.
    yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 2, 128),
                         indexing="ij")
    hdr = np.stack([0.3 + 2.5 * np.exp(-((xx - 0.5) ** 2 + (yy - 0.35) ** 2)
                                       / 0.01),
                    0.4 + 0.3 * yy, 0.7 - 0.3 * yy], -1).astype(np.float32)
    env = env_mod.make_environment(hdr_image=hdr, hdri_rotation=0.8,
                                   hdri_tilt=0.15)
    out = render(sphere_scene, cam2, env, env_mod.HDR_MAP, spp=24)
    save("10_hdri_rotated.png", out["beauty"])

    # 11. Constant-medium fog (constant_medium.hpp; showcase fog option).
    scene = presets.showcase_scene(use_fog=True, fog_density=0.02, grid=8)
    env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2),
                                   sun_intensity=6.0)
    cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30,
                              lookfrom=(12, 2.5, 6), lookat=(0, 1, 0))
    out = render(scene, cam, env, env_mod.PHYSICAL_SUN, spp=24)
    save("11_fog.png", out["beauty"])

    # 12. BVH wireframe debug visualization (bvh.hpp:56-109).
    from raytracer_project_tpu.ops import debugviz
    scene = presets.shirley_final_scene(grid=4)
    cfg = integrator.RenderConfig(width=W, height=H, samples_per_pixel=4,
                                  max_depth=4, env_mode=env_mod.SOLID_COLOR)
    wire = debugviz.render_bvh_debug(
        scene, cam_mod.make_camera(image_width=W, image_height=H, vfov=20,
                                   lookfrom=(13, 2, 3), lookat=(0, 0, 0)),
        jax.random.PRNGKey(0), cfg, level=-1, thickness=0.12)
    save("12_bvh_wireframe.png", np.asarray(wire))

    # 13-14. Post chain: graded (ACES+bloom+vignette) vs gamma-only.
    scene = presets.showcase_scene(grid=8)
    out = render(scene, cam, env, env_mod.PHYSICAL_SUN, spp=24)
    beauty = out["beauty"]
    params = post_mod.make_post_params(
        exposure=0.4, bloom_threshold=0.9, bloom_intensity=0.5,
        vignette_intensity=0.65, saturation=1.15, contrast=1.08)
    pcfg = post_mod.PostConfig(use_aces=True, use_bloom=True,
                               use_sharpening=True)
    graded = post_mod.update_post_processing(
        beauty.reshape(H, W, 3), params, pcfg, post_mod.PASS_RGB)
    image_io.save_png(os.path.join(OUT, "13_post_graded.png"),
                      np.clip(np.asarray(graded) * 255.99, 0,
                              255).astype(np.uint8))
    print("wrote 13_post_graded.png", flush=True)
    save("14_post_gamma_only.png", beauty)

    # 15. Denoiser before/after at 8 spp (U-Net, assets weights).
    from raytracer_project_tpu.models import denoiser_unet
    scene = presets.cornell_box_scene()
    cam3 = cam_mod.make_camera(image_width=W, image_height=H, vfov=40,
                               lookfrom=(278, 278, -800), lookat=(278, 278, 0))
    env3 = env_mod.make_environment(background_color=(0, 0, 0))
    out = render(scene, cam3, env3, env_mod.SOLID_COLOR, spp=32, aovs=True)
    save("15_denoise_input_32spp.png", out["beauty"])
    model = denoiser_unet.load_default()
    if model is not None:
        den = np.asarray(model(out["beauty"], out["albedo"], out["normal"]))
        save("16_denoise_unet_32spp.png", den)

    print(f"gallery done in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
