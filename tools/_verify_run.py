import jax, numpy as np
jax.config.update('jax_platforms', 'cpu')
from raytracer_project_tpu.models import presets, camera as cam_mod, environment as env_mod
from raytracer_project_tpu.ops import integrator
from raytracer_project_tpu.core import colorspace
from raytracer_project_tpu.utils import image_io

scene = presets.shirley_final_scene(grid=6)
cfg = integrator.RenderConfig(width=240, height=135, samples_per_pixel=24,
                              max_depth=8, env_mode=env_mod.PHYSICAL_SUN)
cam = cam_mod.make_camera(image_width=cfg.width, image_height=cfg.height,
                          vfov=20, lookfrom=(13,2,3), lookat=(0,0,0),
                          defocus_angle=0.6, focus_dist=10.0)
env = env_mod.make_environment(sun_direction=(0.4,0.6,0.2), sun_intensity=6.0)
out = jax.jit(integrator.render, static_argnames='config')(
    scene, cam, env, jax.random.PRNGKey(0), cfg)
b = np.asarray(out['beauty'])
print('beauty finite:', np.isfinite(b).all(), 'mean', b.mean(), 'max', b.max())
n = np.asarray(out['normal'])
print('normal miss sentinel ok:', np.allclose(n[0, 0], [0.5, 0.5, 1.0], atol=0.3))
image_io.save_png('/tmp/beauty.png', np.asarray(colorspace.to_srgb_u8(out['beauty'])))
print('saved /tmp/beauty.png')
