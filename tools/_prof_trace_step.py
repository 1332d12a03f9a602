"""Trace 3 chained pool steps; dump exclusive per-op timings."""
import sys
sys.path.insert(0, ".")
import glob
import jax
import numpy as np

from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, wavefront

W, H, SPP = 800, 450, 32
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
cfg = integrator.RenderConfig(width=W, height=H, samples_per_pixel=SPP,
    max_depth=10, env_mode=env_mod.PHYSICAL_SUN,
    use_albedo=False, use_normal=False, use_z_depth=False, wavefront=True)
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2), sun_intensity=6.0)
key = jax.random.PRNGKey(0)
pixel_ids = np.arange(W * H, dtype=np.int32)

state0, cond, body = wavefront.make_pool(scene, cam, env, key, cfg, pixel_ids)
def body3(s):
    for _ in range(3):
        s = body(s)
    return s
step3 = jax.jit(body3)
s = jax.block_until_ready(jax.jit(body)(state0))
s = jax.block_until_ready(step3(s))

with jax.profiler.trace("/tmp/jtrace_step"):
    out = step3(s)
    jax.block_until_ready(out)
print("traced", glob.glob("/tmp/jtrace_step/**/*.xplane.pb", recursive=True))
