import glob, sys
import jax
from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator

width, height, spp, max_depth = 800, 450, 4, 10
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
cfg = integrator.RenderConfig(width=width, height=height, samples_per_pixel=spp,
    max_depth=max_depth, env_mode=env_mod.PHYSICAL_SUN,
    use_albedo=False, use_normal=False, use_z_depth=False, wavefront=True)
cam = cam_mod.make_camera(image_width=width, image_height=height, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2), sun_intensity=6.0)
render = jax.jit(integrator.render, static_argnames="config")
print("compiling...", file=sys.stderr)
out = render(scene, cam, env, jax.random.PRNGKey(0), cfg)
jax.block_until_ready(out)

with jax.profiler.trace("/tmp/jtrace"):
    out = render(scene, cam, env, jax.random.PRNGKey(1), cfg)
    jax.block_until_ready(out)

paths = glob.glob("/tmp/jtrace/**/*.xplane.pb", recursive=True)
print("xplanes:", paths)
