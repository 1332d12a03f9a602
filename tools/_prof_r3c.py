"""Dispatch-floor calibration + chained-step marginal cost."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, wavefront
from raytracer_project_tpu.core import rng

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


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {dt:9.2f} ms")
    return dt


x = jnp.ones((8, 128), jnp.float32)
floor = bench("dispatch floor (tiny add)", jax.jit(lambda x: x + 1.0), x)

state0, cond, body = wavefront.make_pool(scene, cam, env, key, cfg, pixel_ids)
step1 = jax.jit(body)
def body5(s):
    for _ in range(5):
        s = body(s)
    return s
step5 = jax.jit(body5)
s = jax.block_until_ready(step1(state0))
s = jax.block_until_ready(step1(s))
t1 = bench("1 step", step1, s)
t5 = bench("5 chained steps", step5, s)
print(f"marginal per-step: {(t5 - t1) / 4:.2f} ms; "
      f"amortized/5: {t5 / 5:.2f} ms")
