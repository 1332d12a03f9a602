"""Per-stage timing on the real TPU for the bench workload shape."""
import time, functools
import jax, jax.numpy as jnp

from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import integrator, intersect, shade
from raytracer_project_tpu.core import rng
from raytracer_project_tpu.core.constants import T_MIN

W, H = 800, 450
N = W * H
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
print("prims:", scene.primitive_count, "spheres:", scene.spheres.count,
      "tris:", scene.triangles.count)
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2), sun_intensity=6.0)
key = jax.random.PRNGKey(0)
pixel_ids = jnp.arange(N, dtype=jnp.int32)
pkeys = rng.per_lane_keys(key, pixel_ids)
k_ray, k_first = rng.split_each(pkeys, 2)
o, d = jax.jit(cam_mod.generate_rays, static_argnums=3)(cam, k_ray, pixel_ids, W)
jax.block_until_ready((o, d))


def bench(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return out


# 1. intersection alone (pallas path)
from raytracer_project_tpu.ops import pallas_intersect
f_pallas = jax.jit(lambda o, d: pallas_intersect.intersect_brute_pallas(scene, o, d, T_MIN))
hit = bench("intersect pallas (360k lanes)", f_pallas, o, d)

f_mm = jax.jit(lambda o, d: intersect.intersect_brute_mm(scene, o, d, T_MIN))
bench("intersect XLA-mm", f_mm, o, d)

# 2. record construction
f_rec = jax.jit(lambda o, d, h: intersect.make_record(scene, o, d, h))
rec = bench("make_record", f_rec, o, d, hit)

# 3. shading
f_shade = jax.jit(lambda r, d, k: shade.scatter(scene, r, d, k))
bench("shade.scatter", f_shade, rec, d, k_first)

# 4. env
f_env = jax.jit(lambda d: env_mod.background_color(env, d, env_mod.PHYSICAL_SUN))
bench("env background", f_env, d)

# 5. one full bounce loop (trace) with max_depth=10
f_trace = jax.jit(lambda o, d, k: integrator.trace(
    scene, env, o, d, k, max_bounces=9, env_mode=env_mod.PHYSICAL_SUN))
bench("trace 9 bounces", f_trace, o, d, k_first)

# 6. one full render_sample
cfg = integrator.RenderConfig(width=W, height=H, samples_per_pixel=1, max_depth=10,
                              env_mode=env_mod.PHYSICAL_SUN,
                              use_albedo=False, use_normal=False, use_z_depth=False)
f_samp = jax.jit(functools.partial(integrator.render_sample, config=cfg))
bench("render_sample (1 spp)", f_samp, scene, cam, env, key)
