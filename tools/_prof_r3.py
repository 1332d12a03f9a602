"""Round-3 TPU profile: one pool step + intersector alone at bench shapes."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, wavefront, intersect, pallas_intersect
from raytracer_project_tpu.core.constants import T_MIN

W, H, SPP = 800, 450, 32
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
print("backend", jax.default_backend(), "prims", scene.primitive_count,
      "s/t/b", scene.spheres.count, scene.triangles.count, scene.boxes.count)
cfg = integrator.RenderConfig(width=W, height=H, samples_per_pixel=SPP,
    max_depth=10, env_mode=env_mod.PHYSICAL_SUN,
    use_albedo=False, use_normal=False, use_z_depth=False, wavefront=True)
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2), sun_intensity=6.0)
key = jax.random.PRNGKey(0)
import numpy as np
pixel_ids = np.arange(W * H, dtype=np.int32)


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:9.2f} ms")
    return out


state0, cond, body = wavefront.make_pool(scene, cam, env, key, cfg, pixel_ids)
step = jax.jit(body)
s1 = jax.block_until_ready(step(state0))
s2 = jax.block_until_ready(step(s1))
bench("pool step (262k lanes)", step, s2)

o, d = s2.origin, s2.direction
f_pal = jax.jit(lambda o, d: pallas_intersect.intersect_brute_pallas(scene, o, d, T_MIN))
hit = bench("pallas intersect 262k bounce rays", f_pal, o, d)
f_rec = jax.jit(lambda o, d, h: intersect.make_record(scene, o, d, h))
rec = bench("make_record", f_rec, o, d, hit)
from raytracer_project_tpu.ops import shade
from raytracer_project_tpu.core import rng as rng_mod
seed = rng_mod.seed_from_key(key)
lr = rng_mod.LaneRng(seed, s2.pix.astype(jnp.uint32), s2.samp.astype(jnp.uint32), jnp.uint32(0))
f_sh = jax.jit(lambda r, d: shade.scatter(scene, r, d, lr))
bench("shade.scatter", f_sh, rec, d)
f_env = jax.jit(lambda d: env_mod.background_color(env, d, env_mod.PHYSICAL_SUN))
bench("env background", f_env, d)
