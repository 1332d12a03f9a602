"""Bisect make_record cost on TPU."""
import time
import jax, jax.numpy as jnp

from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import intersect
from raytracer_project_tpu.ops.intersect import _sphere_record, _triangle_record
from raytracer_project_tpu.core import rng
from raytracer_project_tpu.core.constants import T_MIN

W, H = 800, 450
N = W * H
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
key = jax.random.PRNGKey(0)
pixel_ids = jnp.arange(N, dtype=jnp.int32)
pkeys = rng.per_lane_keys(key, pixel_ids)
k_ray, = rng.split_each(pkeys, 1)
o, d = jax.jit(cam_mod.generate_rays, static_argnums=3)(cam, k_ray, pixel_ids, W)
from raytracer_project_tpu.ops import pallas_intersect
hit = jax.jit(lambda o, d: pallas_intersect.intersect_brute_pallas(scene, o, d, T_MIN))(o, d)
jax.block_until_ready(hit)


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.3f} ms")


t_safe = jnp.where(hit.hit, hit.t, 1.0)
idx_s = jnp.clip(hit.prim_idx, 0, scene.spheres.count - 1)
idx_t = jnp.clip(hit.prim_idx, 0, scene.triangles.count - 1)

f_s = jax.jit(lambda o, d, t, i: _sphere_record(scene, o, d, t, i))
f_t = jax.jit(lambda o, d, t, i: _triangle_record(scene, o, d, t, i))
f_full = jax.jit(lambda o, d, h: intersect.make_record(scene, o, d, h))

bench("sphere_record", f_s, o, d, t_safe, idx_s)
bench("triangle_record", f_t, o, d, t_safe, idx_t)
bench("make_record full", f_full, o, d, hit)

# also check: keys/rng cost per bounce
bench("fold_each", jax.jit(lambda k: rng.fold_each(k, 3)), pkeys)
bench("split_each x3", jax.jit(lambda k: rng.split_each(k, 3)), pkeys)
bench("unit_vector_each", jax.jit(rng.unit_vector_each), pkeys)
bench("uniform_each", jax.jit(rng.uniform_each), pkeys)

# env pieces
from raytracer_project_tpu.models import environment as env_mod
env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2), sun_intensity=6.0)
bench("shade_sun_sky", jax.jit(lambda d: env_mod.shade_sun_sky(env, d)), d)
from raytracer_project_tpu.core import vecmath
bench("normalize", jax.jit(vecmath.normalize), d)
