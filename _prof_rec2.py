import time, jax, jax.numpy as jnp
from raytracer_project_tpu.models import camera as cam_mod, presets
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.ops import intersect, shade, pallas_intersect
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
k_ray, k_first = rng.split_each(pkeys, 2)
o, d = jax.jit(cam_mod.generate_rays, static_argnums=3)(cam, k_ray, pixel_ids, W)
f_pallas = jax.jit(lambda o, d: pallas_intersect.intersect_brute_pallas(scene, o, d, T_MIN))
hit = jax.block_until_ready(f_pallas(o, d))
f_rec = jax.jit(lambda o, d, h: intersect.make_record(scene, o, d, h))
rec = jax.block_until_ready(f_rec(o, d, hit))
f_shade = jax.jit(lambda r, d, k: shade.scatter(scene, r, d, k))
sc = jax.block_until_ready(f_shade(rec, d, k_first))
f_env = jax.jit(lambda d: env_mod.background_color(env_mod.make_environment(sun_direction=(0.4,0.7,0.2), sun_intensity=6.0), d, env_mod.PHYSICAL_SUN))
bg = jax.block_until_ready(f_env(d))

with jax.profiler.trace('/tmp/jtrace'):
    for _ in range(3):
        rec = f_rec(o, d, hit)
        jax.block_until_ready(rec)
    for _ in range(3):
        sc = jax.block_until_ready(f_shade(rec, d, k_first))
    for _ in range(3):
        bg = jax.block_until_ready(f_env(d))
