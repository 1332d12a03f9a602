"""Compare intersect paths on TPU for the showcase scene (6371 prims)."""
import time
import jax, jax.numpy as jnp

from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import intersect, traverse
from raytracer_project_tpu.core import rng
from raytracer_project_tpu.core.constants import T_MIN

W, H = 800, 450
N = W * H
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
print("bvh nodes:", scene.bvh.node_min.shape[0] if scene.bvh else None,
      
      flush=True)
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
key = jax.random.PRNGKey(0)
pixel_ids = jnp.arange(N, dtype=jnp.int32)
pkeys = rng.per_lane_keys(key, pixel_ids)
k_ray, = rng.split_each(pkeys, 1)
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
    print(f"{name:40s} {dt*1e3:9.3f} ms", flush=True)
    return out


f_mm = jax.jit(lambda o, d: intersect.intersect_brute_mm(scene, o, d, T_MIN))
h1 = bench("intersect XLA-mm", f_mm, o, d)

f_bvh = jax.jit(lambda o, d: traverse.intersect_bvh(scene, o, d, T_MIN))
h2 = bench("intersect BVH", f_bvh, o, d)

f_brute = jax.jit(lambda o, d: intersect.intersect_brute(scene, o, d, T_MIN))
h3 = bench("intersect classic brute", f_brute, o, d)

agree = bool(jnp.mean((h1.t - h2.t) ** 2) < 1e-4)
print("bvh/mm t agree:", agree,
      "hit agree:", float(jnp.mean((h1.hit == h2.hit).astype(jnp.float32))))
