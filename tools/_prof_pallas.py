"""Pallas kernel: agreement with exact VPU kernels + timing after precision fix."""
import time
import jax, jax.numpy as jnp

from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import intersect, pallas_intersect
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


f_classic = jax.jit(lambda o, d: intersect.intersect_brute(scene, o, d, T_MIN))
h_ref = bench("classic brute (exact)", f_classic, o, d)

f_mm = jax.jit(lambda o, d: intersect.intersect_brute_mm(scene, o, d, T_MIN))
h_mm = bench("mm (fixed precision)", f_mm, o, d)

f_p = jax.jit(lambda o, d: pallas_intersect.intersect_brute_pallas(scene, o, d, T_MIN))
h_p = bench("pallas (fixed precision)", f_p, o, d)


def agree(name, h):
    hits = float(jnp.mean((h.hit == h_ref.hit).astype(jnp.float32)))
    both = h.hit & h_ref.hit
    terr = float(jnp.max(jnp.where(both, jnp.abs(h.t - h_ref.t), 0.0)))
    idx = float(jnp.mean(jnp.where(both, (h.prim_idx == h_ref.prim_idx), True).astype(jnp.float32)))
    print(f"{name}: hit agree {hits:.6f}  max|dt| {terr:.4g}  idx agree {idx:.6f}")


agree("mm    ", h_mm)
agree("pallas", h_p)
