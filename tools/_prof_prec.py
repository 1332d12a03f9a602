"""Quantify matmul-precision impact on intersection correctness + cost."""
import time
import jax, jax.numpy as jnp

from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import intersect
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
h_def = bench("mm default precision", f_mm, o, d)

with jax.default_matmul_precision("highest"):
    f_mm_hi = jax.jit(lambda o, d: intersect.intersect_brute_mm(scene, o, d, T_MIN))
    h_hi = bench("mm highest precision", f_mm_hi, o, d)

with jax.default_matmul_precision("float32"):
    f_mm_f32 = jax.jit(lambda o, d: intersect.intersect_brute_mm(scene, o, d, T_MIN))
    h_f32 = bench("mm float32 precision", f_mm_f32, o, d)


def agree(name, h):
    hits = float(jnp.mean((h.hit == h_ref.hit).astype(jnp.float32)))
    both = h.hit & h_ref.hit
    terr = float(jnp.max(jnp.where(both, jnp.abs(h.t - h_ref.t), 0.0)))
    idx = float(jnp.mean(jnp.where(both, (h.prim_idx == h_ref.prim_idx), True).astype(jnp.float32)))
    print(f"{name}: hit agree {hits:.5f}  max|dt| {terr:.4g}  idx agree {idx:.5f}")


agree("default", h_def)
agree("highest", h_hi)
agree("float32", h_f32)
