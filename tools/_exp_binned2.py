"""TPU speed: binned vs legacy union-cull kernel."""
import time, jax, jax.numpy as jnp
import numpy as np
from raytracer_project_tpu.models import camera as cam_mod, presets
from raytracer_project_tpu.ops import pallas_intersect as pi
from raytracer_project_tpu.ops import pallas_binned as pb
from raytracer_project_tpu.core import rng
from raytracer_project_tpu.core.constants import T_MIN, T_MAX

scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
W, H = 800, 448
N = W * H
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
ids = jnp.arange(N, dtype=jnp.int32)
lr = rng.lane_rng(jax.random.PRNGKey(0), ids)
o_t, d_t = jax.jit(cam_mod.generate_rays, static_argnums=3)(cam, lr, ids, W)
ko, kd = jax.random.split(jax.random.PRNGKey(7))
o_b = jax.random.uniform(ko, (N,3), minval=-8, maxval=8) * jnp.asarray([1,0.25,1]) + jnp.asarray([0,1,0])
d_b = rng.unit_vector(kd, (N,))

f_bin = jax.jit(lambda o, d: pb.intersect_brute_binned(scene, o, d, T_MIN))
f_old = jax.jit(lambda o, d: pi.intersect_brute_pallas(scene, o, d, T_MIN))

def bench(name, fn, o, d, reps=3):
    out = jax.block_until_ready(fn(o, d))
    t0 = time.perf_counter()
    for _ in range(reps): out = jax.block_until_ready(fn(o, d))
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:9.2f} ms", flush=True)
    return out

for nm, o, d in [("tiled-primary", o_t, d_t), ("bounce", o_b, d_b)]:
    h1 = bench(f"binned [{nm}]", f_bin, o, d)
    h0 = bench(f"legacy [{nm}]", f_old, o, d)
    flips = int(jnp.sum(h0.hit != h1.hit))
    both = h0.hit & h1.hit
    idxmis = int(jnp.sum(jnp.where(both, (h0.prim_idx != h1.prim_idx) | (h0.prim_type != h1.prim_type), False)))
    print(f"   parity vs legacy: flips={flips} idxmis={idxmis}")
