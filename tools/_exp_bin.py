"""Overlap stats: how many chunk AABBs does each ray overlap?"""
import jax, jax.numpy as jnp
import numpy as np
from raytracer_project_tpu.models import camera as cam_mod, presets
from raytracer_project_tpu.core import rng
from raytracer_project_tpu.core.constants import T_MAX, T_MIN

scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
W, H = 800, 448
N = W * H
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
ids = jnp.arange(N, dtype=jnp.int32)
pk = rng.per_lane_keys(jax.random.PRNGKey(0), ids)
kr, = rng.split_each(pk, 1)
o_t, d_t = jax.jit(cam_mod.generate_rays, static_argnums=3)(cam, kr, ids, W)
ko, kd = jax.random.split(jax.random.PRNGKey(7))
o_b = jax.random.uniform(ko, (N,3), minval=-8, maxval=8) * jnp.asarray([1,0.25,1]) + jnp.asarray([0,1,0])
d_b = rng.unit_vector(kd, (N,))

sb = jnp.asarray(scene.mm.sphere_bounds)  # [Cs, 6]
tb = jnp.asarray(scene.mm.tri_bounds)
bounds = jnp.concatenate([sb, tb], 0)     # [C, 6]
print("chunks:", bounds.shape[0], "nonempty:", int(jnp.sum(bounds[:,0] <= bounds[:,3])))

@jax.jit
def overlaps(o, d):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    lo, hi = bounds[:, :3], bounds[:, 3:]
    t0 = (lo[None] - o[:,None,:]) * inv[:,None,:]   # [N,C,3]
    t1 = (hi[None] - o[:,None,:]) * inv[:,None,:]
    tn = jnp.max(jnp.minimum(t0,t1), -1)
    tf = jnp.min(jnp.maximum(t0,t1), -1)
    ok = (tn <= tf) & (tf > 0.0) & (bounds[None,:,0] <= bounds[None,:,3])
    return ok

for nm, o, d in [("tiled", o_t, d_t), ("bounce", o_b, d_b)]:
    ok = overlaps(o, d)
    per_ray = jnp.sum(ok, 1)
    print(f"{nm}: mean chunks/ray {float(jnp.mean(per_ray)):.2f}, "
          f"p50 {int(jnp.percentile(per_ray, 50))}, p95 {int(jnp.percentile(per_ray, 95))}, "
          f"max {int(jnp.max(per_ray))}, total pairs {int(jnp.sum(per_ray))}")
