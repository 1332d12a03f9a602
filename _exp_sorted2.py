import time
import jax, jax.numpy as jnp
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import pallas_intersect as pi
from raytracer_project_tpu.ops.intersect import ray_features
from raytracer_project_tpu.core import rng

scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
N = 358_400
ko, kd = jax.random.split(jax.random.PRNGKey(7))
o = jax.random.uniform(ko, (N,3), minval=-8, maxval=8)
d = rng.unit_vector(kd, (N,))
bounds = jnp.concatenate([jnp.asarray(scene.mm.sphere_bounds), jnp.asarray(scene.mm.tri_bounds)], 0)

def bench(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps): out = jax.block_until_ready(fn(*args))
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)
    return out

f_key = jax.jit(lambda o, d: pi._sort_key(o, d, bounds)[0])
bkey = bench("sort_key", f_key, o, d)
nb = (bounds.shape[0]+1)*8
f_cs = jax.jit(lambda k: pi._counting_sort_perm(k, nb))
order, dest = bench("counting_sort 216 buckets", f_cs, bkey)
f_perm = jax.jit(lambda o, d, order: ray_features(o, d)[order])
bench("feats+permute", f_perm, o, d, order)
f_all = jax.jit(lambda o, d: (lambda k: (lambda od: ray_features(o,d)[od[0]])(pi._counting_sort_perm(k, nb)))(pi._sort_key(o, d, bounds)[0]))
bench("key+sort+permute fused", f_all, o, d)
