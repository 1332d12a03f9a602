import time
import jax, jax.numpy as jnp
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import pallas_intersect as pi
from raytracer_project_tpu.core import rng
from raytracer_project_tpu.core.constants import T_MIN

scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
N = 358_400
ko, kd = jax.random.split(jax.random.PRNGKey(7))
o = jax.random.uniform(ko, (N,3), minval=-8, maxval=8) * jnp.asarray([1,0.25,1]) + jnp.asarray([0,1,0])
d = rng.unit_vector(kd, (N,))
bounds = jnp.concatenate([jnp.asarray(scene.mm.sphere_bounds), jnp.asarray(scene.mm.tri_bounds)], 0)

def bench(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps): out = jax.block_until_ready(fn(*args))
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)
    return out

@jax.jit
def perm(o, d):
    ck, oc, nm = pi._sort_key(o, d, bounds)
    order, dest = pi._radix_order(oc, ck, nm)
    return o[order], d[order], dest

os_, ds_, dest = bench("sort machinery (key+radix+permute o,d)", perm, o, d)
f_raw = jax.jit(lambda o, d: pi.intersect_brute_pallas(scene, o, d, T_MIN, sort_rays=False))
bench("kernel on unsorted", f_raw, o, d)
bench("kernel on pre-sorted", f_raw, os_, ds_)
@jax.jit
def unperm(t, dest):
    return t[dest]
h = f_raw(os_, ds_)
bench("unpermute one output", unperm, h.t, dest)
# key pieces
f_key = jax.jit(lambda o, d: pi._sort_key(o, d, bounds)[0])
bench("  sort_key alone", f_key, o, d)
ck, oc, nm = jax.jit(lambda o,d: pi._sort_key(o,d,bounds))(o, d)
f_rad = jax.jit(lambda a, b: pi._radix_order(a, b, 27))
bench("  radix alone", f_rad, oc, ck)
