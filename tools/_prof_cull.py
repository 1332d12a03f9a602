"""Surgical timing: (a) pallas cull on tiled vs scanline primary rays,
(b) standalone sort+permute cost in a loop."""
import time
import jax, jax.numpy as jnp
import numpy as np

from raytracer_project_tpu.models import camera as cam_mod, presets
from raytracer_project_tpu.ops import pallas_intersect, wavefront
from raytracer_project_tpu.core import rng
from raytracer_project_tpu.core.constants import T_MIN

W, H = 800, 448
N = W * H
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
key = jax.random.PRNGKey(0)

scan_ids = jnp.arange(N, dtype=jnp.int32)
# 16x32 pixel tiles -> 512-ray blocks with tight direction bounds.
TH, TW = 16, 32
j, i = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
tile = (j // TH) * (W // TW) + (i // TW)
within = (j % TH) * TW + (i % TW)
order = np.argsort((tile * (TH * TW) + within).ravel(), kind="stable")
tile_ids = jnp.asarray((j.ravel() * W + i.ravel())[order], jnp.int32)

def rays(ids):
    pk = rng.per_lane_keys(key, ids)
    kr, = rng.split_each(pk, 1)
    return jax.jit(cam_mod.generate_rays, static_argnums=3)(cam, kr, ids, W)

o_s, d_s = rays(scan_ids)
o_t, d_t = rays(tile_ids)
jax.block_until_ready((o_s, d_s, o_t, d_t))

f = jax.jit(lambda o, d: pallas_intersect.intersect_brute_pallas(scene, o, d, T_MIN))

def bench(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)
    return out

bench("pallas primary scanline", f, o_s, d_s)
bench("pallas primary tiled", f, o_t, d_t)

# (b) sort + permute 13-field state, 20 iterations inside one jit
P = 262_144
state = [jax.random.normal(jax.random.PRNGKey(i), (P, 3), jnp.float32) for i in range(6)] + \
        [jax.random.randint(jax.random.PRNGKey(10 + i), (P,), 0, 1 << 20, jnp.int32) for i in range(5)] + \
        [jax.random.bernoulli(jax.random.PRNGKey(20), 0.5, (P,)), jax.random.bernoulli(jax.random.PRNGKey(21), 0.5, (P,))]

@jax.jit
def sort_loop(state):
    def body(_, st):
        o, d = st[0], st[1]
        live = st[11]
        order = wavefront._coherence_order(o, d, live)
        return [x[order] for x in st]
    return jax.lax.fori_loop(0, 20, body, state)

out = sort_loop(state)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = sort_loop(state)
jax.block_until_ready(out)
print(f"sort+permute per step: {(time.perf_counter()-t0)/20*1e3:9.3f} ms")

# (c) bounce-like rays sorted by coherence key, through the culled kernel
hit = f(o_s, d_s)
p = o_s + hit.t[:, None] * d_s
du = rng.unit_vector_each(rng.split_each(rng.per_lane_keys(jax.random.PRNGKey(3), scan_ids), 1)[0])
mask = hit.hit
o2 = jnp.where(mask[:, None], p, o_s)
d2 = du
ordr = wavefront._coherence_order(o2, d2, mask)
bench("pallas bounce unsorted", f, o2, d2)
bench("pallas bounce sorted", f, o2[ordr], d2[ordr])
