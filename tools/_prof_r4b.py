"""Ablation: time the pool body with stages knocked out."""
import time, sys
import jax, jax.numpy as jnp
from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, wavefront, intersect, shade
from raytracer_project_tpu.core.constants import T_MIN

W, H, SPP = 800, 450, 32
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
cfg = integrator.RenderConfig(width=W, height=H, samples_per_pixel=SPP,
    max_depth=10, env_mode=env_mod.PHYSICAL_SUN,
    use_albedo=False, use_normal=False, use_z_depth=False, wavefront=True)
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2), sun_intensity=6.0)
key = jax.random.PRNGKey(0)
pixel_ids = jnp.arange(W * H, dtype=jnp.int32)

state0, cond, body = wavefront.make_pool(scene, cam, env, key, cfg, pixel_ids)

def timeit(name, fn, arg, reps=5):
    s = jax.block_until_ready(fn(arg))
    s = jax.block_until_ready(fn(s))
    t0 = time.perf_counter()
    for _ in range(reps):
        s = fn(s)
    jax.block_until_ready(s)
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

timeit("full body", jax.jit(body), state0)

# Ablation 1: fake intersect (no pallas call)
real_isect = intersect.intersect_soa
def fake_isect(scene, o, d, tmin):
    t = jnp.abs(o[0]) + jnp.abs(d[0]) + 5.0
    n = o[0].shape[0]
    return intersect.Hit(t=t, prim_type=jnp.zeros((n,), jnp.int32),
                         prim_idx=jnp.zeros((n,), jnp.int32),
                         hit=t < 10.0)
intersect.intersect_soa = fake_isect
_, _, body_noisect = wavefront.make_pool(scene, cam, env, key, cfg, pixel_ids)
timeit("body, fake intersect", jax.jit(body_noisect), state0)
intersect.intersect_soa = real_isect

# Ablation 2: fake record (no gathers) — keep real intersect
real_rec = intersect.make_record_soa
def fake_rec(scene, o, d, hit):
    n = o[0].shape[0]
    one = jnp.ones((n,), jnp.float32)
    z = jnp.zeros((n,), jnp.float32)
    return intersect.HitRecordSoa(
        t=hit.t, p=(o[0] + hit.t * d[0], o[1] + hit.t * d[1], o[2] + hit.t * d[2]),
        normal=(z, one, z), tangent=(one, z, z), bitangent=(z, z, one),
        front_face=jnp.ones((n,), bool), u=z, v=z,
        mat=jnp.zeros((n,), jnp.int32), hit=hit.hit)
intersect.make_record_soa = fake_rec
_, _, body_norec = wavefront.make_pool(scene, cam, env, key, cfg, pixel_ids)
timeit("body, fake record", jax.jit(body_norec), state0)
intersect.make_record_soa = real_rec

# Ablation 3: fake shade
real_scatter = shade.scatter_soa
def fake_scatter(scene, rec, d, lr):
    n = rec.u.shape[0]
    h = tuple(jnp.full((n,), 0.5) for _ in range(3))
    return shade.ScatterResultSoa(
        scattered=rec.hit, origin=rec.p, direction=rec.normal,
        attenuation=h, emitted=h) if hasattr(shade, "ScatterResultSoa") else None
try:
    shade.scatter_soa = fake_scatter
    _, _, body_noshade = wavefront.make_pool(scene, cam, env, key, cfg, pixel_ids)
    timeit("body, fake shade", jax.jit(body_noshade), state0)
except Exception as e:
    print("fake shade failed:", repr(e)[:200])
shade.scatter_soa = real_scatter

# Ablation 4: fake spawn (no camera raygen)
real_spawn = wavefront._spawn
def fake_spawn(scene, cam, seed, config, pixel_ids, sample_offset, n_beauty,
               work_id, identity_pixels=False):
    n = pixel_ids.shape[0]
    is_spec = work_id >= n_beauty
    w = jnp.where(is_spec, work_id - n_beauty, work_id)
    samp_rel = w // n
    li = w - samp_rel * n
    samp = sample_offset + samp_rel
    p = work_id.shape[0]
    z = jnp.zeros((p,), jnp.float32)
    one = jnp.ones((p,), jnp.float32)
    return li, li, samp, is_spec, (z, z, z), (one, z, z)
wavefront._spawn = fake_spawn
_, _, body_nospawn = wavefront.make_pool(scene, cam, env, key, cfg, pixel_ids)
timeit("body, fake spawn", jax.jit(body_nospawn), state0)
wavefront._spawn = real_spawn

# Ablation 5: intersect + record + shade pipeline alone (no loop, fresh arrays)
o, dvec = state0.origin, state0.direction
@jax.jit
def isect_only(o, d):
    return intersect.intersect_soa(scene, o, d, T_MIN)
timeit2 = lambda name, fn, *a: (jax.block_until_ready(fn(*a)),
    print(f"{name:46s} {(lambda t0: (time.perf_counter()-t0)/5*1e3)(time.perf_counter()) if False else 0:.2f}"))
h = jax.block_until_ready(isect_only(o, dvec))
t0 = time.perf_counter()
for _ in range(5):
    h = isect_only(o, dvec)
jax.block_until_ready(h)
print(f"{'intersect_soa alone':46s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms")

@jax.jit
def rec_only(o, d, h):
    return intersect.make_record_soa(scene, o, d, h)
r = jax.block_until_ready(rec_only(o, dvec, h))
t0 = time.perf_counter()
for _ in range(5):
    r = rec_only(o, dvec, h)
jax.block_until_ready(r)
print(f"{'make_record_soa alone':46s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms")
