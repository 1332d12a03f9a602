"""Finer round-3 profile: the pool-step pieces NOT covered by _prof_r3."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, wavefront, intersect, shade
from raytracer_project_tpu.core import rng
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
pixel_ids = np.arange(W * H, dtype=np.int32)
seed = rng.seed_from_key(key)
P = wavefront.POOL_LANES
n_beauty = W * H * SPP


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:9.2f} ms")
    return out


state0, cond, body = wavefront.make_pool(scene, cam, env, key, cfg, pixel_ids)
step = jax.jit(body)
s1 = jax.block_until_ready(step(state0))
s2 = jax.block_until_ready(step(s1))
bench("pool step total", step, s2)

# _spawn for all P lanes (runs every step)
w0 = jnp.arange(P, dtype=jnp.int32)
f_spawn = jax.jit(lambda w: wavefront._spawn(
    scene, cam, seed, cfg, pixel_ids, jnp.asarray(0, jnp.int32), n_beauty, w,
    True))
bench("_spawn (raygen for all P)", f_spawn, w0)

# LaneRng construction + a uniform draw
def f_rng(pix, samp, bounce):
    lr = rng.LaneRng(seed, pix.astype(jnp.uint32), samp.astype(jnp.uint32),
                     bounce.astype(jnp.uint32))
    return rng.draw_uniform(lr, rng.STREAM_RR)
bench("LaneRng + 1 uniform draw", jax.jit(f_rng), s2.pix, s2.samp, s2.bounce)

# scatter-add of one buffer (3 channels) at P lanes
acc = {f"beauty.{c}": jnp.zeros((W * H + 1,), jnp.float32) for c in "xyz"}
val = s2.radiance
mask = s2.live
slot = s2.li
def f_scat(acc, mask, slot, val):
    tgt = jnp.where(mask, slot, W * H)
    out = {}
    for ci, c in enumerate("xyz"):
        out[f"beauty.{c}"] = acc[f"beauty.{c}"].at[tgt].add(
            jnp.where(mask, val[:, ci], 0.0))
    return out
bench("scatter_add beauty (3 ch)", jax.jit(f_scat), acc, mask, slot, val)

# respawn bookkeeping: cumsum + clip + selects
def f_respawn(live, done):
    free = ~live | done
    rank = (jnp.cumsum(free.astype(jnp.float32)) - 1.0).astype(jnp.int32)
    return rank
bench("respawn cumsum", jax.jit(f_respawn), s2.live, s2.live)

# RR + throughput update block
def f_rr(bounce, throughput, pix, samp):
    lr = rng.LaneRng(seed, pix.astype(jnp.uint32), samp.astype(jnp.uint32),
                     bounce.astype(jnp.uint32))
    late = (bounce - 1) > 10
    from raytracer_project_tpu.core import vecmath
    weak = late & (vecmath.length(throughput) < 1e-4)
    p_rr = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 0.95)
    u = rng.draw_uniform(lr, rng.STREAM_RR)
    active = ~weak & ~(late & (u > p_rr))
    return jnp.where((late & active)[:, None], throughput / p_rr[:, None],
                     throughput)
bench("RR block", jax.jit(f_rr), s2.bounce, s2.throughput, s2.pix, s2.samp)

# camera generate_rays alone
lr0 = rng.LaneRng(seed, s2.pix.astype(jnp.uint32), s2.samp.astype(jnp.uint32),
                  jnp.uint32(0))
f_cam = jax.jit(lambda pix: cam_mod.generate_rays(cam, lr0, pix, W))
bench("generate_rays alone", f_cam, s2.pix)
