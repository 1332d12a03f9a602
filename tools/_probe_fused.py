"""Staged fused-step probe: per-kernel compile+time so one flaky-tunnel
window yields maximal information. Prints progress with flush."""
import time
import sys

import jax
import jax.numpy as jnp

log = lambda *a: print(*a, flush=True)

t0 = time.perf_counter()
jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones(8)))
log(f"[0] device alive ({time.perf_counter()-t0:.1f}s)")

from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, fused_step, intersect

W, H, SPP = 800, 450, 32
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
cfg = integrator.RenderConfig(width=W, height=H, samples_per_pixel=SPP,
    max_depth=10, env_mode=env_mod.PHYSICAL_SUN,
    use_albedo=False, use_normal=False, use_z_depth=False, wavefront=True)
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2), sun_intensity=6.0)
key = jax.random.PRNGKey(0)

state0, cond, body = fused_step.make_pool_fused(scene, cam, env, key, cfg)
P = state0.o[0].shape[0]
log(f"[1] pool built: P={P}")

# --- stage A: kernel A alone ---
tables = fused_step.build_tables(scene, env, cfg.env_mode)
aparams = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(1e-3)
feats = intersect.ray_features_soa(state0.o, state0.d)


def kA(feats):
    return fused_step.trace_decode(scene, tables, feats, aparams, None)


try:
    fA = jax.jit(kA)
    t0 = time.perf_counter()
    rec = jax.block_until_ready(fA(feats))
    log(f"[2] kernel A compiled+ran ({time.perf_counter()-t0:.1f}s)")
    t0 = time.perf_counter()
    for _ in range(5):
        rec = fA(feats)
    jax.block_until_ready(rec)
    log(f"[2] kernel A: {(time.perf_counter()-t0)/5*1e3:.2f} ms/call")
except Exception as e:
    log(f"[2] kernel A FAILED: {type(e).__name__}: {str(e)[:400]}")
    sys.exit(1)

# --- stage B: kernel B alone (recycled kernel A output) ---
iscal = jnp.zeros((1, 4), jnp.int32).at[0, 1].set(P)
fscal = jnp.zeros((1, 2), jnp.float32)
bparams = jnp.zeros((1, fused_step._BP_COLS), jnp.float32)
zc = jnp.zeros((P,), jnp.float32)
tex3 = (zc, zc, zc)
bump2 = (zc, zc)
env3 = (zc, zc, zc)
state_cols = (*state0.o, *state0.d, *state0.thr, *state0.rad,
              state0.live, state0.bounce, state0.samp, state0.li)


def kB(rec, state_cols):
    return fused_step.shade_advance(
        tables, iscal, fscal, bparams, rec, tex3, bump2, env3, state_cols,
        n_pixels=cfg.n_pixels, width=W, total_work=cfg.n_pixels * SPP,
        max_depth=10, env_mode=cfg.env_mode, spp=SPP,
        aux=min(cfg.aux_samples, SPP), z_max=cfg.z_depth_max_dist, aovs=())


try:
    fB = jax.jit(kB)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fB(rec, state_cols))
    log(f"[3] kernel B compiled+ran ({time.perf_counter()-t0:.1f}s)")
    t0 = time.perf_counter()
    for _ in range(5):
        out = fB(rec, state_cols)
    jax.block_until_ready(out)
    log(f"[3] kernel B: {(time.perf_counter()-t0)/5*1e3:.2f} ms/call")
except Exception as e:
    log(f"[3] kernel B FAILED: {type(e).__name__}: {str(e)[:400]}")
    sys.exit(1)

# --- stage C: full body ---
try:
    step = jax.jit(body)
    t0 = time.perf_counter()
    s1 = jax.block_until_ready(step(state0))
    log(f"[4] full body compiled+ran ({time.perf_counter()-t0:.1f}s)")
    s = jax.block_until_ready(step(s1))
    t0 = time.perf_counter()
    for _ in range(5):
        s = step(s)
    jax.block_until_ready(s)
    log(f"[4] full body: {(time.perf_counter()-t0)/5*1e3:.2f} ms/step")
    log(f"[4] live={int(s.live_count[0,0])} segments={float(s.segments[0,0])}"
        f" next_work={int(s.next_work[0,0])}")
except Exception as e:
    log(f"[4] full body FAILED: {type(e).__name__}: {str(e)[:400]}")
    sys.exit(1)

# --- stage D: full render + throughput ---
try:
    t0 = time.perf_counter()
    out, stats = fused_step.render_pool_fused(
        scene, cam, env, key, cfg, with_stats=True)
    jax.block_until_ready(out.beauty)
    dt = time.perf_counter() - t0
    import numpy as np
    segs = float(stats["segments"])
    log(f"[5] full render (compile+run): {dt:.1f}s")
    t0 = time.perf_counter()
    out, stats = fused_step.render_pool_fused(
        scene, cam, env, jax.random.PRNGKey(1), cfg, with_stats=True)
    np.asarray(out.beauty)
    dt = time.perf_counter() - t0
    segs = float(stats["segments"])
    log(f"[5] steady render: {dt:.3f}s  measured {segs/dt/1e6:.1f} Mrays/s"
        f"  upper {W*H*SPP*10/dt/1e6:.1f} Mrays/s  steps {int(stats['steps'])}"
        f"  beauty mean {float(np.asarray(out.beauty).mean()/SPP):.4f}")
except Exception as e:
    log(f"[5] full render FAILED: {type(e).__name__}: {str(e)[:400]}")
    sys.exit(1)
