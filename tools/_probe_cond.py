"""Isolate the while_loop cond cost in the fused render."""
import time
import jax, jax.numpy as jnp
log = lambda *a: print(*a, flush=True)
jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones(8)))
log("[0] device alive")
from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, fused_step
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

def run(name, condfn, n_warm=1):
    f = jax.jit(lambda st: jax.lax.while_loop(condfn, body, st))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(state0))
    steps = int(out.steps)
    dt = time.perf_counter() - t0
    log(f"[{name}] compile+run {dt:.1f}s steps={steps}")
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(state0))
    dt = time.perf_counter() - t0
    steps = int(out.steps)
    log(f"[{name}] steady {dt:.1f}s = {dt/max(steps,1)*1e3:.1f} ms/step")

run("cond-steps", lambda s: s.steps < 116)
run("cond-live", cond)
