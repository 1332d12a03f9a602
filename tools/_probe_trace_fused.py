"""Trace the fused body step AND a few while-loop iterations."""
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
step = jax.jit(body)
s = jax.block_until_ready(step(state0))
s = jax.block_until_ready(step(s))
log("[1] step warm")
with jax.profiler.trace('/tmp/jtrace_fused_step'):
    s2 = jax.block_until_ready(step(s))
log("[2] step traced")

# 5-iteration while loop
def loop5(st):
    def body2(i, st):
        return body(st)
    return jax.lax.fori_loop(0, 5, body2, st)
l5 = jax.jit(loop5)
s3 = jax.block_until_ready(l5(s))
log("[3] loop warm")
t0 = time.perf_counter()
s4 = jax.block_until_ready(l5(s3))
log(f"[3] loop5: {(time.perf_counter()-t0)/5*1e3:.1f} ms/iter")
with jax.profiler.trace('/tmp/jtrace_fused_loop'):
    s5 = jax.block_until_ready(l5(s4))
log("[4] loop traced")
