"""Kernel-A block-size sweep: per-program overheads amortize with lanes."""
import time
import jax, jax.numpy as jnp

log = lambda *a: print(*a, flush=True)
jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones(8)))
log("[0] device alive")

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
state0, _, _ = fused_step.make_pool_fused(scene, cam, env, key, cfg)
feats = intersect.ray_features_soa(state0.o, state0.d)
ap = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(1e-3)

for blk in (512, 1024, 2048):
    fused_step.A_BLOCK = blk
    tables = fused_step.build_tables(scene, env, cfg.env_mode)
    try:
        fA = jax.jit(lambda fr, t=tables: fused_step.trace_decode(
            scene, t, fr, ap, None))
        out = jax.block_until_ready(fA(feats))
        t0 = time.perf_counter()
        for _ in range(5):
            out = fA(feats)
        jax.block_until_ready(out)
        log(f"A_BLOCK={blk}: {(time.perf_counter()-t0)/5*1e3:.2f} ms")
    except Exception as e:
        log(f"A_BLOCK={blk}: FAILED {type(e).__name__} {str(e)[:200]}")
fused_step.A_BLOCK = 512
