"""Pool-size scaling: step time vs lanes."""
import time, sys
import jax, jax.numpy as jnp
from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, wavefront

W, H, SPP = 800, 450, 32
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2), sun_intensity=6.0)
key = jax.random.PRNGKey(0)
pixel_ids = jnp.arange(W * H, dtype=jnp.int32)

for lanes in [262_144, 524_288, 1_048_576]:
    cfg = integrator.RenderConfig(width=W, height=H, samples_per_pixel=SPP,
        max_depth=10, env_mode=env_mod.PHYSICAL_SUN,
        use_albedo=False, use_normal=False, use_z_depth=False, wavefront=True,
        pool_lanes=lanes)
    state0, cond, body = wavefront.make_pool(scene, cam, env, key, cfg, pixel_ids,
                                             pool_lanes=lanes)
    step = jax.jit(body)
    s = jax.block_until_ready(step(step(state0)))
    t0 = time.perf_counter()
    for _ in range(5): s = step(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter()-t0)/5
    print(f"lanes {lanes:9d}: {dt*1e3:8.2f} ms/step  {lanes/dt/1e6:8.1f} Mlanes/s", flush=True)
