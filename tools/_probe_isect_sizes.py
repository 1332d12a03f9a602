"""A1 intersect kernel: BLOCK_RAYS x CHUNK_PRIMS sweep."""
import time
import jax, jax.numpy as jnp
log = lambda *a: print(*a, flush=True)
jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones(8)))
log("[0] device alive")
from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, fused_step, intersect
from raytracer_project_tpu.ops import pallas_intersect as pi

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

ref = None
for br, cp in ((512, 512), (1024, 512), (512, 1024), (1024, 1024),
               (2048, 512)):
    pi.BLOCK_RAYS, pi.CHUNK_PRIMS = br, cp
    try:
        f = jax.jit(lambda fr: pi.intersect_brute_pallas_feats(
            scene, fr, 1e-3))
        out = jax.block_until_ready(f(feats))
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(feats)
        jax.block_until_ready(out)
        if ref is None:
            ref = out
            ok = True
        else:
            ok = bool(jnp.array_equal(out.prim_idx, ref.prim_idx)
                      & jnp.allclose(out.t, ref.t, rtol=1e-5, atol=1e-5))
        log(f"[BR={br} CP={cp}] {(time.perf_counter()-t0)/5*1e3:.2f} ms agree={ok}")
    except Exception as e:
        log(f"[BR={br} CP={cp}] FAIL {type(e).__name__} {str(e)[:150]}")
pi.BLOCK_RAYS, pi.CHUNK_PRIMS = 512, 512
