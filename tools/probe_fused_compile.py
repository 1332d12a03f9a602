"""Probe which fused-step kernel's TPU compile OOMs the compile helper.

Usage: python tools/probe_fused_compile.py <stage>
  a1      pallas intersect kernel alone (scan_tables path)
  a2      trace_decode (A1 + decode kernel)
  b       shade_advance kernel alone
  step    one full fused body step (no while_loop)
  full    render_pool_fused (while_loop + everything)

Each stage AOT-lowers + compiles on the axon TPU backend (compiles are
server/helper-side and chipless, so this works even when the device
tunnel is flaky). Run each stage in its own subprocess under timeout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(stage: str):
    from raytracer_project_tpu.models import camera as cam_mod
    from raytracer_project_tpu.models import environment as env_mod
    from raytracer_project_tpu.models import presets
    from raytracer_project_tpu.ops import fused_step, integrator, intersect

    scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
    cam = cam_mod.make_camera(
        image_width=64, image_height=36, vfov=30.0,
        lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0),
        defocus_angle=0.0, focus_dist=10.0,
    )
    env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2),
                                   sun_intensity=6.0)
    cfg = integrator.RenderConfig(
        width=64, height=36, samples_per_pixel=2, max_depth=10,
        env_mode=env_mod.PHYSICAL_SUN,
        use_albedo=False, use_normal=False, use_z_depth=False,
        wavefront=True,
    )
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()}", flush=True)

    p = 4608  # 64*36*2 rounded to B_BLOCK? 4608 = 64*36*2; round:
    p = max(fused_step.B_BLOCK,
            -(-p // fused_step.B_BLOCK) * fused_step.B_BLOCK)
    print(f"stage={stage} p={p}", flush=True)
    o = tuple(jnp.ones((p,), jnp.float32) for _ in range(3))
    d = tuple(jnp.full((p,), 0.5, jnp.float32) for _ in range(3))
    tables = fused_step.build_tables(scene, env, cfg.env_mode)

    t0 = time.perf_counter()
    if stage == "a1":
        from raytracer_project_tpu.ops import pallas_intersect
        feats = intersect.ray_features_soa(o, d)
        fn = jax.jit(lambda f: pallas_intersect.intersect_brute_pallas_feats(
            scene, f, 1e-3))
        lowered = fn.lower(feats)
        compiled = lowered.compile()
    elif stage == "a2":
        feats = intersect.ray_features_soa(o, d)
        aparams = jnp.zeros((1, 8), jnp.float32)
        fn = jax.jit(lambda f, ap: fused_step.trace_decode(
            scene, tables, f, ap, None))
        lowered = fn.lower(feats, aparams)
        compiled = lowered.compile()
    elif stage == "b":
        rec = tuple(jnp.zeros((p,), jnp.float32)
                    for _ in range(fused_step._RO_ROWS))
        tex3 = tuple(jnp.zeros((p,), jnp.float32) for _ in range(3))
        bump2 = tuple(jnp.zeros((p,), jnp.float32) for _ in range(2))
        env3 = tuple(jnp.zeros((p,), jnp.float32) for _ in range(3))
        state = (tuple(jnp.zeros((p,), jnp.float32) for _ in range(12))
                 + (jnp.zeros((p,), jnp.int32),) * 4)
        state = state[0:12] + state[12:]
        iscal = jnp.zeros((1, 4), jnp.int32)
        fscal = jnp.zeros((1, 2), jnp.float32)
        bparams = jnp.zeros((1, fused_step._BP_COLS), jnp.float32)
        flat_state = (list(state[0:12]) + [jnp.zeros((p,), jnp.int32)] * 4)
        fn = jax.jit(lambda *a: fused_step.shade_advance(
            tables, a[0], a[1], a[2], a[3:3 + fused_step._RO_ROWS],
            a[3 + fused_step._RO_ROWS:6 + fused_step._RO_ROWS],
            a[6 + fused_step._RO_ROWS:8 + fused_step._RO_ROWS],
            a[8 + fused_step._RO_ROWS:11 + fused_step._RO_ROWS],
            a[11 + fused_step._RO_ROWS:],
            n_pixels=cfg.n_pixels, width=cfg.width,
            total_work=cfg.n_pixels * cfg.samples_per_pixel,
            max_depth=cfg.max_depth, env_mode=cfg.env_mode,
            spp=cfg.samples_per_pixel, aux=2, z_max=cfg.z_depth_max_dist,
            aovs=(), want_spec=False))
        args = ([iscal, fscal, bparams] + list(rec) + list(tex3)
                + list(bump2) + list(env3) + flat_state)
        lowered = fn.lower(*args)
        compiled = lowered.compile()
    elif stage == "step":
        state0, cond, body = fused_step.make_pool_fused(
            scene, cam, env, key, cfg)
        fn = jax.jit(body)
        lowered = fn.lower(state0)
        compiled = lowered.compile()
    elif stage == "full":
        fn = jax.jit(lambda k: fused_step.render_pool_fused(
            scene, cam, env, k, cfg))
        lowered = fn.lower(key)
        compiled = lowered.compile()
    else:
        raise SystemExit(f"unknown stage {stage}")
    dt = time.perf_counter() - t0
    print(f"COMPILE OK stage={stage} {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
