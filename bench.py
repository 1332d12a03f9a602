#!/usr/bin/env python
"""Benchmark driver: renders the showcase scene on the available accelerator
and reports throughput as one JSON line.

Headline metric (`value`): MEASURED rays/s — actual traced path segments
(the pooled wavefront's on-device counter, ops/wavefront.py) / wall_time.
`detail.rays_per_s_upper_bound` additionally reports the reference UI's
width*height*spp*max_depth / wall_time estimator
(/root/reference/main.cpp:101-113) for comparability in kind; the
reference cannot measure actual rays, and its estimator overstates
throughput by the spp*max_depth / segments ratio (~4x on the showcase).
`vs_baseline` is value / 1e9, the BASELINE.md north-star target
(>1e9 measured rays/s on a v5e-16; this runs on whatever chips are
visible). Falls back to the upper bound only when no segment counter
exists (non-wavefront runs).

Before timing anything, a smoke gate (raytracer_project_tpu/utils/smoke.py)
runs in a SUBPROCESS under a hard timeout: a hung or faulting device kernel
cannot be interrupted in-process, so the watchdog sits one process up. A
smoke failure makes the bench exit nonzero fast with the failure reason
instead of wedging for the driver's full timeout.
"""

import json
import os
import subprocess
import sys
import time

NORTH_STAR_RAYS_PER_S = 1.0e9
SMOKE_TIMEOUT_S = int(os.environ.get("BENCH_SMOKE_TIMEOUT", 420))


def try_smoke(extra_env: dict) -> tuple[bool, str]:
    """Run the on-device smoke in a subprocess; (ok, diagnostic tail).

    The smoke prints flushed per-stage heartbeats, so on a timeout the
    captured tail names the stage that wedged."""
    env = dict(os.environ, **extra_env)
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "raytracer_project_tpu.utils.smoke"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=SMOKE_TIMEOUT_S,
            env=env,
        )
    except subprocess.TimeoutExpired as e:
        out = e.stdout or b""
        tail = (out if isinstance(out, str) else
                out.decode("utf-8", "replace"))[-1500:]
        return False, (f"smoke timed out after {SMOKE_TIMEOUT_S}s "
                       f"(device hang); tail: {tail}")
    if proc.returncode != 0:
        return False, (f"smoke failed; stdout tail: {proc.stdout[-1000:]} "
                       f"stderr tail: {proc.stderr[-1000:]}")
    print(f"# {proc.stdout.strip()}", file=sys.stderr)
    return True, ""


def run_smoke_gate() -> str:
    """Smoke-gate with graceful degrade: if the default (fused-enabled)
    smoke fails, retry with the fused engine disabled and — if that
    passes — run the whole bench on the unfused pool instead of zeroing
    the round (reference analog: OIDN device->CPU retry,
    /root/reference/camera.hpp:586-593). Returns the engine mode:
    "fused" | "unfused_fallback"."""
    ok, why = try_smoke({})
    if ok:
        return "fused"
    print(f"# fused-path smoke failed: {why}", file=sys.stderr)
    print("# retrying with RAYTRACER_TPU_NO_FUSED=1", file=sys.stderr)
    ok2, why2 = try_smoke({"RAYTRACER_TPU_NO_FUSED": "1"})
    if ok2:
        os.environ["RAYTRACER_TPU_NO_FUSED"] = "1"
        return "unfused_fallback"
    print(json.dumps({
        "metric": "rays_per_second_showcase", "value": 0.0,
        "unit": "rays/s", "vs_baseline": 0.0,
        "error": f"smoke gate failed on BOTH engines. fused: {why}"[:1500],
        "error_unfused": why2[:1500],
    }))
    sys.exit(1)


def main():
    engine = "untested"
    if not os.environ.get("BENCH_SKIP_SMOKE"):
        engine = run_smoke_gate()
    if os.environ.get("RAYTRACER_TPU_NO_FUSED") and engine == "untested":
        engine = "unfused"

    import jax

    from raytracer_project_tpu.models import camera as cam_mod
    from raytracer_project_tpu.models import environment as env_mod
    from raytracer_project_tpu.models import presets
    from raytracer_project_tpu.ops import integrator

    width = int(os.environ.get("BENCH_WIDTH", 800))
    height = int(os.environ.get("BENCH_HEIGHT", 450))
    spp = int(os.environ.get("BENCH_SPP", 32))
    max_depth = int(os.environ.get("BENCH_DEPTH", 10))

    # BENCH_SCENE=funnel benches the 25k-primitive BVH stress world
    # (sub-linear-intersection evidence); default is the showcase.
    if os.environ.get("BENCH_SCENE") == "funnel":
        scene = presets.bvh_stress_scene(n_spheres=8192, mesh_detail=2)
    else:
        scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
    cfg = integrator.RenderConfig(
        width=width, height=height, samples_per_pixel=spp, max_depth=max_depth,
        env_mode=env_mod.PHYSICAL_SUN,
        use_albedo=False, use_normal=False, use_z_depth=False,
        # Pooled-wavefront scheduling (ops/wavefront.py): ~2.6x over the
        # lock-step wavefront on v5e (terminated lanes respawn immediately).
        wavefront=not os.environ.get("BENCH_NO_WAVEFRONT"),
    )
    if os.environ.get("BENCH_SCENE") == "funnel":
        cam = cam_mod.make_camera(
            image_width=width, image_height=height, vfov=35.0,
            lookfrom=(5.0, 6.0, 6.0), lookat=(5.0, 4.0, -12.0),
        )
    else:
        cam = cam_mod.make_camera(
            image_width=width, image_height=height, vfov=30.0,
            lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0),
            defocus_angle=0.0, focus_dist=10.0,
        )
    env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2),
                                   sun_intensity=6.0)
    key = jax.random.PRNGKey(0)

    render = jax.jit(integrator.render,
                     static_argnames=("config", "with_stats"))

    import numpy as np

    # Warmup / compile. np.asarray forces a host fetch: on the tunneled
    # axon backend block_until_ready can return before the dispatch has
    # even reached the device (observed 1 ms "waits" on 8 s renders), so
    # wall-clock timing must close the loop through a materialized result.
    out, stats = render(scene, cam, env, key, cfg, with_stats=True)
    np.asarray(out["beauty"])

    dt = float("inf")
    for rep in (1, 2):
        t0 = time.perf_counter()
        out, stats = render(scene, cam, env, jax.random.PRNGKey(rep), cfg,
                            with_stats=True)
        np.asarray(out["beauty"])
        dt = min(dt, time.perf_counter() - t0)

    rays = width * height * spp * max_depth
    upper_bound = rays / dt
    segments = (float(stats["segments"])
                if stats.get("segments") is not None else None)
    measured = (segments / dt) if segments else None
    rays_per_s = measured if measured is not None else upper_bound

    # Which closest-hit backend actually serves the hot path (mirrors the
    # dispatch in ops/intersect.py:intersect) — "bvh": true alone was
    # misleading when the prim count sat below the traversal crossover.
    from raytracer_project_tpu.ops import intersect as isect_mod
    hot_path = isect_mod.intersect_dispatch(scene, 1e-3)

    # Which integrator engine actually served (fused two-kernel step vs
    # unfused pooled wavefront), mirroring wavefront.render_pool's gate.
    if engine == "fused":
        from raytracer_project_tpu.ops import fused_step
        if fused_step.fused_spp_chunk(scene, cfg, env) <= 0 or (
                jax.default_backend() != "tpu"):
            engine = "unfused"

    # --- north-star configuration datapoint (BASELINE.md: 1080p @ 1k spp)
    # 1920x1080 rides the fused engine via spp chunks (the 2^24 work-id
    # cap admits 4 spp per chunk at 2.07M pixels — exercised here).
    # Measured at BENCH_1080P_SPP (default 32; 1024 would take ~12 min on
    # one v5e chip) with the wall for the full 1k spp projected from the
    # measured segment rate.
    hd = None
    if not os.environ.get("BENCH_SKIP_1080P"):
        import dataclasses

        hd_spp = int(os.environ.get("BENCH_1080P_SPP", 32))
        hd_cfg = dataclasses.replace(cfg, width=1920, height=1080,
                                     samples_per_pixel=hd_spp)
        hd_cam = cam_mod.make_camera(
            image_width=1920, image_height=1080, vfov=30.0,
            lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0),
            defocus_angle=0.0, focus_dist=10.0,
        )
        out_hd, st_hd = render(scene, hd_cam, env, key, hd_cfg,
                               with_stats=True)
        np.asarray(out_hd["beauty"])  # force materialization (compile)
        t0 = time.perf_counter()
        out_hd, st_hd = render(scene, hd_cam, env, jax.random.PRNGKey(3),
                               hd_cfg, with_stats=True)
        np.asarray(out_hd["beauty"])
        hd_dt = time.perf_counter() - t0
        hd_seg = (float(st_hd["segments"])
                  if st_hd.get("segments") is not None else None)
        hd_measured = (hd_seg / hd_dt) if hd_seg else None
        hd = {
            "width": 1920, "height": 1080, "spp": hd_spp,
            "wall_s": hd_dt,
            "rays_per_s_measured": hd_measured,
            "segments_traced": hd_seg,
            "projected_wall_s_at_1024spp": (hd_dt * 1024 / hd_spp),
        }

    print(json.dumps({
        "metric": "rays_per_second_showcase",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / NORTH_STAR_RAYS_PER_S,
        "detail": {
            "width": width, "height": height, "spp": spp,
            "max_depth": max_depth, "wall_s": dt,
            "primitives": int(scene.primitive_count),
            "devices": [str(d) for d in jax.devices()],
            "intersector": hot_path,
            "engine": engine,
            "rays_per_s_upper_bound": upper_bound,
            "rays_per_s_measured": measured,
            "segments_traced": segments,
            "pool_steps": (int(stats["steps"])
                           if stats.get("steps") is not None else None),
            "north_star_1080p": hd,
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
