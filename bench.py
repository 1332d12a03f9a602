#!/usr/bin/env python
"""Benchmark driver: renders the showcase scene on the available accelerator
and reports throughput as one JSON line.

Metric: rays/s computed as width*height*spp*max_depth / wall_time — the same
upper-bound estimator the reference engine displays in its UI
(/root/reference/main.cpp:101-113) — so numbers are comparable in kind.
`vs_baseline` is value / 1e9, the BASELINE.md north-star target
(>1e9 rays/s on a v5e-16; this runs on however many chips are visible).
"""

import json
import os
import sys
import time

import jax

NORTH_STAR_RAYS_PER_S = 1.0e9


def main():
    import jax.numpy as jnp

    from raytracer_project_tpu.models import camera as cam_mod
    from raytracer_project_tpu.models import environment as env_mod
    from raytracer_project_tpu.models import presets
    from raytracer_project_tpu.ops import integrator

    width = int(os.environ.get("BENCH_WIDTH", 800))
    height = int(os.environ.get("BENCH_HEIGHT", 450))
    spp = int(os.environ.get("BENCH_SPP", 32))
    max_depth = int(os.environ.get("BENCH_DEPTH", 10))

    scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
    cfg = integrator.RenderConfig(
        width=width, height=height, samples_per_pixel=spp, max_depth=max_depth,
        env_mode=env_mod.PHYSICAL_SUN,
        use_albedo=False, use_normal=False, use_z_depth=False,
        # Pooled-wavefront scheduling (ops/wavefront.py): ~2.6x over the
        # lock-step wavefront on v5e (terminated lanes respawn immediately).
        wavefront=not os.environ.get("BENCH_NO_WAVEFRONT"),
    )
    cam = cam_mod.make_camera(
        image_width=width, image_height=height, vfov=30.0,
        lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0),
        defocus_angle=0.0, focus_dist=10.0,
    )
    env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2),
                                   sun_intensity=6.0)
    key = jax.random.PRNGKey(0)

    render = jax.jit(integrator.render, static_argnames="config")

    # Warmup / compile.
    out = render(scene, cam, env, key, cfg)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = render(scene, cam, env, jax.random.PRNGKey(1), cfg)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    rays = width * height * spp * max_depth
    rays_per_s = rays / dt
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
            "bvh": scene.bvh is not None,
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
