"""Large-scene intersector A/B on device: threaded BVH walk vs Pallas
brute chunk-cull scan, across scene sizes spanning the BVH crossover.

Evidence for the sub-linear-intersection claim (the reference's O(log N)
BVH, /root/reference/bvh.hpp:46-119, README.md:47-50) ON TPU, and data to
set intersect.BVH_MIN_PRIMS from measurement instead of assertion.

Run from the repo root on a TPU:  python - < tools/bench_bvh.py
Writes /tmp/bvh_ab.json with per-size timings.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_project_tpu.core.constants import T_MIN
from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import intersect, pallas_intersect, traverse

N_RAYS = 262_144


def rays_for(scene, n):
    """Primary rays (coherent) + one bounce of hemisphere scatter
    (incoherent half) — a realistic mixed workload."""
    cam = cam_mod.make_camera(image_width=1024, image_height=n // 1024,
                              vfov=30.0, lookfrom=(12.0, 2.5, 6.0),
                              lookat=(0.0, 1.0, 0.0))
    from raytracer_project_tpu.core import rng as rng_mod
    lr = rng_mod.lane_rng(jax.random.PRNGKey(0),
                         jnp.arange(n, dtype=jnp.uint32))
    o, d = cam_mod.generate_rays(cam, lr, jnp.arange(n, dtype=jnp.int32),
                                 1024)
    return o, d


def bench(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    results = []
    cases = (
        [("showcase", dict(grid=g, with_bvh=True, with_meshes=True))
         for g in (8, 15, 30, 45)]
        + [("funnel", dict(n_spheres=8192, mesh_detail=2)),
           ("funnel", dict(n_spheres=16384, mesh_detail=4))]
    )
    for kind, kw in cases:
        scene = (presets.showcase_scene(**kw) if kind == "showcase"
                 else presets.bvh_stress_scene(**kw))
        n_prims = int(scene.primitive_count)
        o, d = rays_for(scene, N_RAYS)
        jax.block_until_ready((o, d))

        f_bvh = jax.jit(lambda o, d: traverse.intersect_bvh(
            scene, o, d, T_MIN))
        f_brute = jax.jit(lambda o, d: pallas_intersect.intersect_brute_pallas(
            scene, o, d, T_MIN))

        t_bvh, h_bvh = bench(f_bvh, o, d)
        t_brute, h_brute = bench(f_brute, o, d)
        agree = float(jnp.mean(
            (h_bvh.hit == h_brute.hit)
            & (jnp.abs(jnp.where(h_bvh.hit, h_bvh.t, 0.0)
                       - jnp.where(h_brute.hit, h_brute.t, 0.0)) < 1e-3)))
        row = {
            "scene": f"{kind}:{kw}", "primitives": n_prims,
            "bvh_ms": t_bvh * 1e3, "pallas_brute_ms": t_brute * 1e3,
            "bvh_mrays_s": N_RAYS / t_bvh / 1e6,
            "brute_mrays_s": N_RAYS / t_brute / 1e6,
            "hit_agreement": agree,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    with open("/tmp/bvh_ab.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/bvh_ab.json", flush=True)


if __name__ == "__main__":
    main()
