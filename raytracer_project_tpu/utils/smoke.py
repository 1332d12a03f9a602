"""On-device smoke gate: fast fail for TPU kernel faults and hangs.

The CPU test suite runs Pallas kernels in interpret mode only, so a change
that compiles fine but faults or hangs on real TPU hardware sails through
CI (this is exactly what shipped in round 2: a scatter-add layout change
that hung a 128x72 @ 4 spp pooled render for >300 s while 110 CPU tests
stayed green). This module is the device gate:

  1. tiny pooled-wavefront render of the showcase scene — must finish and
     be finite/nonzero;
  2. compiled-Pallas vs MXU-matmul closest-hit agreement on real camera
     rays — identical hit sets and prim ids, t within f32 regroup noise.

Run it as ``python -m raytracer_project_tpu.utils.smoke`` (exits nonzero
with a diff on failure). ``bench.py`` shells out to it under a hard
subprocess timeout before timing anything: a hung device call cannot be
interrupted in-process, so the watchdog must sit one process up.

Reference analog: none — the reference has no automated tests
(/root/reference, SURVEY.md section 4); this replaces its interactive
eyeball-the-image verification loop with a scriptable device check.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def _fail(msg: str) -> int:
    print(f"SMOKE FAIL: {msg}", file=sys.stderr)
    return 1


def run_smoke() -> int:
    from ..models import camera as cam_mod
    from ..models import environment as env_mod
    from ..models import presets
    from ..ops import integrator, intersect

    scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
    cam = cam_mod.make_camera(
        image_width=128, image_height=72, vfov=30.0,
        lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0),
        defocus_angle=0.0, focus_dist=10.0,
    )
    env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2),
                                   sun_intensity=6.0)

    # --- 1. tiny pooled render -------------------------------------------
    cfg = integrator.RenderConfig(
        width=128, height=72, samples_per_pixel=4, max_depth=10,
        env_mode=env_mod.PHYSICAL_SUN,
        use_albedo=False, use_normal=False, use_z_depth=False,
        wavefront=True,
    )
    render = jax.jit(integrator.render, static_argnames="config")
    out = render(scene, cam, env, jax.random.PRNGKey(0), cfg)
    beauty = np.asarray(out["beauty"])
    if not np.isfinite(beauty).all():
        return _fail(f"pooled render produced non-finite pixels "
                     f"({np.count_nonzero(~np.isfinite(beauty))} bad values)")
    if beauty.max() <= 0.0:
        return _fail("pooled render is all-black")

    # --- 2. compiled Pallas vs MXU-matmul hit agreement ------------------
    # 512 real primary rays through the camera (not synthetic ones: real
    # rays exercise the chunk-cull bounds the way the integrator does).
    from ..core import rng as rng_mod
    n = 512
    px = jax.random.randint(jax.random.PRNGKey(7), (n,), 0, 128 * 72)
    lanes = rng_mod.lane_rng(jax.random.PRNGKey(8), px)
    o, d = cam_mod.generate_rays(cam, lanes, px, width=128)
    tmin = jnp.float32(1e-3)

    if jax.default_backend() == "tpu":
        from ..ops import pallas_intersect
        hit_p = jax.jit(
            lambda o, d: pallas_intersect.intersect_brute_pallas(
                scene, o, d, tmin))(o, d)
    else:
        # No device: still assert mm vs classic brute agreement so the
        # gate does *something* useful on CPU.
        hit_p = jax.jit(
            lambda o, d: intersect.intersect_brute(scene, o, d, tmin))(o, d)
    hit_mm = jax.jit(
        lambda o, d: intersect.intersect_brute_mm(scene, o, d, tmin))(o, d)

    hp, hm = np.asarray(hit_p.hit), np.asarray(hit_mm.hit)
    if not (hp == hm).all():
        bad = np.nonzero(hp != hm)[0][:8]
        return _fail(f"hit-set mismatch at rays {bad.tolist()} "
                     f"(pallas={hp[bad].tolist()} mm={hm[bad].tolist()})")
    both = hp & hm
    tp, tm = np.asarray(hit_p.t)[both], np.asarray(hit_mm.t)[both]
    if not np.allclose(tp, tm, rtol=2e-4, atol=2e-4):
        worst = int(np.argmax(np.abs(tp - tm)))
        return _fail(f"hit t mismatch: max |dt|={np.abs(tp - tm).max():.3e} "
                     f"(pallas={tp[worst]:.6f} mm={tm[worst]:.6f})")
    idp = np.asarray(hit_p.prim_idx)[both]
    idm = np.asarray(hit_mm.prim_idx)[both]
    typ = np.asarray(hit_p.prim_type)[both]
    tym = np.asarray(hit_mm.prim_type)[both]
    # Near-coincident surfaces may legitimately pick either prim when the
    # two t values tie at f32; only flag id mismatches whose t gap is real.
    id_bad = ((idp != idm) | (typ != tym)) & ~np.isclose(tp, tm, rtol=1e-5)
    if id_bad.any():
        bad = np.nonzero(id_bad)[0][:8]
        return _fail(f"prim-id mismatch at hit rays {bad.tolist()}")

    # --- 3. threaded BVH traversal on device (large scene) ----------------
    # The TPU dispatch prefers the Pallas scan at every size (it wins by
    # 300-600x on this backend, tools/bench_bvh.py), but the traversal
    # remains the CPU large-scene path and a product surface (debug viz,
    # traversal API) — gate its on-device correctness here regardless.
    big = presets.bvh_stress_scene(n_spheres=9000, with_bvh=True)
    assert big.bvh is not None
    cam2 = cam_mod.make_camera(image_width=128, image_height=72, vfov=35.0,
                               lookfrom=(5.0, 6.0, 6.0),
                               lookat=(5.0, 4.0, -12.0))
    o2, d2 = cam_mod.generate_rays(cam2, lanes, px, width=128)
    from ..ops import traverse
    hit_b = jax.jit(
        lambda o, d: traverse.intersect_bvh(big, o, d, tmin))(o2, d2)
    hit_o = jax.jit(
        lambda o, d: intersect.intersect_brute_mm(big, o, d, tmin))(o2, d2)
    hb, ho = np.asarray(hit_b.hit), np.asarray(hit_o.hit)
    if not (hb == ho).all():
        bad = np.nonzero(hb != ho)[0][:8]
        return _fail(f"BVH hit-set mismatch vs brute at rays {bad.tolist()}")
    tb = np.asarray(hit_b.t)[hb & ho]
    to = np.asarray(hit_o.t)[hb & ho]
    if not np.allclose(tb, to, rtol=2e-4, atol=2e-4):
        return _fail(f"BVH t mismatch: max |dt|={np.abs(tb - to).max():.3e}")

    print(f"SMOKE OK: backend={jax.default_backend()} "
          f"render mean={beauty.mean():.4f} hits={int(both.sum())}/{n} "
          f"bvh_hits={int((hb & ho).sum())}/{n}")
    return 0


def main() -> int:
    return run_smoke()


if __name__ == "__main__":
    sys.exit(main())
