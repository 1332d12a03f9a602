"""Pallas closest-hit kernel (ops/pallas_intersect.py) vs the exact VPU
brute-force oracle, run in interpreter mode so the kernel logic (matmul
epilogues + per-ray chunk culling) is covered on CPU CI. The real-TPU
agreement of the compiled kernel is checked by bench tooling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_project_tpu.core.constants import T_MIN
from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models.scene import SceneBuilder
from raytracer_project_tpu.ops import intersect, pallas_intersect


def _scene(n_grid=6, tessellate=False):
    """Mixed sphere/box scene; tessellate=True keeps boxes as 12-triangle
    fans (the parked binned-pair kernel predates native boxes and only
    handles sphere/triangle tables)."""
    b = SceneBuilder()
    gray = b.materials.lambertian("gray", (0.5, 0.5, 0.5))
    red = b.materials.lambertian("red", (0.7, 0.2, 0.1))
    b.geometry.add_sphere((0.0, -1000.0, 0.0), 1000.0, gray)
    rng = np.random.default_rng(3)
    for i in range(n_grid):
        for j in range(n_grid):
            c = np.asarray((i - n_grid / 2 + 0.5, 0.4, j - n_grid / 2 + 0.5))
            if (i + j) % 2:
                b.geometry.add_sphere(c, 0.3, red)
            else:
                b.geometry.add_box(c - 1.0, c + 1.0, red,
                                   tessellate=tessellate)
    return b.build(with_bvh=False)


def _rays(scene, n=512):
    cam = cam_mod.make_camera(image_width=32, image_height=16, vfov=40.0,
                              lookfrom=(6.0, 3.0, 6.0), lookat=(0.0, 0.0, 0.0))
    ids = jnp.arange(n, dtype=jnp.int32)
    from raytracer_project_tpu.core import rng as rng_mod

    keys = rng_mod.per_lane_keys(jax.random.PRNGKey(0), ids)
    return cam_mod.generate_rays(cam, keys, ids, 32)


def test_pallas_interpret_matches_brute():
    scene = _scene()
    o, d = _rays(scene)
    ref = intersect.intersect_brute(scene, o, d, T_MIN)
    got = pallas_intersect.intersect_brute_pallas(scene, o, d, T_MIN,
                                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    both = np.asarray(got.hit & ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[both], np.asarray(ref.t)[both], rtol=2e-5, atol=1e-5
    )
    # Same winning primitive everywhere (no near-tie flips in this scene).
    assert (np.asarray(got.prim_idx)[both]
            == np.asarray(ref.prim_idx)[both]).mean() > 0.999
    assert (np.asarray(got.prim_type)[both]
            == np.asarray(ref.prim_type)[both]).mean() > 0.999


def test_pallas_interpret_secondary_rays():
    """Bounce-like rays: origins on surfaces, random directions — exercises
    the occlusion-aware per-ray chunk cull with tight best_t bounds.

    The kernel's contract is bit-identity with the XLA mm scan (same
    regrouped arithmetic); vs the classic brute kernel the mm formulation
    legitimately differs on self-intersection-epsilon-adjacent roots, so
    only hit flags are compared against it."""
    scene = _scene()
    o, d = _rays(scene)
    first = intersect.intersect_brute(scene, o, d, T_MIN)
    p = o + first.t[:, None] * d
    g = jax.random.normal(jax.random.PRNGKey(5), d.shape, jnp.float32)
    d2 = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    o2 = jnp.where(first.hit[:, None], p, o)
    ref = intersect.intersect_brute(scene, o2, d2, T_MIN)
    mm = intersect.intersect_brute_mm(scene, o2, d2, T_MIN)
    got = pallas_intersect.intersect_brute_pallas(scene, o2, d2, T_MIN,
                                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(mm.t))
    np.testing.assert_array_equal(np.asarray(got.prim_idx),
                                  np.asarray(mm.prim_idx))
    np.testing.assert_array_equal(np.asarray(got.prim_type),
                                  np.asarray(mm.prim_type))


def test_chunk_bounds_cover_primitives():
    """Every primitive's AABB is inside its chunk AABB (cull soundness)."""
    scene = _scene()
    mm = scene.mm
    from raytracer_project_tpu.ops.intersect import MM_FINE

    c = np.asarray(scene.spheres.center)
    r = np.asarray(scene.spheres.radius)
    sb = np.asarray(mm.sphere_bounds)
    for i in range(len(r)):
        if r[i] <= 0:
            continue
        k = i // MM_FINE
        assert (c[i] - r[i] >= sb[k, 0:3] - 1e-4).all()
        assert (c[i] + r[i] <= sb[k, 3:6] + 1e-4).all()

    v0 = np.asarray(scene.triangles.v0)
    v1 = v0 + np.asarray(scene.triangles.e1)
    v2 = v0 + np.asarray(scene.triangles.e2)
    tb = np.asarray(mm.tri_bounds)
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    for i in range(len(v0)):
        k = i // MM_FINE
        assert (lo[i] >= tb[k, 0:3] - 1e-4).all()
        assert (hi[i] <= tb[k, 3:6] + 1e-4).all()


