"""BVH property tests: traversal must agree with the brute-force oracle
(hittable_list.hpp:28-41 is the reference's oracle; intersect_brute here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_project_tpu.models.scene import SceneBuilder
from raytracer_project_tpu.ops import bvh as bvh_mod
from raytracer_project_tpu.ops import intersect, traverse


def _random_scene(rng, n_spheres=40, n_boxes=10, n_tris=20):
    b = SceneBuilder()
    mats = [b.materials.lambertian(f"m{i}", tuple(rng.random(3))) for i in range(4)]
    for _ in range(n_spheres):
        b.geometry.add_sphere(rng.uniform(-10, 10, 3), rng.uniform(0.2, 1.5),
                              mats[rng.integers(0, 4)])
    for _ in range(n_boxes):
        c = rng.uniform(-10, 10, 3)
        h = rng.uniform(0.2, 1.0, 3)
        b.geometry.add_box(c - h, c + h, mats[rng.integers(0, 4)])
    for _ in range(n_tris):
        v = rng.uniform(-10, 10, (3, 3))
        b.geometry.add_triangles([v[0]], [v[1]], [v[2]],
                                 mat_id=mats[rng.integers(0, 4)])
    return b.build(with_bvh=False)


def _random_rays(rng, n=256):
    o = jnp.asarray(rng.uniform(-15, 15, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    return o, d


@pytest.mark.parametrize("mode", ["sah", "median_random_axis"])
def test_bvh_matches_brute_oracle(rng, mode):
    scene = _random_scene(rng)
    scene = scene._replace(bvh=bvh_mod.build_bvh(scene, mode=mode))
    o, d = _random_rays(rng)

    brute = intersect.intersect_brute(scene, o, d, 1e-3)
    fast = traverse.intersect_bvh(scene, o, d, 1e-3)

    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(fast.hit))
    np.testing.assert_allclose(
        np.asarray(brute.t)[np.asarray(brute.hit)],
        np.asarray(fast.t)[np.asarray(fast.hit)],
        rtol=1e-5,
    )
    # Same primitive found (modulo exact ties, which are measure-zero here).
    hit = np.asarray(brute.hit)
    np.testing.assert_array_equal(
        np.asarray(brute.prim_type)[hit], np.asarray(fast.prim_type)[hit]
    )
    np.testing.assert_array_equal(
        np.asarray(brute.prim_idx)[hit], np.asarray(fast.prim_idx)[hit]
    )


def test_bvh_structure_invariants(rng):
    scene = _random_scene(rng, n_spheres=33, n_boxes=3, n_tris=7)
    bvh = bvh_mod.build_bvh(scene)
    nn = bvh.node_count
    escape = np.asarray(bvh.escape)
    first = np.asarray(bvh.first)
    count = np.asarray(bvh.count)
    level = np.asarray(bvh.node_level)

    # Escape links point forward (DFS order) or terminate.
    for i in range(nn):
        assert escape[i] == -1 or escape[i] > i
    # Root is node 0 at level 0 and escapes to -1.
    assert level[0] == 0 and escape[0] == -1
    # Every primitive appears in exactly one leaf slot.
    total = count.sum()
    assert total == bvh.prim_type.shape[0]
    leaves = count > 0
    slots = np.concatenate([
        np.arange(f, f + c) for f, c in zip(first[leaves], count[leaves])
    ])
    assert sorted(slots.tolist()) == list(range(total))
    # Leaf size bound respected.
    assert count.max() <= bvh.leaf_size
    # Child boxes are contained in parent boxes (DFS: child of i is i+1).
    mins = np.asarray(bvh.node_min)
    maxs = np.asarray(bvh.node_max)
    for i in range(nn):
        if count[i] == 0:  # internal: left child = i+1
            assert np.all(mins[i] <= mins[i + 1] + 1e-5)
            assert np.all(maxs[i] >= maxs[i + 1] - 1e-5)


def test_bvh_shrinks_interval(rng):
    # A wall of many spheres behind one near sphere: BVH must return the near
    # hit (t-max shrink semantics, bvh.hpp:113-118).
    b = SceneBuilder()
    m = b.materials.lambertian("m")
    b.geometry.add_sphere((0.0, 0.0, -2.0), 0.5, m)
    for i in range(-5, 6):
        for j in range(-5, 6):
            b.geometry.add_sphere((i * 0.3, j * 0.3, -20.0), 0.4, m)
    scene = b.build(with_bvh=True)
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = traverse.intersect_bvh(scene, o, d, 1e-3)
    assert np.isclose(hit.t[0], 1.5, atol=1e-5)


def test_bvh_through_render(key, rng):
    # Full render BVH vs brute gives identical images (same RNG stream).
    from raytracer_project_tpu.models import camera as cam_mod
    from raytracer_project_tpu.models import environment as env_mod
    from raytracer_project_tpu.ops import integrator

    scene_nb = _random_scene(rng, n_spheres=20, n_boxes=4, n_tris=0)
    scene_b = scene_nb._replace(bvh=bvh_mod.build_bvh(scene_nb))
    cfg = integrator.RenderConfig(width=16, height=9, samples_per_pixel=2,
                                  max_depth=4, env_mode=1 + 1)  # SOLID_COLOR
    cam = cam_mod.make_camera(image_width=16, image_height=9,
                              lookfrom=(0, 0, 30), lookat=(0, 0, 0), vfov=50)
    env = env_mod.make_environment(background_color=(0.7, 0.8, 1.0))
    img_nb = integrator.render(scene_nb, cam, env, key, cfg)["beauty"]
    img_b = integrator.render(scene_b, cam, env, key, cfg)["beauty"]
    np.testing.assert_allclose(np.asarray(img_nb), np.asarray(img_b),
                               rtol=1e-4, atol=1e-5)


def test_empty_scene_bvh(key):
    scene = SceneBuilder().build(with_bvh=True)
    o = jnp.zeros((4, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 4)
    hit = traverse.intersect_bvh(scene, o, d, 1e-3)
    assert not np.any(np.asarray(hit.hit))
