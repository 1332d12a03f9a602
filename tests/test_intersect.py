"""Intersection unit/property tests — golden values from the quadratic and
Möller-Trumbore closed forms (sphere.hpp:18-64, triangle.hpp:17-82)."""

import jax.numpy as jnp
import numpy as np

from raytracer_project_tpu.models.geometry import PRIM_SPHERE, PRIM_TRIANGLE
from raytracer_project_tpu.models.scene import SceneBuilder
from raytracer_project_tpu.ops import intersect


def _simple_scene(**kw):
    b = SceneBuilder()
    mat = b.materials.lambertian("m", (0.5, 0.5, 0.5))
    for args in kw.get("spheres", []):
        b.geometry.add_sphere(*args, mat)
    for tri in kw.get("triangles", []):
        b.geometry.add_triangles(*tri, mat_id=mat)
    return b.build(with_bvh=False)


def test_sphere_hit_golden():
    # Unit sphere at origin, ray from z=5 looking down -z: t = 4.
    scene = _simple_scene(spheres=[((0.0, 0.0, 0.0), 1.0)])
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    assert bool(hit.hit[0])
    assert np.isclose(hit.t[0], 4.0, atol=1e-5)
    assert hit.prim_type[0] == PRIM_SPHERE


def test_sphere_inside_hit_far_root():
    # Origin inside the sphere: nearest root is negative, far root = 1.
    scene = _simple_scene(spheres=[((0.0, 0.0, 0.0), 1.0)])
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    assert bool(hit.hit[0])
    assert np.isclose(hit.t[0], 1.0, atol=1e-5)


def test_sphere_miss():
    scene = _simple_scene(spheres=[((0.0, 0.0, 0.0), 1.0)])
    o = jnp.asarray([[0.0, 5.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    assert not bool(hit.hit[0])


def test_unnormalized_direction():
    # t scales inversely with |d| (reference never normalizes camera rays).
    scene = _simple_scene(spheres=[((0.0, 0.0, 0.0), 1.0)])
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -2.0]])
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    assert np.isclose(hit.t[0], 2.0, atol=1e-5)


def test_triangle_hit_and_miss():
    tri = ([[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]], [[0.0, 1.0, 0.0]])
    scene = _simple_scene(triangles=[tri])
    o = jnp.asarray([[0.2, 0.2, 3.0], [0.9, 0.9, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    assert bool(hit.hit[0]) and np.isclose(hit.t[0], 3.0, atol=1e-5)
    assert hit.prim_type[0] == PRIM_TRIANGLE
    assert not bool(hit.hit[1])  # outside the hypotenuse


def test_triangle_two_sided():
    tri = ([[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]], [[0.0, 1.0, 0.0]])
    scene = _simple_scene(triangles=[tri])
    o = jnp.asarray([[0.2, 0.2, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    assert bool(hit.hit[0])


def test_closest_of_many():
    scene = _simple_scene(
        spheres=[((0.0, 0.0, -10.0), 1.0), ((0.0, 0.0, -5.0), 1.0),
                 ((0.0, 0.0, -20.0), 1.0)]
    )
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    assert np.isclose(hit.t[0], 4.0, atol=1e-5)
    # Table rows are Morton-ordered at pack time; resolve the winner by its
    # geometry, not its insertion index.
    np.testing.assert_allclose(
        np.asarray(scene.spheres.center)[int(hit.prim_idx[0])],
        [0.0, 0.0, -5.0], atol=1e-6,
    )


def test_record_sphere_normals_and_uv():
    scene = _simple_scene(spheres=[((0.0, 0.0, 0.0), 1.0)])
    o = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    rec = intersect.make_record(scene, o, d, hit)
    # Outside hit: front face, outward normal +z.
    assert bool(rec.front_face[0])
    np.testing.assert_allclose(rec.normal[0], [0.0, 0.0, 1.0], atol=1e-5)
    # Inside hit: back face, normal flipped toward the ray origin.
    assert not bool(rec.front_face[1])
    np.testing.assert_allclose(rec.normal[1], [0.0, 0.0, 1.0], atol=1e-5)
    # UV at +z point: phi = atan2(-1, 0) + pi = pi/2 -> u = 0.25;
    # theta = acos(0) -> v = 0.5 (sphere.hpp:70-79).
    assert np.isclose(rec.u[0], 0.25, atol=1e-5)
    assert np.isclose(rec.v[0], 0.5, atol=1e-5)


def test_record_triangle_smooth_normal():
    # Vertex normals tilted: interpolation at centroid = average direction.
    tri = dict(
        v0=[[0.0, 0.0, 0.0]], v1=[[1.0, 0.0, 0.0]], v2=[[0.0, 1.0, 0.0]],
        n0=[[0.0, 0.0, 1.0]], n1=[[1.0, 0.0, 1.0]], n2=[[0.0, 1.0, 1.0]],
    )
    b = SceneBuilder()
    mat = b.materials.lambertian("m")
    b.geometry.add_triangles(**tri, mat_id=mat)
    scene = b.build(with_bvh=False)
    o = jnp.asarray([[1 / 3, 1 / 3, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    rec = intersect.make_record(scene, o, d, hit)
    expected = np.asarray([1 / 3, 1 / 3, 1.0])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(rec.normal[0], expected, atol=1e-4)


def test_box_native_world_hits():
    b = SceneBuilder()
    mat = b.materials.lambertian("m")
    b.geometry.add_box((-1, -1, -1), (1, 1, 1), mat)
    scene = b.build(with_bvh=False)
    assert scene.boxes.count == 1          # native affine-slab box
    assert scene.triangles.count == 1      # dummy row only
    o = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    # Outside: entry face at t=4. Inside: exit face at t=1 (correct exit,
    # unlike the reference cube's t=tmin quirk, cube.hpp:47-73).
    assert np.isclose(hit.t[0], 4.0, atol=1e-5)
    assert np.isclose(hit.t[1], 1.0, atol=1e-5)


def test_box_native_matches_tessellated():
    """The native affine-slab box must reproduce the 12-triangle box: same
    hit set, same t, same shading frame (normal/UV/tangent), for random
    rays against a rotated+scaled box."""
    rng = np.random.default_rng(5)
    from raytracer_project_tpu.models import geometry as geo

    xform = geo.compose(
        geo.translate((0.5, 1.0, -0.3)),
        geo.rotate_y(37.0),
        geo.rotate_x(12.0),
        geo.scale((1.5, 0.7, 1.1)),
    )

    def build(tessellate):
        b = SceneBuilder()
        mat = b.materials.lambertian("m")
        b.geometry.add_box((-0.4, -0.2, -0.6), (0.4, 0.2, 0.6), mat,
                           transform=xform, tessellate=tessellate)
        return b.build(with_bvh=False)

    s_box = build(False)
    s_tri = build(True)
    n = 256
    o = jnp.asarray(rng.normal(0, 3, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
    hb = intersect.intersect_brute(s_box, o, d, 1e-3)
    ht = intersect.intersect_brute(s_tri, o, d, 1e-3)
    # Rays through face seams may differ at float edge cases; demand > 95%
    # agreement and exact-f32-tolerance t on the agreeing set.
    agree = np.asarray(hb.hit) == np.asarray(ht.hit)
    assert agree.mean() > 0.95
    m = np.asarray(hb.hit) & np.asarray(ht.hit)
    np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(ht.t)[m],
                               rtol=1e-4, atol=1e-4)
    rb = intersect.make_record(s_box, o, d, hb)
    rt = intersect.make_record(s_tri, o, d, ht)
    np.testing.assert_allclose(np.asarray(rb.normal)[m],
                               np.asarray(rt.normal)[m], atol=2e-3)
    np.testing.assert_allclose(np.asarray(rb.u)[m], np.asarray(rt.u)[m],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(rb.v)[m], np.asarray(rt.v)[m],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(rb.tangent)[m],
                               np.asarray(rt.tangent)[m], atol=2e-3)


def test_degenerate_dummies_never_hit():
    scene = _simple_scene()  # only dummy rows
    o = jnp.zeros((4, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 4)
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    assert not np.any(hit.hit)


def test_mm_matches_classic_brute(rng):
    """The MXU matmul formulation must agree with the classic candidate
    kernels: identical hit set / winning primitive, t to f32 regrouping
    tolerance (intersect_brute is the oracle, hittable_list.hpp:28-41)."""
    from raytracer_project_tpu.models import presets

    scene = presets.showcase_scene(with_bvh=False, with_meshes=True)
    assert scene.mm is not None
    n = 512
    o = jnp.asarray(rng.normal(0, 8, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
    h1 = intersect.intersect_brute(scene, o, d, 1e-3)
    h2 = intersect.intersect_brute_mm(scene, o, d, 1e-3)
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    m = np.asarray(h1.hit)
    np.testing.assert_array_equal(
        np.asarray(h1.prim_type)[m], np.asarray(h2.prim_type)[m]
    )
    np.testing.assert_allclose(
        np.asarray(h1.t)[m], np.asarray(h2.t)[m], rtol=5e-3
    )


# --- SPLITK f32 matmul emulation (intersect.splitk_*) ----------------------

def test_split3_bf16_reconstruction_exact():
    """hi + mid + lo == x exactly for f32 inputs across magnitudes
    (24-bit mantissa = 3 x 8-bit bf16 digits)."""
    rng = np.random.default_rng(11)
    x = np.concatenate([
        (rng.normal(size=2048) * np.exp(rng.normal(size=2048) * 8)
         ).astype(np.float32),
        np.asarray([0.0, -0.0, 1.0, -1.0, 1e30, -1e30, 1e-30, 3.0,
                    np.float32(2 ** 24 - 1), 1e6], np.float32),
    ])
    hi, mid, lo = intersect.split3_bf16(jnp.asarray(x))
    recon = (np.asarray(hi, np.float64) + np.asarray(mid, np.float64)
             + np.asarray(lo, np.float64))
    np.testing.assert_array_equal(recon.astype(np.float32), x)


def test_splitk_dot_matches_highest_product_set():
    """splitk_dot carries exactly HIGHEST's six product groups: against
    the f64 sum of those six digit products it is accurate to f32
    rounding, and it beats a single-pass bf16 dot by orders of
    magnitude."""
    rng = np.random.default_rng(12)
    feats = (rng.normal(size=(64, intersect.RAY_FEATURE_DIM))
             * np.exp(rng.normal(size=(64, 1)) * 3)).astype(np.float32)
    coeff = (rng.normal(size=(intersect.RAY_FEATURE_DIM, 1, 256))
             * np.exp(rng.normal(size=(1, 1, 256)) * 3)).astype(np.float32)
    fk = intersect.splitk_feats(jnp.asarray(feats))
    ck = intersect.splitk_pack_coeff(jnp.asarray(coeff))
    got = np.asarray(intersect.splitk_dot(fk, ck.reshape(ck.shape[0], -1)))

    # f64 reference over the SAME six digit-product groups.
    f = intersect.RAY_FEATURE_DIM
    fk64 = np.asarray(fk, np.float64)
    ck64 = np.asarray(ck.reshape(ck.shape[0], -1), np.float64)
    ref = fk64 @ ck64
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-20)
    # Tolerance: f32 accumulation of 96 products (not exact, but tight).
    assert np.median(rel) < 1e-6
    assert (rel < 1e-4).mean() > 0.999

    # The full-precision reference (all products, f64 on unsplit f32).
    full = (feats.astype(np.float64)
            @ coeff.reshape(f, -1).astype(np.float64))
    err_splitk = np.abs(got - full)
    bf16_1pass = (np.asarray(jnp.asarray(feats, jnp.bfloat16), np.float64)
                  @ np.asarray(jnp.asarray(coeff.reshape(f, -1),
                                           jnp.bfloat16), np.float64))
    err_default = np.abs(bf16_1pass - full)
    # splitk error is ~1e-5x default's on non-degenerate entries
    # (measured median ratio 1.1e-5; assert a 10x-safe bound).
    scale = np.abs(full) + 1e-20
    assert np.median(err_splitk / scale) < 1e-4 * np.median(
        err_default / scale)


def test_splitk_pack_rows_onehot_fetch_bit_exact():
    """A one-hot fetch through the digit-split row table reconstructs
    every stored f32 bit-exactly (the decode kernel's contract)."""
    rng = np.random.default_rng(13)
    table = (rng.normal(size=(12, 64))
             * np.exp(rng.normal(size=(12, 64)) * 6)).astype(np.float32)
    packed = intersect.splitk_pack_rows(jnp.asarray(table))  # [36, 64]
    idx = rng.integers(0, 64, size=40)
    onehot = jnp.asarray(
        (np.arange(64)[:, None] == idx[None, :]), jnp.bfloat16)
    prod = jnp.dot(packed, onehot, preferred_element_type=jnp.float32)
    cols = 12
    fetched = np.asarray((prod[0:cols] + prod[cols:2 * cols])
                         + prod[2 * cols:3 * cols])
    np.testing.assert_array_equal(fetched, table[:, idx])
