"""Material shading tests — semantics from /root/reference/material.hpp."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_project_tpu.core import vecmath
from raytracer_project_tpu.models.scene import SceneBuilder
from raytracer_project_tpu.ops import intersect, shade


def _keys(key, n=1):
    from raytracer_project_tpu.core import rng as _rng
    return _rng.per_lane_keys(key, jnp.arange(n, dtype=jnp.int32))


def _hit_sphere(mat_fn, o=(0.0, 0.0, 5.0), d=(0.0, 0.0, -1.0)):
    b = SceneBuilder()
    mat = mat_fn(b)
    b.geometry.add_sphere((0.0, 0.0, 0.0), 1.0, mat)
    scene = b.build(with_bvh=False)
    o = jnp.asarray([list(o)])
    d = jnp.asarray([list(d)])
    hit = intersect.intersect_brute(scene, o, d, 1e-3)
    rec = intersect.make_record(scene, o, d, hit)
    return scene, rec, d


def test_lambertian(key):
    scene, rec, d = _hit_sphere(lambda b: b.materials.lambertian("m", (0.8, 0.1, 0.1)))
    sc = shade.scatter(scene, rec, d, _keys(key))
    assert bool(sc.scattered[0])
    np.testing.assert_allclose(sc.attenuation[0], [0.8, 0.1, 0.1], rtol=1e-6)
    np.testing.assert_allclose(sc.emitted[0], [0.0, 0.0, 0.0])
    # Scatter direction in the normal hemisphere (normal + unit vector).
    assert vecmath.dot(sc.direction, rec.normal)[0] > -1e-6
    # Origin offset along the normal (material.hpp:89).
    assert sc.origin[0, 2] > 1.0


def test_lambertian_cosine_law(key):
    # normal + random_unit_vector produces a cosine-weighted distribution.
    scene, rec, d = _hit_sphere(lambda b: b.materials.lambertian("m"))
    n = 4096
    rec_n = jax.tree.map(lambda x: jnp.repeat(x, n, axis=0), rec)
    d_n = jnp.repeat(d, n, axis=0)
    sc = shade.scatter(scene, rec_n, d_n, _keys(key, n))
    cos = np.asarray(vecmath.dot(vecmath.normalize(sc.direction), rec_n.normal))
    # E[cos theta] = 2/3 for pdf ~ cos.
    assert np.isclose(cos.mean(), 2.0 / 3.0, atol=0.02)


def test_metal_mirror(key):
    scene, rec, d = _hit_sphere(
        lambda b: b.materials.metal("m", (0.9, 0.9, 0.9), fuzz=0.0),
        o=(0.0, 2.0, 2.0), d=(0.0, -1.0, -1.0),
    )
    sc = shade.scatter(scene, rec, d, _keys(key))
    assert bool(sc.scattered[0])
    # Perfect mirror about the +z-ish normal at the hit point.
    unit_in = np.asarray(vecmath.normalize(d))[0]
    n = np.asarray(rec.normal)[0]
    expected = unit_in - 2 * np.dot(unit_in, n) * n
    np.testing.assert_allclose(
        np.asarray(vecmath.normalize(sc.direction))[0], expected, atol=1e-5
    )


def test_metal_absorb_below_surface():
    # With fuzz = 1 some scatters land below the surface -> scattered False
    # (material.hpp:150). Statistically check both outcomes occur.
    # Grazing hit near the silhouette so the fuzz lobe dips below the surface.
    scene, rec, d = _hit_sphere(lambda b: b.materials.metal("m", fuzz=1.0),
                                o=(0.97, 0.0, 5.0))
    n = 2048
    rec_n = jax.tree.map(lambda x: jnp.repeat(x, n, axis=0), rec)
    d_n = jnp.repeat(d, n, axis=0)
    sc = shade.scatter(scene, rec_n, d_n, _keys(jax.random.PRNGKey(3), n))
    frac = float(np.asarray(sc.scattered).mean())
    assert 0.5 < frac < 1.0


def test_dielectric_straight_through(key):
    scene, rec, d = _hit_sphere(lambda b: b.materials.dielectric("m", 1.5))
    sc = shade.scatter(scene, rec, d, _keys(key))
    assert bool(sc.scattered[0])
    dirn = np.asarray(vecmath.normalize(sc.direction))[0]
    # Normal incidence: refracts straight through or reflects straight back.
    assert abs(abs(dirn[2]) - 1.0) < 1e-5
    np.testing.assert_allclose(sc.attenuation[0], [1.0, 1.0, 1.0])


def test_dielectric_total_internal_reflection(key):
    # Exit hit (front_face False -> eta = 1.5) at grazing angle: must reflect.
    scene, rec, d = _hit_sphere(
        lambda b: b.materials.dielectric("m", 1.5),
        o=(0.9, 0.0, 0.0), d=(0.0, 1.0, 0.0),
    )
    assert not bool(rec.front_face[0])
    sin_theta = np.sqrt(1 - vecmath.dot(
        -vecmath.normalize(d), rec.normal
    )[0] ** 2)
    assert 1.5 * sin_theta > 1.0  # geometry sanity: beyond the critical angle
    sc = shade.scatter(scene, rec, d, _keys(key))
    # TIR keeps the ray inside: positive w.r.t. the (inward, front-face
    # flipped) shading normal, i.e. negative w.r.t. the outward normal.
    assert vecmath.dot(sc.direction, rec.normal)[0] > 0
    # And the reflection preserved the tangential component's sign.
    assert np.isclose(float(vecmath.length(sc.direction)[0]), 1.0, atol=1e-5)


def test_emissive(key):
    scene, rec, d = _hit_sphere(
        lambda b: b.materials.diffuse_light("m", (4.0, 2.0, 1.0))
    )
    sc = shade.scatter(scene, rec, d, _keys(key))
    assert not bool(sc.scattered[0])
    np.testing.assert_allclose(sc.emitted[0], [4.0, 2.0, 1.0])


def test_get_albedo_rules(key):
    for build, expected in [
        (lambda b: b.materials.lambertian("m", (0.3, 0.4, 0.5)), [0.3, 0.4, 0.5]),
        (lambda b: b.materials.dielectric("m", 1.5, (0.2, 0.2, 0.2)), [1.0, 1.0, 1.0]),
        (lambda b: b.materials.diffuse_light("m", (4.0, 0.5, 2.0)), [1.0, 0.5, 1.0]),
    ]:
        scene, rec, d = _hit_sphere(build)
        np.testing.assert_allclose(
            shade.get_albedo(scene, rec)[0], expected, rtol=1e-6
        )


def test_bump_mapping_perturbs_normal(key):
    def build(b):
        # 1024-wide so the 1/1024 finite-difference step crosses one texel.
        bump = b.textures.add_image(
            np.linspace(0, 1, 1024)[None, :, None].repeat(8, 0).repeat(3, 2)
        )
        return b.materials.lambertian("m", (0.5, 0.5, 0.5), bump_id=bump,
                                      bump_strength=50.0)

    scene, rec, d = _hit_sphere(build, o=(5.0, 0.0, 0.0), d=(-1.0, 0.0, 0.0))
    bumped = shade.bumped_normal(
        scene, rec,
        scene.materials.bump_id[rec.mat], scene.materials.bump_strength[rec.mat],
    )
    # Perturbed away from the geometric normal but still unit length.
    assert np.linalg.norm(np.asarray(bumped[0]) - np.asarray(rec.normal[0])) > 1e-3
    assert np.isclose(np.linalg.norm(np.asarray(bumped[0])), 1.0, atol=1e-5)


def test_bump_deltas_match_three_taps():
    """sample_bump_deltas == three nearest-neighbor height taps, bit-exact
    (wrap in u, clamp in v, multiple sizes, negative ids)."""
    import numpy as np
    from raytracer_project_tpu.models import textures as tex

    nprng = np.random.default_rng(0)
    b = tex.TextureBankBuilder()
    b.add_image(nprng.random((256, 256, 3)).astype(np.float32))
    b.add_image(nprng.random((64, 128, 3)).astype(np.float32))
    bank = b.pack()

    n = 5000
    u = jnp.asarray(nprng.random(n).astype(np.float32) * 2 - 0.5)
    v = jnp.asarray(nprng.random(n).astype(np.float32) * 1.4 - 0.2)
    tid = jnp.asarray(nprng.integers(-1, 2, n).astype(np.int32))
    p = jnp.zeros((n, 3), jnp.float32)
    delta = 1.0 / 1024.0
    black = jnp.zeros((n, 3))
    h_c = tex.sample(bank, tid, u, v, p, black)[:, 0]
    h_u = tex.sample(bank, tid, u + delta, v, p, black)[:, 0]
    h_v = tex.sample(bank, tid, u, v + delta, p, black)[:, 0]
    ref_fu = np.where(np.asarray(tid) >= 0, np.asarray(h_u - h_c), 0)
    ref_fv = np.where(np.asarray(tid) >= 0, np.asarray(h_v - h_c), 0)
    fu, fv = tex.sample_bump_deltas(bank, tid, u, v, delta)
    np.testing.assert_array_equal(np.asarray(fu), ref_fu)
    np.testing.assert_array_equal(np.asarray(fv), ref_fv)
