"""zenith_native C++ runtime tests: BVH build parity with the Python
builder's contract, OBJ parse parity with the Python oracle parser, and PNG
writer validity. All skipped when no toolchain is available."""

import os
import struct
import zlib

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_project_tpu import native
from raytracer_project_tpu.models import obj as obj_mod
from raytracer_project_tpu.ops import bvh as bvh_mod
from raytracer_project_tpu.ops import intersect, traverse

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _random_scene(rng):
    from raytracer_project_tpu.models.scene import SceneBuilder

    b = SceneBuilder()
    m = b.materials.lambertian("m", (0.5, 0.5, 0.5))
    for _ in range(60):
        b.geometry.add_sphere(rng.uniform(-10, 10, 3),
                              rng.uniform(0.2, 1.5), m)
    for _ in range(15):
        c = rng.uniform(-10, 10, 3)
        h = rng.uniform(0.2, 1.0, 3)
        b.geometry.add_box(c - h, c + h, m)
    return b.build(with_bvh=False)


def test_native_bvh_matches_oracle(rng):
    """Native SAH tree must satisfy the traversal == brute-force property."""
    scene = _random_scene(rng)
    fbvh = bvh_mod.build_bvh(scene, use_native=True)
    scene = scene._replace(bvh=fbvh)
    o = jnp.asarray(rng.uniform(-15, 15, (256, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    brute = intersect.intersect_brute(scene, o, d, 1e-3)
    fast = traverse.intersect_bvh(scene, o, d, 1e-3)
    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(fast.hit))
    hit = np.asarray(brute.hit)
    np.testing.assert_allclose(
        np.asarray(brute.t)[hit], np.asarray(fast.t)[hit], rtol=1e-5
    )


def test_native_bvh_structure(rng):
    """Escape-link structural invariants: DFS layout, full leaf coverage."""
    c = rng.normal(0, 10, (500, 3)).astype(np.float32)
    r = rng.uniform(0.1, 0.5, 500).astype(np.float32)[:, None]
    res = native.build_bvh(c - r, c + r, leaf_size=8)
    assert res is not None
    assert sorted(res["leaf_order"].tolist()) == list(range(500))
    assert res["count"].sum() == 500
    assert res["max_leaf"] <= 8
    # Walk every node once following i+1 / escape; must terminate at -1.
    n = len(res["escape"])
    visited = 0
    i = 0
    while i >= 0 and visited <= n:
        visited += 1
        i = i + 1 if res["count"][i] == 0 else res["escape"][i]
        if i >= 0 and res["count"][i - 1] == 0 and i >= n:
            break
    assert visited <= n


_OBJ = """
# comment
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
vt 0 0
f 1/1/1 2/1/1 3/1/1
f 2//1 4//1 3//1
f -4 -3 -2
"""


def test_native_obj_matches_python(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(_OBJ)
    got = native.parse_obj(str(p))
    want = obj_mod.parse_obj(_OBJ)
    assert got["v0"].shape[0] == want.count
    np.testing.assert_allclose(got["v0"], want.v0)
    np.testing.assert_allclose(got["v1"], want.v1)
    np.testing.assert_allclose(got["v2"], want.v2)
    # Mixed normals: python treats has-normals per the first corner rule.
    assert (got["n0"] is not None) == (want.n0 is not None)
    if want.n0 is not None:
        np.testing.assert_allclose(got["n0"], want.n0)


def test_native_png_valid(tmp_path, rng):
    img = rng.integers(0, 255, (21, 37, 3)).astype(np.uint8)
    path = str(tmp_path / "out.png")
    assert native.write_png(path, img)
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat = 8, b""
    while pos < len(data):
        ln, tag = struct.unpack(">I4s", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + ln]
        crc = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])[0]
        assert crc == (zlib.crc32(tag + chunk) & 0xFFFFFFFF)
        if tag == b"IDAT":
            idat += chunk
        pos += 12 + ln
    raw = zlib.decompress(idat)
    dec = np.frombuffer(raw, np.uint8).reshape(21, 37 * 3 + 1)[:, 1:]
    np.testing.assert_array_equal(dec.reshape(21, 37, 3), img)


def test_native_obj_load_integration(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 2 0 0\nv 0 2 0\nf 1 2 3\n")
    mesh = obj_mod.load_obj(str(p))
    assert mesh is not None and mesh.count == 1
    assert obj_mod.load_obj(str(tmp_path / "missing.obj")) is None
