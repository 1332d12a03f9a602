"""Ray-primitive intersection: branchless, batched, memory-bounded.

TPU-native equivalents of the reference's per-ray virtual hit() calls:
  sphere   /root/reference/sphere.hpp:18-64
  triangle /root/reference/triangle.hpp:17-82 (area method; here
           Möller-Trumbore, algebraically equivalent, two-sided)
  brute-force closest-hit loop /root/reference/hittable_list.hpp:28-41

The brute-force path (`intersect_brute`) is the *oracle* for BVH property
tests and the fallback for tiny scenes; it scans primitives in fixed-size
chunks with a running closest-hit so memory stays O(N_rays * CHUNK).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import vecmath
from ..core.constants import PI, T_MAX
from ..models.geometry import PRIM_SPHERE, PRIM_TRIANGLE
from ..models.scene import Scene

# Primitive chunk width for the brute-force scan (lane-aligned).
CHUNK = 128


class Hit(NamedTuple):
    """Closest-hit result for a ray batch (all [N])."""

    t: jax.Array          # f32 hit distance (T_MAX when miss)
    prim_type: jax.Array  # i32 PRIM_SPHERE / PRIM_TRIANGLE
    prim_idx: jax.Array   # i32 row in the per-type table
    hit: jax.Array        # bool


class HitRecord(NamedTuple):
    """Full shading record, gathered after the closest hit is known.

    Mirrors hit_record (/root/reference/hittable.hpp:9-26) in SoA form.
    """

    t: jax.Array           # f32[N]
    p: jax.Array           # f32[N,3]
    normal: jax.Array      # f32[N,3] front-face corrected
    tangent: jax.Array     # f32[N,3]
    bitangent: jax.Array   # f32[N,3]
    front_face: jax.Array  # bool[N]
    u: jax.Array           # f32[N]
    v: jax.Array           # f32[N]
    mat: jax.Array         # i32[N]
    hit: jax.Array         # bool[N]


# ---------------------------------------------------------------------------
# Primitive tests (candidate t for a [N, C] ray-x-prim block)
# ---------------------------------------------------------------------------

def sphere_candidate_t(center, radius, o, d, tmin, tmax):
    """Nearest valid root of the sphere quadratic (sphere.hpp:18-39).

    center f32[C,3], radius f32[C]; o, d f32[N,3]; returns t f32[N,C]
    (T_MAX where invalid).
    """
    oc = center[None, :, :] - o[:, None, :]           # [N,C,3]
    a = vecmath.length_squared(d)[:, None]            # [N,1]
    h = jnp.sum(oc * d[:, None, :], axis=-1)          # [N,C]
    c = jnp.sum(oc * oc, axis=-1) - (radius * radius)[None, :]
    disc = h * h - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / a
    root0 = (h - sq) * inv_a
    root1 = (h + sq) * inv_a
    ok0 = (root0 > tmin[:, None]) & (root0 < tmax[:, None])
    ok1 = (root1 > tmin[:, None]) & (root1 < tmax[:, None])
    root = jnp.where(ok0, root0, root1)
    valid = (disc >= 0.0) & (ok0 | ok1) & (radius[None, :] > 0.0)
    return jnp.where(valid, root, T_MAX)


def triangle_candidate_t(v0, e1, e2, o, d, tmin, tmax):
    """Möller-Trumbore, two-sided (same hit set as triangle.hpp:17-82).

    v0/e1/e2 f32[C,3]; o, d f32[N,3]; returns t f32[N,C] (T_MAX invalid).
    """
    d_b = d[:, None, :]                                # [N,1,3]
    pvec = jnp.cross(d_b, e2[None, :, :])              # [N,C,3]
    det = jnp.sum(e1[None, :, :] * pvec, axis=-1)      # [N,C]
    # Degenerate/parallel guard (triangle.hpp:25,34).
    near_zero = jnp.abs(det) < 1e-12
    inv_det = 1.0 / jnp.where(near_zero, 1.0, det)
    tvec = o[:, None, :] - v0[None, :, :]              # [N,C,3]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(d_b * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    valid = (
        ~near_zero
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin[:, None])
        & (t < tmax[:, None])
    )
    return jnp.where(valid, t, T_MAX)


# ---------------------------------------------------------------------------
# Brute-force closest hit (the oracle)
# ---------------------------------------------------------------------------

def _pad_rows(x, n):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg)


def _scan_chunks(candidate_fn, table_cols, n_rows, o, d, tmin, best_t, best_idx):
    """Running closest-hit over primitive chunks via lax.scan."""
    n_chunks = -(-n_rows // CHUNK)
    padded = n_chunks * CHUNK
    cols = [_pad_rows(c, padded) for c in table_cols]
    chunked = [c.reshape((n_chunks, CHUNK) + c.shape[1:]) for c in cols]
    base_ids = jnp.arange(CHUNK, dtype=jnp.int32)
    row_valid_template = jnp.arange(CHUNK)

    def body(carry, chunk):
        best_t, best_idx = carry
        cols_c, chunk_i = chunk
        t = candidate_fn(*cols_c, o, d, tmin, best_t)
        # Mask padding rows.
        rows = chunk_i * CHUNK + row_valid_template
        t = jnp.where((rows < n_rows)[None, :], t, T_MAX)
        cmin = jnp.min(t, axis=1)
        carg = jnp.argmin(t, axis=1).astype(jnp.int32)
        better = cmin < best_t
        best_t = jnp.where(better, cmin, best_t)
        best_idx = jnp.where(better, chunk_i * CHUNK + carg, best_idx)
        return (best_t, best_idx), None

    (best_t, best_idx), _ = jax.lax.scan(
        body,
        (best_t, best_idx),
        (tuple(chunked), jnp.arange(n_chunks, dtype=jnp.int32)),
    )
    return best_t, best_idx


def intersect_brute(scene: Scene, o, d, tmin, tmax=None) -> Hit:
    """Closest hit over all primitives, linear scan (hittable_list.hpp:28-41).

    o, d f32[N,3]; tmin f32[N] or scalar. Returns Hit of [N] columns.
    """
    n = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    init_t = jnp.full((n,), T_MAX if tmax is None else tmax, jnp.float32)
    init_idx = jnp.zeros((n,), jnp.int32)

    sph = scene.spheres
    s_t, s_idx = _scan_chunks(
        sphere_candidate_t, [sph.center, sph.radius], sph.count,
        o, d, tmin, init_t, init_idx,
    )
    tri = scene.triangles
    t_t, t_idx = _scan_chunks(
        triangle_candidate_t, [tri.v0, tri.e1, tri.e2], tri.count,
        o, d, tmin, s_t, s_idx,
    )
    # After the second scan, best_t <= s_t; triangle wins where it improved.
    tri_won = t_t < s_t
    return Hit(
        t=t_t,
        prim_type=jnp.where(tri_won, PRIM_TRIANGLE, PRIM_SPHERE).astype(jnp.int32),
        prim_idx=jnp.where(tri_won, t_idx, s_idx),
        hit=t_t < T_MAX,
    )


# Below this primitive count the chunked brute-force scan beats BVH
# traversal on TPU: the scan is pure broadcast arithmetic (VPU
# speed-of-light, zero gathers), while the lock-step BVH walk pays ~1 ms of
# slow TPU gather per node step. Measured crossover on v5e is O(10^4) prims.
BVH_MIN_PRIMS = 8192


def intersect(scene: Scene, o, d, tmin) -> Hit:
    """Closest hit: brute scan for small scenes, threaded BVH for large."""
    if scene.bvh is not None and scene.primitive_count >= BVH_MIN_PRIMS:
        from . import traverse

        return traverse.intersect_bvh(scene, o, d, tmin)
    return intersect_brute(scene, o, d, tmin)


# ---------------------------------------------------------------------------
# Deferred hit-record construction
# ---------------------------------------------------------------------------

def _sphere_record(scene: Scene, o, d, t, idx):
    """Sphere shading data (sphere.hpp:40-59)."""
    center = scene.spheres.center[idx]
    radius = scene.spheres.radius[idx]
    p = o + t[:, None] * d
    outward = (p - center) / jnp.maximum(radius, 1e-12)[:, None]
    front = vecmath.dot(d, outward) < 0.0
    normal = jnp.where(front[:, None], outward, -outward)

    # Spherical UV from the *outward* normal (sphere.hpp:70-79).
    theta = jnp.arccos(jnp.clip(-outward[:, 1], -1.0, 1.0))
    phi = jnp.arctan2(-outward[:, 2], outward[:, 0]) + PI
    u = phi / (2.0 * PI)
    v = theta / PI

    # Tangent frame from world-up with pole fallback (sphere.hpp:50-59).
    world_up = jnp.asarray([0.0, 1.0, 0.0])
    alt = jnp.asarray([0.0, 0.0, 1.0])
    tangent = jnp.cross(jnp.broadcast_to(world_up, normal.shape), normal)
    degenerate = vecmath.length_squared(tangent) < 1e-3
    tangent = jnp.where(
        degenerate[:, None],
        jnp.cross(jnp.broadcast_to(alt, normal.shape), normal),
        tangent,
    )
    tangent = vecmath.normalize(tangent)
    bitangent = jnp.cross(normal, tangent)
    return p, normal, tangent, bitangent, front, u, v, scene.spheres.mat[idx]


def _triangle_record(scene: Scene, o, d, t, idx):
    """Triangle shading data: barycentric-smooth normal (triangle.hpp:56-79)
    + interpolated UVs and the face tangent frame (cube faces)."""
    tr = scene.triangles
    v0, e1, e2 = tr.v0[idx], tr.e1[idx], tr.e2[idx]
    p = o + t[:, None] * d

    geo_n = jnp.cross(e1, e2)
    area_sq = jnp.maximum(vecmath.length_squared(geo_n), 1e-24)
    # Barycentric weights of p (u weights v1, v weights v2; triangle.hpp:66-70).
    rel = p - v0
    c0 = jnp.cross(e1, rel)
    c2 = jnp.cross(rel, e2)
    u = vecmath.dot(geo_n, c2) / area_sq
    v = vecmath.dot(geo_n, c0) / area_sq
    w = 1.0 - u - v

    smooth = vecmath.normalize(
        w[:, None] * tr.n0[idx] + u[:, None] * tr.n1[idx] + v[:, None] * tr.n2[idx]
    )
    front = vecmath.dot(d, smooth) < 0.0
    normal = jnp.where(front[:, None], smooth, -smooth)

    uv = w[:, None] * tr.uv0[idx] + u[:, None] * tr.uv1[idx] + v[:, None] * tr.uv2[idx]
    tangent = tr.tangent[idx]
    bitangent = jnp.cross(normal, tangent)
    return p, normal, tangent, bitangent, front, uv[:, 0], uv[:, 1], tr.mat[idx]


def make_record(scene: Scene, o, d, hit: Hit) -> HitRecord:
    """Gather full shading data for the closest hits (deferred shading)."""
    idx = hit.prim_idx
    sp = _sphere_record(scene, o, d, hit.t, jnp.clip(idx, 0, scene.spheres.count - 1))
    tp = _triangle_record(scene, o, d, hit.t, jnp.clip(idx, 0, scene.triangles.count - 1))

    is_tri = (hit.prim_type == PRIM_TRIANGLE)
    sel = lambda a, b: jnp.where(
        is_tri[:, None] if a.ndim == 2 else is_tri, b, a
    )
    p, normal, tangent, bitangent = (sel(sp[i], tp[i]) for i in range(4))
    front = jnp.where(is_tri, tp[4], sp[4])
    u = jnp.where(is_tri, tp[5], sp[5])
    v = jnp.where(is_tri, tp[6], sp[6])
    mat = jnp.where(is_tri, tp[7], sp[7])
    return HitRecord(
        t=hit.t, p=p, normal=normal, tangent=tangent, bitangent=bitangent,
        front_face=front, u=u, v=v, mat=mat, hit=hit.hit,
    )
