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

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core import soa, vecmath
from ..core.constants import PI, T_MAX
from ..models.geometry import PRIM_BOX, PRIM_SPHERE, PRIM_TRIANGLE
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
    sq = vecmath.safe_sqrt(disc)  # grad-safe at miss lanes (disc <= 0)
    inv_a = 1.0 / a
    root0 = (h - sq) * inv_a
    root1 = (h + sq) * inv_a
    ok0 = (root0 > tmin[:, None]) & (root0 < tmax[:, None])
    ok1 = (root1 > tmin[:, None]) & (root1 < tmax[:, None])
    root = jnp.where(ok0, root0, root1)
    valid = (disc >= 0.0) & (ok0 | ok1) & (radius[None, :] > 0.0)
    return jnp.where(valid, root, T_MAX)


def box_candidate_t(minv, trans, o, d, tmin, tmax):
    """Affine-slab box test against the canonical [-1,1]^3 cube
    (cube.hpp:44-86 in the box's local frame).

    minv f32[C,9] (world->local linear part, row-major), trans f32[C,3];
    o, d f32[N,3]; returns t f32[N,C] (T_MAX where invalid). Two-sided:
    entering hit at slab t_near when t_near > tmin, else the exit hit
    (matching the triangle-tessellated box, which reports the true exit
    intersection for interior origins — see models/geometry.py docstring).
    """
    m = minv.reshape(-1, 3, 3)                               # [C,3,3]
    o_l = jnp.einsum("cij,nj->nci", m, o) + trans[None]      # [N,C,3]
    d_l = jnp.einsum("cij,nj->nci", m, d)                    # [N,C,3]
    # Safe inverse: ~zero components get a huge positive inverse; the slab
    # arithmetic then resolves the parallel-ray cases correctly (inside the
    # slab -> +-huge bracket, outside -> empty interval).
    inv = 1.0 / jnp.where(jnp.abs(d_l) < 1e-30, 1e-30, d_l)
    t0 = (-1.0 - o_l) * inv
    t1 = (1.0 - o_l) * inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)           # [N,C]
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t = jnp.where(t_near > tmin[:, None], t_near, t_far)
    valid = (t_near < t_far) & (t > tmin[:, None]) & (t < tmax[:, None])
    return jnp.where(valid, t, T_MAX)


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
# MXU (matmul) formulation of the primitive tests
# ---------------------------------------------------------------------------
#
# Every quantity the sphere quadratic and Möller-Trumbore need is *bilinear*
# in per-ray features and per-primitive constants:
#
#   ray features  R[n] = [d, o, o x d, o.d, |o|^2, 1]  (padded to 16)
#   sphere        h    =  C.d - (o.d)            c = (|C|^2 - r^2) - 2 o.C + |o|^2
#   triangle      det  = -d.n_geo                             (n_geo = e1 x e2)
#                 u_num = (o x d).e2 - d.(e2 x v0)
#                 v_num = -(o x d).e1 - d.(v0 x e1)
#                 t_num =  o.n_geo - v0.n_geo
#
# so one [N,16] @ [16, 4C] matmul computes det/u_num/v_num/t_num (or h/c)
# for *all* ray-prim pairs on the MXU — the systolic array does the heavy
# lifting and the VPU epilogue shrinks to ~15 elementwise ops per pair.
# This is the TPU-native answer to the reference's per-ray virtual hit()
# calls: intersection as matrix multiplication.

RAY_FEATURE_DIM = 16


# Primitive-column padding granularity for the coefficient tables — must
# equal the union-cull Pallas kernel's chunk width (pallas_intersect.
# CHUNK_PRIMS) so every table splits into whole chunks; the XLA scan uses
# 128-wide sub-slices of the same tables.
MM_PAD = 512
# Fine chunk granularity: the binned-pair intersector's work unit and the
# granularity at which chunk AABBs are stored (the 256-wide kernel derives
# its coarser bounds by unioning groups of MM_PAD/MM_FINE rows).
MM_FINE = 128


class MMTables(NamedTuple):
    """Precomputed primitive coefficient matrices for the MXU path.

    Derived (host-side) from the sphere/triangle tables; NOT differentiable
    parameters — the differentiable path (config.differentiable) uses the
    classic candidate kernels on the raw tables instead. Layout
    [16, G, C_pad] (feature, output, primitive): a [16, G*chunk] slice is a
    contiguous reshape, so both the XLA scan and the Pallas kernel run ONE
    matmul per chunk and slice output groups without lane strides. Padding
    columns are all-zero, which decodes as always-invalid candidates
    (det == 0 / radius-free c == 0).

    sphere_bounds/tri_bounds/box_bounds hold one conservative AABB per
    MM_FINE-wide coefficient chunk ([min xyz, max xyz]); the union-cull
    kernel skips whole chunks a ray block cannot reach. Padding chunks
    carry an empty (inverted) AABB, so they never pass the slab test.
    Tight chunk bounds rely on SceneBuilder's Morton ordering of the
    primitive tables.
    """

    sphere_coeff: Any    # f32[16, 2, Cs_pad]  outputs (h, c)
    tri_coeff: Any       # f32[16, 4, Ct_pad]  outputs (det, u_num, v_num, t_num)
    box_coeff: Any       # f32[16, 6, Cb_pad]  outputs (dl xyz, ol xyz)
    sphere_bounds: Any   # f32[Cs_pad/MM_FINE, 6]  per-chunk AABB (min, max)
    tri_bounds: Any      # f32[Ct_pad/MM_FINE, 6]
    box_bounds: Any      # f32[Cb_pad/MM_FINE, 6]


def _chunk_bounds(pmin, pmax, n_chunks, width=MM_FINE):
    """Per-chunk AABB union of primitive AABBs (host-side numpy).

    pmin/pmax [C, 3]; rows may be empty (min > max) and padding chunks stay
    inverted-infinite so the kernel's overlap test rejects them outright."""
    import numpy as np

    out = np.empty((n_chunks, 6), np.float32)
    out[:, 0:3] = np.inf
    out[:, 3:6] = -np.inf
    c = pmin.shape[0]
    for k in range(min(n_chunks, -(-c // width))):
        lo, hi = k * width, min((k + 1) * width, c)
        sel = pmin[lo:hi, 0] <= pmax[lo:hi, 0]
        if sel.any():
            out[k, 0:3] = pmin[lo:hi][sel].min(0)
            out[k, 3:6] = pmax[lo:hi][sel].max(0)
    return out


def tri_coeff_block(v0, e1, e2):
    """Möller-Trumbore coefficient columns for a triangle block:
    f32[16, 4, k]. Per-triangle independent, so incremental instance
    updates (models/instances.py) recompute only a moved instance's
    slice of the global table."""
    import numpy as np

    F = RAY_FEATURE_DIM
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    k = v0.shape[0]
    tc = np.zeros((F, 4, k), np.float32)
    n_geo = np.cross(e1, e2)
    # det = -d.n_geo
    tc[0:3, 0, :] = -n_geo.T
    # u_num = (o x d).e2 - d.(e2 x v0)
    tc[6:9, 1, :] = e2.T
    tc[0:3, 1, :] = -np.cross(e2, v0).T
    # v_num = -(o x d).e1 - d.(v0 x e1)
    tc[6:9, 2, :] = -e1.T
    tc[0:3, 2, :] = -np.cross(v0, e1).T
    # t_num = o.n_geo - v0.n_geo
    tc[3:6, 3, :] = n_geo.T
    tc[11, 3, :] = -(v0 * n_geo).sum(-1)
    return tc


def build_mm_tables(spheres, triangles, boxes=None) -> MMTables:
    """Assemble the coefficient matrices (host-side numpy)."""
    import numpy as np

    F = RAY_FEATURE_DIM
    cs = int(np.asarray(spheres.radius).shape[0])
    ct = int(np.asarray(triangles.v0).shape[0])
    cb = int(np.asarray(boxes.mat).shape[0]) if boxes is not None else 0
    cs_pad = max(-(-cs // MM_PAD) * MM_PAD, MM_PAD)
    ct_pad = max(-(-ct // MM_PAD) * MM_PAD, MM_PAD)
    cb_pad = max(-(-cb // MM_PAD) * MM_PAD, MM_PAD)

    sc = np.zeros((F, 2, cs_pad), np.float32)
    if cs:
        # f64 accumulation: |C|^2 - r^2 cancels catastrophically in f32 for
        # large ground spheres (|C| ~ r ~ 1000, scene_management.hpp:107).
        C = np.asarray(spheres.center, np.float64)
        r = np.asarray(spheres.radius, np.float64)
        # h: C.d - (o.d)
        sc[0:3, 0, :cs] = C.T
        sc[9, 0, :cs] = -1.0
        # c: -2 o.C + |o|^2 + (|C|^2 - r^2)
        sc[3:6, 1, :cs] = -2.0 * C.T
        sc[10, 1, :cs] = 1.0
        # Degenerate rows (r <= 0) must never hit (the classic kernel's
        # `radius > 0` check): an overwhelming constant makes disc < 0.
        sc[11, 1, :cs] = np.where(
            r > 0.0, (C * C).sum(-1) - r * r, 1e30
        )

    tc = np.zeros((F, 4, ct_pad), np.float32)
    if ct:
        tc[:, :, :ct] = tri_coeff_block(triangles.v0, triangles.e1,
                                        triangles.e2)

    # Box coefficients: local direction d_l = Minv d and local origin
    # o_l = Minv o + trans are LINEAR in the ray features (d cols 0:3,
    # o cols 3:6, const col 11), so one matmul yields all six slab inputs.
    bc = np.zeros((F, 6, cb_pad), np.float32)
    # Padding (and dummy-row) columns decode as guaranteed misses: o_l is a
    # huge constant far outside [-1,1], so the slab interval is empty.
    bc[11, 3:6, :] = 1e6
    if cb:
        minv = np.asarray(boxes.minv, np.float64)      # [B, 9]
        trans = np.asarray(boxes.trans, np.float64)    # [B, 3]
        for i in range(3):
            bc[0:3, i, :cb] = minv[:, 3 * i:3 * i + 3].T      # d_l rows
            bc[3:6, 3 + i, :cb] = minv[:, 3 * i:3 * i + 3].T  # o_l rows
            bc[11, 3 + i, :cb] = trans[:, i]

    if cs:
        C32 = np.asarray(spheres.center, np.float32)
        r32 = np.asarray(spheres.radius, np.float32)
        live = (r32 > 0.0)[:, None]
        smin = np.where(live, C32 - r32[:, None], np.inf)
        smax = np.where(live, C32 + r32[:, None], -np.inf)
    else:
        smin = np.zeros((0, 3), np.float32) + np.inf
        smax = np.zeros((0, 3), np.float32) - np.inf
    if ct:
        v0f = np.asarray(triangles.v0, np.float32)
        v1f = v0f + np.asarray(triangles.e1, np.float32)
        v2f = v0f + np.asarray(triangles.e2, np.float32)
        tmin_ = np.minimum(np.minimum(v0f, v1f), v2f)
        tmax_ = np.maximum(np.maximum(v0f, v1f), v2f)
    else:
        tmin_ = np.zeros((0, 3), np.float32) + np.inf
        tmax_ = np.zeros((0, 3), np.float32) - np.inf

    if cb:
        bmin = np.asarray(boxes.aabb_min, np.float32)
        bmax = np.asarray(boxes.aabb_max, np.float32)
    else:
        bmin = np.zeros((0, 3), np.float32) + np.inf
        bmax = np.zeros((0, 3), np.float32) - np.inf

    return MMTables(
        sphere_coeff=sc, tri_coeff=tc, box_coeff=bc,
        sphere_bounds=_chunk_bounds(smin, smax, cs_pad // MM_FINE),
        tri_bounds=_chunk_bounds(tmin_, tmax_, ct_pad // MM_FINE),
        box_bounds=_chunk_bounds(bmin, bmax, cb_pad // MM_FINE),
    )


def ray_features(o, d):
    """[N, 16] ray feature matrix for the MXU intersection matmul.

    Column 12 carries |d|^2 (read directly by the epilogues; all coefficient
    rows >= 12 are zero so it never enters the matmul).
    """
    n = o.shape[0]
    m = jnp.cross(o, d)
    od = jnp.sum(o * d, axis=-1, keepdims=True)
    oo = jnp.sum(o * o, axis=-1, keepdims=True)
    dd = jnp.sum(d * d, axis=-1, keepdims=True)
    one = jnp.ones((n, 1), o.dtype)
    pad = jnp.zeros((n, RAY_FEATURE_DIM - 13), o.dtype)
    return jnp.concatenate([d, o, m, od, oo, one, dd, pad], axis=-1)


# --- split-K f32 matmul emulation ("SPLITK") --------------------------------
# The MXU's native input type is bf16; XLA emulates an f32 matmul
# (precision=HIGHEST) as SIX bf16 passes: both operands are split into
# exact bf16 digit triples (f32's 24-bit mantissa = 3 x 8-bit bf16 digits,
# x == hi + mid + lo exactly) and the six significant cross products
# hh, hm, hl, mh, mm, lh are summed (the dropped ml/lm/ll terms sit at
# 2^-24 relative and below — under f32 resolution). Measured on the fused
# render loop, those six passes cost ~8 ms of a 25 ms step.
#
# SPLITK computes the SAME six product groups in TWO bf16 passes: the ray
# feature dim is only 16, and the MXU pads any contraction below 128 to a
# full 128-deep pass — so K-concatenating pairings is free. feats-side
# blocks [fh fh fh fm fm fl] against coefficient-side blocks
# [ch cm cl ch cm ch] yield exactly fh*ch + fh*cm + fh*cl + fm*ch + fm*cm
# + fl*ch — the HIGHEST product set.
#
# Why two passes and not one (splitk_dot): the MXU accumulates a pass's
# products in an f32 reduction tree whose rounding order differs from the
# CPU backend's sequential sum. One K=96 pass mixes magnitude-1 hh
# products with 2^-16-scale lh products in that tree, which makes the
# cross-backend disagreement ~10-100 ulp of the result (measured abs err
# up to 3.6e-4 on showcase sphere columns) — enough to flip 31% of
# winning-primitive choices via the grazing-ray amplification of the
# r=1000 ground sphere (CPU goldens no longer match TPU renders). Pass 1
# carries ONLY the dominant hh pair (reassociation noise ~1 ulp, same
# arithmetic as HIGHEST's hh pass); pass 2 carries the five small cross
# pairs, whose internal tree noise is ~2^-32 relative to the result; the
# two partials are combined in f32 in a fixed order on both backends.
#
# RAYTRACER_TPU_ISECT_PREC selects SPLITK (default) | HIGHEST | DEFAULT
# (the latter two for ablation; DEFAULT corrupts the hit set, see
# _scan_chunks_mm).
import os as _os

ISECT_PREC = _os.environ.get("RAYTRACER_TPU_ISECT_PREC", "SPLITK").upper()
SPLITK_FACTOR = 6
# Kernel VMEM bytes per f32 coefficient element: SPLITK stores 96 bf16
# rows where the plain table has 16 f32 rows (3x); ablation modes keep f32.
COEFF_BYTES_PER_F32 = 12 if ISECT_PREC == "SPLITK" else 4


def split3_bf16(x):
    """Exact 3-way bf16 digit split: x == hi + mid + lo for f32 x.

    Round-to-nearest carries can shift one digit boundary, but each
    residual subtraction is exact (Sterbenz) and <= 8 significant bits
    remain for `lo`, so the reconstruction is exact away from the bf16
    subnormal floor (~2^-133, far below any scene coefficient)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    r2 = r1 - mid.astype(jnp.float32)
    return hi, mid, r2.astype(jnp.bfloat16)


def splitk_pack_coeff(coeff):
    """Coefficient table [16, G, P] f32 -> [96, G, P] bf16 in the SPLITK
    row layout (paired against splitk_feats' [fh fh fh fm fm fl])."""
    hi, mid, lo = split3_bf16(coeff)
    return jnp.concatenate([hi, mid, lo, hi, mid, hi], axis=0)


def splitk_feats(feats):
    """Ray features [B, 16] f32 -> [B, 96] bf16: [fh fh fh fm fm fl]."""
    hi, mid, lo = split3_bf16(feats)
    return jnp.concatenate([hi, hi, hi, mid, mid, lo], axis=1)


def splitk_dot(featsk, coeffk, in_kernel: bool = False):
    """f32-emulated matmul from SPLITK-packed operands: featsk [B, 6*F]
    bf16 (splitk_feats), coeffk [6*F, N] bf16 (splitk_pack_coeff rows,
    flattened). Two default-precision MXU passes — the dominant hh digit
    pair alone, then the five small cross pairs — summed in f32 (see the
    module comment above for why the pairs cannot share one pass).

    in_kernel: set inside a Pallas kernel. Outside, an optimization
    barrier keeps XLA from re-fusing the two dots into one
    K-concatenated MXU pass (its concat-dot rewrite): that reintroduces
    the mixed-magnitude accumulation the split exists to avoid, and
    de-syncs the XLA scan from the Mosaic kernel (smoke's hit-agree
    stage caught exactly this: 5/512 hit flips, XLA-fused vs Mosaic
    two-pass). Mosaic has no barrier primitive and performs no such
    rewrite, so in-kernel the partials stay separate on their own."""
    f = RAY_FEATURE_DIM
    d1 = jnp.dot(featsk[:, :f], coeffk[:f, :],
                 preferred_element_type=jnp.float32)
    d2 = jnp.dot(featsk[:, f:], coeffk[f:, :],
                 preferred_element_type=jnp.float32)
    if not in_kernel:
        d1, d2 = jax.lax.optimization_barrier((d1, d2))
    return d1 + d2


def splitk_pack_rows(tableT):
    """Transposed row table [cols, R] f32 -> [3*cols, R] bf16 (hi block,
    mid block, lo block) for exact one-hot MXU fetches: a one-hot matrix
    is exact in bf16, so dot(split_table, onehot) reconstructs every
    fetched f32 bit-exactly from one DEFAULT-precision pass per digit
    (3 total, vs HIGHEST's 6)."""
    hi, mid, lo = split3_bf16(tableT)
    return jnp.concatenate([hi, mid, lo], axis=0)


def sphere_candidate_t_mm(h, c, a, tmin, tmax):
    """Sphere epilogue: h, c f32[N, C]; a = |d|^2 [N, 1].

    Same valid-root semantics as sphere_candidate_t (sphere.hpp:18-39).
    """
    disc = h * h - a * c
    sq = vecmath.safe_sqrt(disc)
    inv_a = 1.0 / a
    root0 = (h - sq) * inv_a
    root1 = (h + sq) * inv_a
    ok0 = (root0 > tmin[:, None]) & (root0 < tmax[:, None])
    ok1 = (root1 > tmin[:, None]) & (root1 < tmax[:, None])
    root = jnp.where(ok0, root0, root1)
    valid = (disc >= 0.0) & (ok0 | ok1)
    return jnp.where(valid, root, T_MAX)


def triangle_candidate_t_mm(det, u_num, v_num, t_num, tmin, tmax):
    """Triangle epilogue on the matmul outputs, all f32[N, C].

    Two-sided Möller-Trumbore, same hit set as triangle_candidate_t.
    """
    near_zero = jnp.abs(det) < 1e-12
    inv_det = 1.0 / jnp.where(near_zero, 1.0, det)
    u = u_num * inv_det
    v = v_num * inv_det
    t = t_num * inv_det
    valid = (
        ~near_zero
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin[:, None])
        & (t < tmax[:, None])
    )
    return jnp.where(valid, t, T_MAX)


def box_candidate_t_mm(dlx, dly, dlz, olx, oly, olz, tmin, tmax):
    """Box slab epilogue on the matmul outputs, all f32[N, C].

    Same hit set as box_candidate_t (cube.hpp:44-86 semantics).
    """
    safe = lambda v: 1.0 / jnp.where(jnp.abs(v) < 1e-30, 1e-30, v)
    ix, iy, iz = safe(dlx), safe(dly), safe(dlz)
    ax0, ax1 = (-1.0 - olx) * ix, (1.0 - olx) * ix
    ay0, ay1 = (-1.0 - oly) * iy, (1.0 - oly) * iy
    az0, az1 = (-1.0 - olz) * iz, (1.0 - olz) * iz
    t_near = jnp.maximum(jnp.maximum(jnp.minimum(ax0, ax1),
                                     jnp.minimum(ay0, ay1)),
                         jnp.minimum(az0, az1))
    t_far = jnp.minimum(jnp.minimum(jnp.maximum(ax0, ax1),
                                    jnp.maximum(ay0, ay1)),
                        jnp.maximum(az0, az1))
    t = jnp.where(t_near > tmin[:, None], t_near, t_far)
    valid = (t_near < t_far) & (t > tmin[:, None]) & (t < tmax[:, None])
    return jnp.where(valid, t, T_MAX)


def _scan_chunks_mm(coeff, epilogue, n_rows, feats, tmin, best_t, best_idx):
    """Running closest-hit over coefficient chunks: matmul + epilogue.

    coeff f32[16, G, C_pad] (C_pad a multiple of CHUNK; zero padding columns
    decode as always-invalid); G matmul outputs per primitive.

    Determinism caveat: on CPU this path is bit-identical to the Pallas
    kernel in interpret mode (shared splitk_dot arithmetic) and is the
    CPU test anchor. On TPU it is an MXU-speed path, NOT a bit
    reference: inside scan contexts XLA fuses the split-digit dots and
    the partial add into one MXU accumulation chain (the optimization
    barrier stops the concat rewrite but not accumulate-mode chaining),
    which reintroduces mixed-magnitude accumulation noise. The exact
    device oracle is intersect_brute (pure VPU); see
    utils/smoke.stage_hit_agree.
    """
    g = coeff.shape[1]
    n_chunks = coeff.shape[2] // CHUNK
    # Default-precision bf16 matmuls corrupt the hit set (measured: 1.7%
    # hit flips / 35% wrong prim indices on the showcase scene), so the
    # dot must carry f32-emulation precision: SPLITK packs HIGHEST's six
    # bf16 product groups into one default pass (see splitk_pack_coeff);
    # the HIGHEST fallback exists for ablation.
    if ISECT_PREC == "SPLITK":
        coeff = splitk_pack_coeff(coeff)
        feats = splitk_feats(feats)
    k_rows = coeff.shape[0]
    # [K, G, C_pad] -> chunks [n_chunks, K, G * CHUNK] (output-major cols)
    chunked = (
        coeff.reshape(k_rows, g, n_chunks, CHUNK)
        .transpose(2, 0, 1, 3)
        .reshape(n_chunks, k_rows, g * CHUNK)
    )
    row_ids = jnp.arange(CHUNK)

    def body(carry, chunk):
        best_t, best_idx = carry
        coeff_c, chunk_i = chunk
        if ISECT_PREC == "SPLITK":
            out = splitk_dot(feats, coeff_c)
        else:
            out = jax.lax.dot_general(
                feats, coeff_c,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=getattr(jax.lax.Precision, ISECT_PREC),
            )  # [N, G * CHUNK], contiguous CHUNK-wide group per output
        t = epilogue(*(out[:, i * CHUNK:(i + 1) * CHUNK] for i in range(g)),
                     tmin, best_t)
        rows = chunk_i * CHUNK + row_ids
        t = jnp.where((rows < n_rows)[None, :], t, T_MAX)
        cmin = jnp.min(t, axis=1)
        carg = jnp.argmin(t, axis=1).astype(jnp.int32)
        better = cmin < best_t
        best_t = jnp.where(better, cmin, best_t)
        best_idx = jnp.where(better, chunk_i * CHUNK + carg, best_idx)
        return (best_t, best_idx), None

    (best_t, best_idx), _ = jax.lax.scan(
        body, (best_t, best_idx),
        (chunked, jnp.arange(n_chunks, dtype=jnp.int32)),
    )
    return best_t, best_idx


def intersect_brute_mm(scene: Scene, o, d, tmin, tmax=None) -> Hit:
    """Closest hit over all primitives via the MXU matmul formulation.

    Bit-compatible hit *set* with intersect_brute (same tests, same
    ordering); t values may differ at float32 rounding level because the
    arithmetic is regrouped through the matmul.
    """
    n = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    init_t = jnp.full((n,), T_MAX if tmax is None else tmax, jnp.float32)
    init_idx = jnp.zeros((n,), jnp.int32)
    feats = ray_features(o, d)
    a = vecmath.length_squared(d)[:, None]

    mm = scene.mm
    s_t, s_idx = init_t, init_idx
    if scene.spheres.count:
        s_t, s_idx = _scan_chunks_mm(
            mm.sphere_coeff,
            lambda h, c, lo, hi: sphere_candidate_t_mm(h, c, a, lo, hi),
            scene.spheres.count, feats, tmin, init_t, init_idx,
        )
    t_t, t_idx = s_t, s_idx
    if scene.triangles.count:
        t_t, t_idx = _scan_chunks_mm(
            mm.tri_coeff,
            triangle_candidate_t_mm,
            scene.triangles.count, feats, tmin, s_t, s_idx,
        )
    tri_won = t_t < s_t
    ptype = jnp.where(tri_won, PRIM_TRIANGLE, PRIM_SPHERE).astype(jnp.int32)
    b_t, b_idx = t_t, t_idx
    if scene.boxes is not None and scene.boxes.count:
        b_t, b_idx = _scan_chunks_mm(
            mm.box_coeff,
            box_candidate_t_mm,
            scene.boxes.count, feats, tmin, t_t, t_idx,
        )
        box_won = b_t < t_t
        ptype = jnp.where(box_won, PRIM_BOX, ptype)
        t_idx = jnp.where(box_won, b_idx, t_idx)
    return Hit(
        t=b_t,
        prim_type=ptype,
        prim_idx=t_idx,
        hit=b_t < T_MAX,
    )


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
    ptype = jnp.where(tri_won, PRIM_TRIANGLE, PRIM_SPHERE).astype(jnp.int32)
    b_t, b_idx = t_t, t_idx
    if scene.boxes is not None:
        box = scene.boxes
        b_t, b_idx = _scan_chunks(
            box_candidate_t, [box.minv, box.trans], box.count,
            o, d, tmin, t_t, t_idx,
        )
        box_won = b_t < t_t
        ptype = jnp.where(box_won, PRIM_BOX, ptype)
        t_idx = jnp.where(box_won, b_idx, t_idx)
    return Hit(
        t=b_t,
        prim_type=ptype,
        prim_idx=t_idx,
        hit=b_t < T_MAX,
    )


# Below this primitive count the chunked brute-force scan beats BVH
# traversal on TPU: the scan is pure broadcast arithmetic (VPU
# speed-of-light, zero gathers), while the lock-step BVH walk pays ~1 ms of
# slow TPU gather per node step. Measured crossover on v5e is O(10^4) prims.
BVH_MIN_PRIMS = 8192


def intersect_dispatch(scene: Scene, tmin) -> str:
    """The single closest-hit routing decision, shared by intersect and
    intersect_soa so the chunked and pooled paths can never silently pick
    different intersectors: "bvh" | "pallas" | "mm" | "brute".

    RAYTRACER_TPU_NO_PALLAS=1 (env, read at trace time) forces the pure
    XLA scan — needed by transforms that cannot enter Pallas kernels
    (checkify numeric traps, utils/debug.checked).

    On TPU the Pallas chunk-cull scan wins at EVERY measured scene size:
    the masked lax.while_loop BVH traversal executes catastrophically on
    this backend (12-42 s per 262k-ray batch vs the kernel's 36-67 ms,
    810 -> 25k primitives — tools/bench_bvh.py, round 4), while the
    Morton-chunked cull gives the kernel sub-linear scaling in practice
    (31x primitives -> 1.8x cost). The threaded BVH remains the CPU
    large-scene path and the property-test oracle target."""
    import os

    import numpy as np

    no_pallas = bool(os.environ.get("RAYTRACER_TPU_NO_PALLAS"))
    if (scene.mm is not None and jax.default_backend() == "tpu"
            and jnp.ndim(tmin) == 0 and not no_pallas):
        # The kernel keeps every coefficient table VMEM-resident; beyond
        # a ~48 MB budget (same bound as fused_supported; v5e VMEM is
        # 128 MB) Mosaic would OOM, so hand such scenes to the BVH.
        coeff_bytes = COEFF_BYTES_PER_F32 * sum(
            int(np.prod(t.shape))
            for t in (scene.mm.sphere_coeff, scene.mm.tri_coeff,
                      scene.mm.box_coeff)
        )
        if coeff_bytes < 48 * 1024 * 1024:
            return "pallas"
    if scene.bvh is not None and scene.primitive_count >= BVH_MIN_PRIMS:
        return "bvh"
    if scene.mm is not None:
        return "mm"
    return "brute"


def intersect(scene: Scene, o, d, tmin) -> Hit:
    """Closest hit: MXU matmul scan when coefficient tables are present,
    classic brute scan otherwise; threaded BVH for very large scenes."""
    path = intersect_dispatch(scene, tmin)
    if path == "bvh":
        from . import traverse

        return traverse.intersect_bvh(scene, o, d, tmin)
    if path == "pallas":
        from . import pallas_intersect

        return pallas_intersect.intersect_brute_pallas(scene, o, d, tmin)
    if path == "mm":
        return intersect_brute_mm(scene, o, d, tmin)
    return intersect_brute(scene, o, d, tmin)


# ---------------------------------------------------------------------------
# Detached-traversal differentiable intersection (SURVEY §7/S7)
# ---------------------------------------------------------------------------

# The closest-hit *search* (which primitive wins, hit vs miss) is discrete —
# its argmin/while-loop structure has no useful derivative and blocks
# reverse-mode AD (lax.while_loop has no transpose rule). The standard
# detached-sampling estimator differentiates everything *except* that
# discrete choice: traversal runs on stop_gradient'd inputs with whatever
# fast path applies (BVH walk, MXU matmul scan, Pallas kernel), then the hit
# distance t of the chosen primitive is recomputed differentiably from the
# raw geometry tables. Gradients flow to camera/geometry/material/env
# parameters through the chosen hit; only boundary (silhouette) terms are
# dropped, exactly as BASELINE.json's "reparameterized/detached-sampling
# gradients" allows. This removes the old restriction that differentiable
# renders needed brute-force-small scenes.

def _eps_signed(x, eps=1e-12):
    """Clamp |x| >= eps preserving sign (gradient-safe division guard)."""
    return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0.0, -eps, eps), x)


def _diff_t_sphere(scene: Scene, o, d, idx, t_det):
    """Differentiable t of the chosen sphere: re-solve the quadratic
    (sphere.hpp:18-39) and pick the root the detached traversal chose."""
    s = scene.spheres
    center = s.center[idx]
    radius = s.radius[idx]
    oc = center - o
    a = vecmath.length_squared(d)
    h = vecmath.dot(d, oc)
    c = vecmath.length_squared(oc) - radius * radius
    disc = jnp.maximum(h * h - a * c, 0.0)  # chosen lanes have disc > 0
    sq = vecmath.safe_sqrt(disc)
    inv_a = 1.0 / _eps_signed(a)
    r0 = (h - sq) * inv_a
    r1 = (h + sq) * inv_a
    sg = jax.lax.stop_gradient
    pick0 = jnp.abs(sg(r0) - t_det) <= jnp.abs(sg(r1) - t_det)
    return jnp.where(pick0, r0, r1)


def _diff_t_triangle(scene: Scene, o, d, idx, t_det):
    """Differentiable t of the chosen triangle (Möller-Trumbore,
    triangle.hpp:17-82 equivalent)."""
    tr = scene.triangles
    v0, e1, e2 = tr.v0[idx], tr.e1[idx], tr.e2[idx]
    pvec = jnp.cross(d, e2)
    det = _eps_signed(vecmath.dot(e1, pvec))
    tvec = o - v0
    qvec = jnp.cross(tvec, e1)
    return vecmath.dot(e2, qvec) / det


def _diff_t_box(scene: Scene, o, d, idx, t_det):
    """Differentiable t of the chosen affine-slab box: local-frame slab
    distances (cube.hpp:44-86), picking near/exit as the traversal did."""
    b = scene.boxes
    m = b.minv[idx].reshape(-1, 3, 3)
    trans = b.trans[idx]
    lo = jnp.einsum("nij,nj->ni", m, o) + trans
    ld = _eps_signed(jnp.einsum("nij,nj->ni", m, d), 1e-30)
    inv = 1.0 / ld
    t0 = (-1.0 - lo) * inv
    t1 = (1.0 - lo) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    sg = jax.lax.stop_gradient
    pickn = jnp.abs(sg(tn) - t_det) <= jnp.abs(sg(tf) - t_det)
    return jnp.where(pickn, tn, tf)


def intersect_detached(scene: Scene, o, d, tmin) -> Hit:
    """Closest hit with detached traversal + differentiable hit distance.

    Drop-in for `intersect` on differentiable paths: the returned prim
    choice and hit mask are constants w.r.t. AD, but `t` carries exact
    gradients to the chosen primitive's parameters and to (o, d)."""
    sg = jax.lax.stop_gradient
    det = intersect(sg(scene), sg(o), sg(d), sg(jnp.asarray(tmin)))
    t_det = jnp.where(det.hit, det.t, 1.0)
    t = t_det
    if scene.spheres.count:
        ts = _diff_t_sphere(
            scene, o, d,
            jnp.clip(det.prim_idx, 0, scene.spheres.count - 1), t_det,
        )
        t = jnp.where(det.prim_type == PRIM_SPHERE, ts, t)
    if scene.triangles.count:
        tt = _diff_t_triangle(
            scene, o, d,
            jnp.clip(det.prim_idx, 0, scene.triangles.count - 1), t_det,
        )
        t = jnp.where(det.prim_type == PRIM_TRIANGLE, tt, t)
    if scene.boxes is not None and scene.boxes.count:
        tb = _diff_t_box(
            scene, o, d, jnp.clip(det.prim_idx, 0, scene.boxes.count - 1),
            t_det,
        )
        t = jnp.where(det.prim_type == PRIM_BOX, tb, t)
    # Miss lanes keep the detached constant (T_MAX); hit lanes must carry
    # the recomputed value, which equals t_det to float rounding.
    t = jnp.where(det.hit, t, det.t)
    return Hit(t=t, prim_type=det.prim_type, prim_idx=det.prim_idx,
               hit=det.hit)


# ---------------------------------------------------------------------------
# Deferred hit-record construction
# ---------------------------------------------------------------------------

# XLA:TPU lowers 1-column table gathers through a serial SMEM copy of the
# whole table per gather (measured: 31 ms for a 6k-row table at 262k
# indices on v5e, ~200x the cost of the same rows from a multi-column
# table). So each record fetch packs ALL of a primitive type's shading
# columns into one wide f32 matrix (loop-invariant -> hoisted/cached) and
# gathers exactly once, on the fast vector path. Integer ids are < 2^24,
# exact through the f32 round-trip.

def _sphere_packed(scene: Scene):
    """[S, 5]: center xyz, radius, mat."""
    s = scene.spheres
    return jnp.concatenate(
        [s.center, s.radius[:, None],
         s.mat.astype(jnp.float32)[:, None]], axis=1,
    )


def _tri_packed(scene: Scene):
    """[T, 28]: v0 e1 e2 n0 n1 n2 (18) uv0 uv1 uv2 (6) tangent (3) mat."""
    t = scene.triangles
    return jnp.concatenate(
        [t.v0, t.e1, t.e2, t.n0, t.n1, t.n2, t.uv0, t.uv1, t.uv2,
         t.tangent, t.mat.astype(jnp.float32)[:, None]], axis=1,
    )


_PACK_COLS = 28


def _default_row(vals):
    import numpy as np

    r = np.zeros((_PACK_COLS,), np.float32)
    r[: len(vals)] = vals
    return r


# Benign stand-in rows fed to a decoder for lanes of another primitive type
# (numpy so they embed as free constants — see the _BOX_FACE_U note below).
# Sphere: unit sphere at origin; triangle: unit right triangle with +z
# normals; box: identity transform. All arithmetic on them stays O(1).
_SPHERE_DEFAULT_ROW = _default_row([0, 0, 0, 1, 0])
_TRI_DEFAULT_ROW = _default_row(
    [0, 0, 0, 1, 0, 0, 0, 1, 0,          # v0, e1, e2
     0, 0, 1, 0, 0, 1, 0, 0, 1,          # n0, n1, n2
     0, 0, 1, 0, 0, 1,                   # uv0, uv1, uv2
     1, 0, 0, 0]                          # tangent, mat
)
_BOX_DEFAULT_ROW = _default_row([1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0])


def _packed_all(scene: Scene):
    """One [Ns+Nt+Nb, 28] table holding every primitive type's shading
    columns (sphere rows use cols 0:5, triangle rows 0:28, box rows 0:13).

    Loop-invariant, so XLA hoists it out of the bounce loop; make_record
    then needs exactly ONE wide gather per step instead of one per
    primitive type (each 262k-lane gather costs ~3-4 ms on v5e)."""
    pads = []
    s = _sphere_packed(scene)
    pads.append(jnp.pad(s, ((0, 0), (0, _PACK_COLS - s.shape[1]))))
    pads.append(_tri_packed(scene))
    if scene.boxes is not None:
        b = _box_packed(scene)
        pads.append(jnp.pad(b, ((0, 0), (0, _PACK_COLS - b.shape[1]))))
    return jnp.concatenate(pads, axis=0)


def _sphere_record_from(g, o, d, t):
    """Sphere shading data (sphere.hpp:40-59); g = packed rows [N, 28]."""
    center = g[:, 0:3]
    # abs+floor keeps wrong-type rows (cols are then e1/minv components,
    # possibly negative) from blowing up the masked-out lanes' arithmetic;
    # identity for real spheres (radius > 0).
    radius = jnp.maximum(jnp.abs(g[:, 3]), 1e-6)
    mat = g[:, 4].astype(jnp.int32)
    p = o + t[:, None] * d
    outward = (p - center) / radius[:, None]
    front = vecmath.dot(d, outward) < 0.0
    normal = jnp.where(front[:, None], outward, -outward)

    # Spherical UV from the *outward* normal (sphere.hpp:70-79).
    theta = vecmath.safe_arccos(-outward[:, 1])
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
    return p, normal, tangent, bitangent, front, u, v, mat


def _triangle_record_from(g, o, d, t):
    """Triangle shading data: barycentric-smooth normal (triangle.hpp:56-79)
    + interpolated UVs and the face tangent frame (cube faces)."""
    v0, e1, e2 = g[:, 0:3], g[:, 3:6], g[:, 6:9]
    n0, n1, n2 = g[:, 9:12], g[:, 12:15], g[:, 15:18]
    uv0, uv1, uv2 = g[:, 18:20], g[:, 20:22], g[:, 22:24]
    tangent = g[:, 24:27]
    mat = g[:, 27].astype(jnp.int32)
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
        w[:, None] * n0 + u[:, None] * n1 + v[:, None] * n2
    )
    front = vecmath.dot(d, smooth) < 0.0
    normal = jnp.where(front[:, None], smooth, -smooth)

    uv = w[:, None] * uv0 + u[:, None] * uv1 + v[:, None] * uv2
    bitangent = jnp.cross(normal, tangent)
    return p, normal, tangent, bitangent, front, uv[:, 0], uv[:, 1], mat


def _box_packed(scene: Scene):
    """[B, 13]: minv (9), trans (3), mat."""
    b = scene.boxes
    return jnp.concatenate(
        [b.minv, b.trans, b.mat.astype(jnp.float32)[:, None]], axis=1,
    )


# Per-face UV maps of the canonical [-1,1]^3 cube (cube.hpp:104-138),
# evaluated on the local hit point l: u = dot(l, U)*0.5 + 0.5, likewise v.
# Rows indexed by face = axis*2 + (sign>0). NUMPY on purpose: module-level
# jnp arrays become device-resident constants that lowering must fetch
# device->host to embed in the module — ~34 s per fetch over a tunneled
# TPU (measured); numpy constants embed for free.
import numpy as _np

_BOX_FACE_U = _np.asarray([
    [0., 0., 1.], [0., 0., 1.],     # MIN_X, MAX_X: u from z
    [1., 0., 0.], [1., 0., 0.],     # MIN_Y, MAX_Y: u from x
    [-1., 0., 0.], [1., 0., 0.],    # MIN_Z (mirrored), MAX_Z
], _np.float32)
_BOX_FACE_V = _np.asarray([
    [0., 1., 0.], [0., 1., 0.],
    [0., 0., 1.], [0., 0., 1.],
    [0., 1., 0.], [0., 1., 0.],
], _np.float32)
# Local face tangents (cube.hpp:100-142 / geometry._CUBE_FACES).
_BOX_FACE_TAN = _np.asarray([
    [0., 0., 1.], [0., 0., -1.],
    [1., 0., 0.], [-1., 0., 0.],
    [-1., 0., 0.], [1., 0., 0.],
], _np.float32)


def _box_record_from(g, o, d, t):
    """Box shading data: face normal/UV/tangent from the local hit point
    (cube.hpp:100-142)."""
    m = g[:, 0:9].reshape(-1, 3, 3)           # world->local rows
    trans = g[:, 9:12]
    mat = g[:, 12].astype(jnp.int32)
    p = o + t[:, None] * d

    l = jnp.einsum("nij,nj->ni", m, p) + trans          # local hit ~ on cube
    axis = jnp.argmax(jnp.abs(l), axis=-1)              # dominant face axis
    # Everything face-dependent goes through one-hot arithmetic: integer
    # table gathers (take_along_axis, FACE_TABLE[face]) get staged through
    # a serial SMEM loop on TPU (~3.7 ms at 262k lanes); the one-hot dot
    # against a [6, 3] constant is a fast vector op.
    onehot = (jnp.arange(3)[None, :] == axis[:, None]).astype(jnp.float32)
    sign = jnp.sign(jnp.sum(l * onehot, axis=-1))
    pos = (sign > 0.0).astype(jnp.float32)
    # face = axis*2 + (sign>0): columns [x-,x+,y-,y+,z-,z+].
    onehot6 = (onehot[:, :, None]
               * jnp.stack([1.0 - pos, pos], axis=-1)[:, None, :]
               ).reshape(-1, 6)

    # Normals/tangents transform by the inverse-transpose: +-minv row `axis`
    # (see models/geometry.BoxTable).
    outward = vecmath.normalize(
        sign[:, None] * jnp.einsum("ni,nij->nj", onehot, m)
    )
    front = vecmath.dot(d, outward) < 0.0
    normal = jnp.where(front[:, None], outward, -outward)

    u = vecmath.dot(l, onehot6 @ _BOX_FACE_U) * 0.5 + 0.5
    v = vecmath.dot(l, onehot6 @ _BOX_FACE_V) * 0.5 + 0.5

    tan_l = onehot6 @ _BOX_FACE_TAN
    tangent = vecmath.normalize(jnp.einsum("ni,nij->nj", tan_l, m))
    bitangent = jnp.cross(normal, tangent)
    return p, normal, tangent, bitangent, front, u, v, mat


# ---------------------------------------------------------------------------
# SoA record decode (component-tuple twins; see core/soa.py)
# ---------------------------------------------------------------------------
#
# The AoS decoders above are the oracle; these produce the same values with
# vectors as (x, y, z) tuples of [N] arrays so the pooled-wavefront loop
# never materializes [N, 3] arrays (XLA:TPU flip-flops their layouts across
# fusion boundaries — measured ~24 ms/step of pure layout churn at 262k
# lanes). Parity is asserted in tests/test_intersect.py.


class HitRecordSoa(NamedTuple):
    """SoA twin of HitRecord: vector fields are (x, y, z) tuples."""

    t: jax.Array
    p: tuple
    normal: tuple
    tangent: tuple
    bitangent: tuple
    front_face: jax.Array
    u: jax.Array
    v: jax.Array
    mat: jax.Array
    hit: jax.Array


def _sphere_record_soa(g, o, d, t, acos_fn=None, atan2_fn=None):
    """SoA twin of _sphere_record_from (sphere.hpp:40-59).

    g is a tuple of per-column [N] arrays (cols 0:5 used): the former
    [N, 28] row-gather matrix pads its minor dim 28 -> 128 lanes on TPU
    (4.6x memory bloat) and every column read re-streams the padded tiles
    — measured ~18 ms/step at 262k lanes; per-component 1-D arrays tile
    densely.

    acos_fn/atan2_fn: overrides for contexts where the exact primitives
    cannot lower (Mosaic has no acos/atan2 — the fused kernel passes
    core.vecmath polynomial versions; they only steer the nearest-neighbor
    texture lookup through u, v)."""
    acos_fn = acos_fn or vecmath.safe_arccos
    atan2_fn = atan2_fn or jnp.arctan2
    center = (g[0], g[1], g[2])
    radius = jnp.maximum(jnp.abs(g[3]), 1e-6)
    mat = g[4].astype(jnp.int32)
    p = soa.axpy(t, d, o)
    outward = soa.scale(soa.sub(p, center), 1.0 / radius)
    front = soa.dot(d, outward) < 0.0
    normal = soa.where(front, outward, soa.neg(outward))

    theta = acos_fn(-outward[1])
    phi = atan2_fn(-outward[2], outward[0]) + PI
    u = phi / (2.0 * PI)
    v = theta / PI

    # world-up x n = (nz, 0, -nx); fallback (0,0,1) x n = (-ny, nx, 0)
    # (sphere.hpp:50-59 pole handling).
    tan_a = (normal[2], jnp.zeros_like(normal[0]), -normal[0])
    degenerate = soa.length_squared(tan_a) < 1e-3
    tan_b = (-normal[1], normal[0], jnp.zeros_like(normal[0]))
    tangent = soa.normalize(soa.where(degenerate, tan_b, tan_a))
    bitangent = soa.cross(normal, tangent)
    return p, normal, tangent, bitangent, front, u, v, mat


def _triangle_record_soa(g, o, d, t):
    """SoA twin of _triangle_record_from (triangle.hpp:56-79); g is a tuple
    of per-column [N] arrays (see _sphere_record_soa)."""
    v0 = (g[0], g[1], g[2])
    e1 = (g[3], g[4], g[5])
    e2 = (g[6], g[7], g[8])
    n0 = (g[9], g[10], g[11])
    n1 = (g[12], g[13], g[14])
    n2 = (g[15], g[16], g[17])
    tangent = (g[24], g[25], g[26])
    mat = g[27].astype(jnp.int32)
    p = soa.axpy(t, d, o)

    geo_n = soa.cross(e1, e2)
    area_sq = jnp.maximum(soa.length_squared(geo_n), 1e-24)
    rel = soa.sub(p, v0)
    c0 = soa.cross(e1, rel)
    c2 = soa.cross(rel, e2)
    u = soa.dot(geo_n, c2) / area_sq
    v = soa.dot(geo_n, c0) / area_sq
    w = 1.0 - u - v

    smooth = soa.normalize(tuple(
        w * n0[k] + u * n1[k] + v * n2[k] for k in range(3)))
    front = soa.dot(d, smooth) < 0.0
    normal = soa.where(front, smooth, soa.neg(smooth))

    uu = w * g[18] + u * g[20] + v * g[22]
    vv = w * g[19] + u * g[21] + v * g[23]
    bitangent = soa.cross(normal, tangent)
    return p, normal, tangent, bitangent, front, uu, vv, mat


def _box_record_soa(g, o, d, t):
    """SoA twin of _box_record_from (cube.hpp:100-142): the face one-hot
    tables become explicit axis/sign selects. g is a tuple of per-column
    [N] arrays, cols 0:13 used (see _sphere_record_soa)."""
    mat = g[12].astype(jnp.int32)
    p = soa.axpy(t, d, o)
    # l = M p + trans, rows of M in g[0:9], trans in g[9:12].
    l = tuple(
        g[3 * k] * p[0] + g[3 * k + 1] * p[1] + g[3 * k + 2] * p[2]
        + g[9 + k]
        for k in range(3)
    )
    ax, ay, az = jnp.abs(l[0]), jnp.abs(l[1]), jnp.abs(l[2])
    axis0 = (ax >= ay) & (ax >= az)
    axis1 = ~axis0 & (ay >= az)
    axis2 = ~axis0 & ~axis1
    dom = jnp.where(axis0, l[0], jnp.where(axis1, l[1], l[2]))
    sign = jnp.sign(dom)
    pos = sign > 0.0

    # outward = normalize(sign * M[axis, :]) (inverse-transpose row).
    row = tuple(
        jnp.where(axis0, g[k], jnp.where(axis1, g[3 + k], g[6 + k]))
        for k in range(3)
    )
    outward = soa.normalize(soa.scale(row, sign))
    front = soa.dot(d, outward) < 0.0
    normal = soa.where(front, outward, soa.neg(outward))

    # Face UV axes (cube.hpp:104-138 / _BOX_FACE_U, _BOX_FACE_V):
    #   u-axis: x-faces (0,0,1); y-faces (1,0,0); z-: (-1,0,0); z+: (1,0,0)
    #   v-axis: y-faces (0,0,1); x/z-faces (0,1,0)
    zeros = jnp.zeros_like(l[0])
    fu = (
        jnp.where(axis0, 0.0, jnp.where(axis1, 1.0,
                                        jnp.where(pos, 1.0, -1.0))),
        zeros,
        jnp.where(axis0, 1.0, 0.0),
    )
    fv = (
        zeros,
        jnp.where(axis1, 0.0, 1.0),
        jnp.where(axis1, 1.0, 0.0),
    )
    u = soa.dot(l, fu) * 0.5 + 0.5
    v = soa.dot(l, fv) * 0.5 + 0.5

    # Local tangents (_BOX_FACE_TAN): x-: (0,0,1) x+: (0,0,-1);
    # y-: (1,0,0) y+: (-1,0,0); z-: (-1,0,0) z+: (1,0,0).
    tx = jnp.where(axis0, 0.0,
                   jnp.where(axis1, jnp.where(pos, -1.0, 1.0),
                             jnp.where(pos, 1.0, -1.0)))
    tz = jnp.where(axis0, jnp.where(pos, -1.0, 1.0), 0.0)
    # world tangent_j = sum_i tan_local_i * M[i, j]
    tangent = soa.normalize(tuple(
        tx * g[k] + tz * g[6 + k] for k in range(3)))
    bitangent = soa.cross(normal, tangent)
    return p, normal, tangent, bitangent, front, u, v, mat


def make_record_soa(scene: Scene, o, d, hit: Hit) -> HitRecordSoa:
    """SoA twin of make_record: o, d are (x, y, z) tuples of [N] arrays.

    The shading columns come from per-component 1-D gathers out of the
    transposed (compile-time-constant) packed table: a single [N, 28] row
    gather pads its minor dim to 128 lanes on TPU and the decoders' column
    reads then re-stream the padded tiles — measured ~18 ms/step at 262k
    lanes; 28 dense 1-D f32 gathers cost ~1 ms total."""
    idx = hit.prim_idx
    t_safe = jnp.where(hit.hit, hit.t, 1.0)
    ns, nt = scene.spheres.count, scene.triangles.count
    table = _packed_all(scene)
    table_t = jnp.transpose(table)        # [28, Ntot]; folded at compile
    base = jnp.where(hit.prim_type == PRIM_TRIANGLE, ns,
                     jnp.where(hit.prim_type == PRIM_BOX, ns + nt, 0))
    row = jnp.clip(idx + base, 0, table.shape[0] - 1)
    g = tuple(table_t[k][row] for k in range(_PACK_COLS))
    is_sph = hit.prim_type == PRIM_SPHERE
    is_tri = hit.prim_type == PRIM_TRIANGLE
    is_box = hit.prim_type == PRIM_BOX

    def sel_cols(mask, default, ncols):
        """Benign default-row components for wrong-type lanes; columns a
        decoder never reads stay as cheap zeros."""
        zero = jnp.zeros_like(g[0])
        return tuple(
            jnp.where(mask, g[k], float(default[k])) if k < ncols else zero
            for k in range(_PACK_COLS)
        )

    sp = _sphere_record_soa(sel_cols(is_sph, _SPHERE_DEFAULT_ROW, 5),
                            o, d, t_safe)
    tp = _triangle_record_soa(sel_cols(is_tri, _TRI_DEFAULT_ROW, 28),
                              o, d, t_safe)

    def sel(mask, a, b):
        if isinstance(a, tuple):
            return soa.where(mask, b, a)
        return jnp.where(mask, b, a)

    parts = tuple(sel(is_tri, sp[i], tp[i]) for i in range(8))
    if scene.boxes is not None:
        bp = _box_record_soa(sel_cols(is_box, _BOX_DEFAULT_ROW, 13),
                             o, d, t_safe)
        parts = tuple(sel(is_box, parts[i], bp[i]) for i in range(8))
    p, normal, tangent, bitangent, front, u, v, mat = parts
    return HitRecordSoa(
        t=hit.t, p=p, normal=normal, tangent=tangent, bitangent=bitangent,
        front_face=front, u=u, v=v, mat=mat, hit=hit.hit,
    )


def ray_features_soa(o, d):
    """SoA twin of ray_features, TRANSPOSED: component tuples -> [16, N].

    Row-major stacking of [N] component rows is a dense contiguous write;
    assembling [N, 16] from columns costs a 16-way [N, 1] concatenate
    (~3 ms at 262k lanes on v5e). The Pallas kernel consumes the [16, B]
    block and transposes in VMEM (see pallas_intersect)."""
    m = soa.cross(o, d)
    od = soa.dot(o, d)
    oo = soa.dot(o, o)
    dd = soa.dot(d, d)
    one = jnp.ones_like(od)
    zero = jnp.zeros_like(od)
    return jnp.stack(
        [d[0], d[1], d[2], o[0], o[1], o[2], m[0], m[1], m[2],
         od, oo, one, dd, zero, zero, zero], axis=0,
    )


def intersect_soa(scene: Scene, o, d, tmin) -> Hit:
    """SoA twin of intersect: o, d are component tuples of [N] arrays."""
    if intersect_dispatch(scene, tmin) == "pallas":
        from . import pallas_intersect

        return pallas_intersect.intersect_brute_pallas_od(scene, o, d, tmin)
    return intersect(scene, soa.pack(o), soa.pack(d), tmin)


def make_record(scene: Scene, o, d, hit: Hit) -> HitRecord:
    """Gather full shading data for the closest hits (deferred shading).

    Miss lanes carry t = T_MAX; feeding that into the position/frame math
    overflows float32 (p ~ 1e30, |p|^2 = inf) and poisons *backward* passes
    with NaN even though the values are masked out — so record geometry is
    computed with t clamped to 1 on misses (outputs there are discarded).
    """
    idx = hit.prim_idx
    t_safe = jnp.where(hit.hit, hit.t, 1.0)
    # One global gather: rows [0,Ns) spheres, [Ns,Ns+Nt) triangles,
    # [Ns+Nt,..) boxes. Each decoder interprets the SAME gathered rows with
    # its own column layout; wrong-type lanes produce garbage that the
    # type select below masks (all decoders are division/NaN-guarded, so
    # the garbage cannot poison gradients).
    ns, nt = scene.spheres.count, scene.triangles.count
    table = _packed_all(scene)
    base = jnp.where(hit.prim_type == PRIM_TRIANGLE, ns,
                     jnp.where(hit.prim_type == PRIM_BOX, ns + nt, 0))
    g = table[jnp.clip(idx + base, 0, table.shape[0] - 1)]
    # Wrong-type lanes must see a BENIGN row, not another type's columns:
    # garbage magnitudes (e.g. an affine minv row read as a sphere center)
    # survive the forward select but overflow the *backward* chain
    # (normalize grads cube the length) into NaN on masked lanes.
    is_sph = hit.prim_type == PRIM_SPHERE
    is_tri_m = hit.prim_type == PRIM_TRIANGLE
    is_box_m = hit.prim_type == PRIM_BOX
    sel_row = lambda m, default: jnp.where(m[:, None], g, default)
    sp = _sphere_record_from(sel_row(is_sph, _SPHERE_DEFAULT_ROW),
                             o, d, t_safe)
    tp = _triangle_record_from(sel_row(is_tri_m, _TRI_DEFAULT_ROW),
                               o, d, t_safe)

    is_tri = (hit.prim_type == PRIM_TRIANGLE)

    def sel(mask, a, b):
        return jnp.where(mask[:, None] if a.ndim == 2 else mask, b, a)

    parts = tuple(sel(is_tri, sp[i], tp[i]) for i in range(8))
    if scene.boxes is not None:
        bp = _box_record_from(sel_row(is_box_m, _BOX_DEFAULT_ROW),
                              o, d, t_safe)
        parts = tuple(sel(is_box_m, parts[i], bp[i]) for i in range(8))
    p, normal, tangent, bitangent, front, u, v, mat = parts
    return HitRecord(
        t=hit.t, p=p, normal=normal, tangent=tangent, bitangent=bitangent,
        front_face=front, u=u, v=v, mat=mat, hit=hit.hit,
    )
