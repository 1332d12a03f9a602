"""Fused Pallas TPU kernel for brute-force closest-hit (SURVEY §7/S5).

The XLA scan in intersect.intersect_brute_mm is HBM-bandwidth-bound: every
chunk's [N, G*CHUNK] matmul output and epilogue temporaries round-trip to
HBM. This kernel keeps the ENTIRE coefficient table resident in VMEM
(a few MB even for ~10^4 primitives) and runs matmul -> epilogue ->
min-reduce per ray block without touching HBM, so the only memory traffic
is rays in / closest hits out (~48 B per ray).

Same math as the MXU matmul formulation (see intersect.py): ray features
[N,16] against per-primitive coefficient columns; the epilogues are the
*shared* functions sphere_candidate_t_mm / triangle_candidate_t_mm, so the
kernel is hit-set-identical to the XLA path by construction.

Chunk culling: primitive tables are Morton-ordered (GeometryBuilder.pack),
so every CHUNK_PRIMS-wide coefficient chunk has a tight AABB
(MMTables.sphere_bounds / tri_bounds). For each ray block the kernel forms
the conservative reachable box {o + t*d : o in block origin AABB,
d in block direction AABB, 0 <= t <= max(best_t)} per axis and skips chunks
whose AABB cannot overlap it. The max(best_t) bound tightens as closer hits
are found, so the cull doubles as occlusion culling. With coherent blocks
(primary rays, or pool lanes sorted by direction octant + origin Morton —
see ops/wavefront.py) most chunks are skipped; fully incoherent blocks
degrade to the dense scan, never worse than correct.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import T_MAX
from ..models.geometry import PRIM_BOX, PRIM_SPHERE, PRIM_TRIANGLE
from .intersect import (
    Hit,
    MM_FINE,
    RAY_FEATURE_DIM,
    box_candidate_t_mm,
    ray_features,
    sphere_candidate_t_mm,
    triangle_candidate_t_mm,
)


def _coarsen_bounds(fine):
    """Union MM_FINE-granularity chunk AABBs into CHUNK_PRIMS-wide ones.

    fine f32[Cf, 6] with inverted-infinite empty rows; groups of
    CHUNK_PRIMS/MM_FINE rows union into one row (all-empty groups stay
    empty). Operates on constants, so XLA folds it away at compile time.
    """
    g = CHUNK_PRIMS // MM_FINE
    nc = fine.shape[0] // g
    r = jnp.asarray(fine).reshape(nc, g, 6)
    return jnp.concatenate([r[:, :, :3].min(1), r[:, :, 3:].max(1)], axis=1)

from .intersect import ISECT_PREC as _ISECT_PREC


def _pack_coeff(coeff):
    """Dot-ready coefficient table for the kernels: SPLITK packs HIGHEST's
    six bf16 product groups into one default-precision pass (see
    intersect.splitk_pack_coeff); HIGHEST/DEFAULT keep the f32 table for
    ablation. Called on loop-invariant scene constants, so XLA hoists /
    constant-folds the conversion out of render loops."""
    if _ISECT_PREC == "SPLITK":
        from .intersect import splitk_pack_coeff

        return splitk_pack_coeff(coeff)
    return coeff


def _dot_feats(feats):
    """feats [B, 16] f32 -> the kernel dot's left operand (see scan_tables)."""
    if _ISECT_PREC == "SPLITK":
        from .intersect import splitk_feats

        return splitk_feats(feats)
    return feats


def _isect_dot(featsk, block, interpret: bool = False):
    if _ISECT_PREC == "SPLITK":
        from .intersect import splitk_dot

        # Interpret mode executes as XLA, which needs the anti-fusion
        # barrier; compiled Mosaic has no barrier primitive (and no
        # concat-dot rewrite to defend against).
        return splitk_dot(featsk, block, in_kernel=not interpret)
    return jnp.dot(featsk, block, preferred_element_type=jnp.float32,
                   precision=getattr(jax.lax.Precision, _ISECT_PREC))

# Rays per grid program (env override for tuning sweeps).
import os as _os

BLOCK_RAYS = int(_os.environ.get("RAYTRACER_TPU_BLOCK_RAYS", 512))
# Primitive columns per inner-loop chunk. Bigger chunks amortize the
# per-invocation cost of the in-kernel dot (~3 us each, far above its FLOP
# time at K=16) against a coarser cull; 512 measured best on v5e
# (74.9 -> 66.7 ms at 358k tiled-primary rays vs 256). Must be a multiple
# of intersect.MM_FINE (chunk AABBs are unioned up from that granularity)
# and keep BLOCK_RAYS * 4 * CHUNK_PRIMS * ~6 f32 temporaries inside VMEM.
CHUNK_PRIMS = 512


def scan_tables(feats, tmin, scoeff_ref, tcoeff_ref, bcoeff_ref,
                sbounds_ref, tbounds_ref, bbounds_ref,
                *, n_spheres: int, n_tris: int, n_boxes: int,
                interpret: bool = False):
    """Closest hit of one ray block against the whole scene, inside a
    kernel whose scene tables live in VMEM refs. Shared by the standalone
    closest-hit kernel below and the fused trace+decode kernel
    (ops/fused_step.py).

    feats f32[B, 16] (ray_features rows); tmin f32[B].
    Returns (best_t [B], best_idx [B] i32, best_type [B] i32).
    """
    b = feats.shape[0]
    a = feats[:, 12:13]                       # |d|^2 (ray_features col 12)

    # Per-ray slab-test ingredients for chunk culling: direction (cols 0:3)
    # and origin (cols 3:6). Zero components get a huge finite inverse so
    # the slab arithmetic stays NaN-free (conservative either way).
    d = feats[:, 0:3]
    o = feats[:, 3:6]
    safe_d = jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    inv_d = 1.0 / safe_d                      # [B, 3]

    # Dot-ready left operand, built once per block (SPLITK: [B, 96] bf16).
    featsk = _dot_feats(feats)

    best_t = jnp.full((b,), T_MAX, jnp.float32)
    best_idx = jnp.zeros((b,), jnp.int32)
    best_type = jnp.zeros((b,), jnp.int32)

    def scan_table(coeff_ref, bounds_ref, g, epilogue, n_rows, ptype, carry):
        n_chunks = coeff_ref.shape[2] // CHUNK_PRIMS

        def body(ci, carry):
            best_t, best_idx, best_type = carry

            # Exact per-ray slab test against the chunk AABB with each
            # ray's own current best_t as the far bound, so the cull is
            # occlusion-aware per ray: the chunk runs only if at least one
            # ray in the block can still hit its box (aabb.hpp:44-66).
            box_lo = jnp.stack([bounds_ref[ci, 0], bounds_ref[ci, 1],
                                bounds_ref[ci, 2]])
            box_hi = jnp.stack([bounds_ref[ci, 3], bounds_ref[ci, 4],
                                bounds_ref[ci, 5]])
            t0 = (box_lo[None, :] - o) * inv_d   # [B, 3]
            t1 = (box_hi[None, :] - o) * inv_d
            t_near = jnp.max(jnp.minimum(t0, t1), axis=1)
            t_far = jnp.min(jnp.maximum(t0, t1), axis=1)
            can_hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < best_t)
            # Padding chunks carry inverted-infinite AABBs: cull outright.
            nonempty = bounds_ref[ci, 0] <= bounds_ref[ci, 3]
            possible = jnp.any(can_hit) & nonempty

            def do_chunk(carry):
                best_t, best_idx, best_type = carry
                # [K, G, CHUNK] -> [K, G*CHUNK]: contiguous minor merge.
                block = coeff_ref[:, :, pl.ds(ci * CHUNK_PRIMS, CHUNK_PRIMS)]
                block = block.reshape(coeff_ref.shape[0], g * CHUNK_PRIMS)
                # Default bf16 precision flips hits; SPLITK carries
                # HIGHEST's product set in one pass (see
                # intersect._scan_chunks_mm / splitk_pack_coeff).
                out = _isect_dot(featsk, block, interpret=interpret)
                groups = [out[:, i * CHUNK_PRIMS:(i + 1) * CHUNK_PRIMS]
                          for i in range(g)]
                t = epilogue(*groups, tmin, best_t)
                # Mask padding rows past the true primitive count.
                rows = ci * CHUNK_PRIMS + jax.lax.broadcasted_iota(
                    jnp.int32, (1, CHUNK_PRIMS), 1
                )
                t = jnp.where(rows < n_rows, t, T_MAX)
                cmin = jnp.min(t, axis=1)
                # min-of-masked-iota argmin: one compare + one min pass,
                # ~5 ms faster than lax.argmin's lowering at this shape
                # (same first-minimal-index semantics).
                rowf = jax.lax.broadcasted_iota(
                    jnp.int32, t.shape, 1
                ).astype(jnp.float32)
                carg = jnp.min(
                    jnp.where(t == cmin[:, None], rowf, float(CHUNK_PRIMS)),
                    axis=1,
                ).astype(jnp.int32)
                better = cmin < best_t
                best_t = jnp.where(better, cmin, best_t)
                best_idx = jnp.where(better, ci * CHUNK_PRIMS + carg, best_idx)
                best_type = jnp.where(better, ptype, best_type)
                return best_t, best_idx, best_type

            return jax.lax.cond(possible, do_chunk, lambda c: c, carry)

        # Small tables: unroll (each fori_loop iteration carries real
        # per-step overhead on this backend; showcase-scale tables have
        # 1-4 chunks each). Big tables keep the rolled loop to bound
        # program size.
        if n_chunks <= 8:
            for ci in range(n_chunks):
                carry = body(ci, carry)
            return carry
        return jax.lax.fori_loop(0, n_chunks, body, carry)

    if n_spheres:
        best_t, best_idx, best_type = scan_table(
            scoeff_ref, sbounds_ref, 2,
            lambda h, c, lo, hi: sphere_candidate_t_mm(h, c, a, lo, hi),
            n_spheres, PRIM_SPHERE, (best_t, best_idx, best_type),
        )
    if n_tris:
        best_t, best_idx, best_type = scan_table(
            tcoeff_ref, tbounds_ref, 4, triangle_candidate_t_mm,
            n_tris, PRIM_TRIANGLE, (best_t, best_idx, best_type),
        )
    if n_boxes:
        best_t, best_idx, best_type = scan_table(
            bcoeff_ref, bbounds_ref, 6, box_candidate_t_mm,
            n_boxes, PRIM_BOX, (best_t, best_idx, best_type),
        )
    return best_t, best_idx, best_type


def _closest_hit_kernel(tmin_ref, feats_ref, scoeff_ref, tcoeff_ref,
                        bcoeff_ref, sbounds_ref, tbounds_ref, bbounds_ref,
                        t_ref, idx_ref, type_ref,
                        *, n_spheres: int, n_tris: int, n_boxes: int,
                        interpret: bool = False):
    """One ray block vs the whole scene; scene tables live in VMEM.

    feats_ref is TRANSPOSED [16, B]: the host-side stack of 16 component
    rows is a dense contiguous write, where assembling [B, 16] in XLA costs
    a 16-way [P, 1] concatenate (~3 ms at 262k lanes). The in-kernel
    transpose back to [B, 16] is a VMEM-local relayout (~us).
    """
    feats = feats_ref[:].T                    # [B, 16]
    b = feats.shape[0]
    tmin = jnp.full((b,), tmin_ref[0, 0])
    best_t, best_idx, best_type = scan_tables(
        feats, tmin, scoeff_ref, tcoeff_ref, bcoeff_ref,
        sbounds_ref, tbounds_ref, bbounds_ref,
        n_spheres=n_spheres, n_tris=n_tris, n_boxes=n_boxes,
        interpret=interpret,
    )
    t_ref[:] = best_t[:, None]
    idx_ref[:] = best_idx[:, None]
    type_ref[:] = best_type[:, None]


def feats_rows_from_od(o, d):
    """The 16 ray-feature rows (ray_features order) from o/d component
    vectors — shared by the in-kernel builders so the math is identical
    to intersect.ray_features_soa."""
    o0, o1, o2 = o
    d0, d1, d2 = d
    m0 = o1 * d2 - o2 * d1
    m1 = o2 * d0 - o0 * d2
    m2 = o0 * d1 - o1 * d0
    od = o0 * d0 + o1 * d1 + o2 * d2
    oo = o0 * o0 + o1 * o1 + o2 * o2
    dd = d0 * d0 + d1 * d1 + d2 * d2
    one = jnp.ones_like(od)
    zero = jnp.zeros_like(od)
    return [d0, d1, d2, o0, o1, o2, m0, m1, m2, od, oo, one, dd,
            zero, zero, zero]


def _closest_hit_kernel_od(tmin_ref, od_ref,
                           scoeff_ref, tcoeff_ref, bcoeff_ref,
                           sbounds_ref, tbounds_ref, bbounds_ref,
                           t_ref, idx_ref, type_ref,
                           *, n_spheres: int, n_tris: int, n_boxes: int,
                           interpret: bool = False):
    """Closest hit straight from o/d rows (od_ref [6, B]: ox oy oz dx dy
    dz): the 16-row feature matrix is built IN-KERNEL (cheap VPU math on
    the block), so the [16, P] feats array never materializes in HBM —
    the XLA side stacks only 6 rows instead of 16 and the fused loop
    saves 10 rows/step of HBM traffic. (o/d ride one 2-D array because
    1-D lane blocks must be multiples of the T(1024) layout; a 2-D
    [6, 512] block has no such constraint.)"""
    o = (od_ref[0, :], od_ref[1, :], od_ref[2, :])
    d = (od_ref[3, :], od_ref[4, :], od_ref[5, :])
    feats = jnp.stack(feats_rows_from_od(o, d), axis=0).T   # [B, 16]
    b = feats.shape[0]
    tmin = jnp.full((b,), tmin_ref[0, 0])
    best_t, best_idx, best_type = scan_tables(
        feats, tmin, scoeff_ref, tcoeff_ref, bcoeff_ref,
        sbounds_ref, tbounds_ref, bbounds_ref,
        n_spheres=n_spheres, n_tris=n_tris, n_boxes=n_boxes,
        interpret=interpret,
    )
    t_ref[:] = best_t[:, None]
    idx_ref[:] = best_idx[:, None]
    type_ref[:] = best_type[:, None]


@functools.partial(jax.jit, static_argnames=("n_spheres", "n_tris", "n_boxes",
                                              "interpret"))
def _closest_hit_call_od(od6, scoeff, tcoeff, bcoeff, sbounds, tbounds,
                         bbounds, tmin, *, n_spheres, n_tris, n_boxes,
                         interpret=False):
    n = od6.shape[1]
    n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
    if n_pad != n:
        od6 = jnp.pad(od6, ((0, 0), (0, n_pad - n)), constant_values=1.0)
    grid = (n_pad // BLOCK_RAYS,)

    kernel = functools.partial(
        _closest_hit_kernel_od, n_spheres=n_spheres, n_tris=n_tris,
        n_boxes=n_boxes, interpret=interpret,
    )
    t, idx, ptype = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((6, BLOCK_RAYS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(scoeff.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tcoeff.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bcoeff.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sbounds.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tbounds.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(bbounds.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_RAYS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_RAYS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_RAYS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.reshape(tmin, (1, 1)), od6, scoeff, tcoeff, bcoeff,
      sbounds, tbounds, bbounds)
    return t[:n, 0], idx[:n, 0], ptype[:n, 0]


def intersect_brute_pallas_od(scene, o, d, tmin, *,
                              interpret: bool = False) -> Hit:
    """Closest hit from o/d component tuples; features built in-kernel."""
    tmin = jnp.asarray(tmin, jnp.float32).reshape(())
    sbounds = _coarsen_bounds(scene.mm.sphere_bounds)
    tbounds = _coarsen_bounds(scene.mm.tri_bounds)
    bbounds = _coarsen_bounds(scene.mm.box_bounds)
    od6 = jnp.stack([o[0], o[1], o[2], d[0], d[1], d[2]], axis=0)
    t, idx, ptype = _closest_hit_call_od(
        od6, _pack_coeff(scene.mm.sphere_coeff),
        _pack_coeff(scene.mm.tri_coeff),
        _pack_coeff(scene.mm.box_coeff), sbounds, tbounds, bbounds, tmin,
        n_spheres=scene.spheres.count, n_tris=scene.triangles.count,
        n_boxes=scene.boxes.count if scene.boxes is not None else 0,
        interpret=interpret,
    )
    return Hit(t=t, prim_type=ptype, prim_idx=idx, hit=t < T_MAX)


@functools.partial(jax.jit, static_argnames=("n_spheres", "n_tris", "n_boxes",
                                              "interpret"))
def _closest_hit_call(feats, scoeff, tcoeff, bcoeff, sbounds, tbounds, bbounds,
                      tmin, *, n_spheres, n_tris, n_boxes, interpret=False):
    n = feats.shape[1]
    n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
    if n_pad != n:
        feats = jnp.pad(feats, ((0, 0), (0, n_pad - n)))
    grid = (n_pad // BLOCK_RAYS,)

    kernel = functools.partial(
        _closest_hit_kernel, n_spheres=n_spheres, n_tris=n_tris,
        n_boxes=n_boxes, interpret=interpret,
    )
    t, idx, ptype = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((RAY_FEATURE_DIM, BLOCK_RAYS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(scoeff.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tcoeff.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bcoeff.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sbounds.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tbounds.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(bbounds.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_RAYS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_RAYS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_RAYS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.reshape(tmin, (1, 1)), feats, scoeff, tcoeff, bcoeff,
      sbounds, tbounds, bbounds)
    return t[:n, 0], idx[:n, 0], ptype[:n, 0]


def _sort_key(o, d, bounds):
    """Per-ray coherence bucket: (index of nearest overlapped chunk) * 8 +
    direction octant; rays overlapping nothing share the last bucket.

    Rays that enter the scene through the same coefficient chunk and travel
    in the same octant overlap nearly identical chunk *sets*, so grouping
    them into the same 512-ray kernel blocks makes the per-block union cull
    approach the per-ray overlap count (measured mean ~7 of 26 chunks on the
    showcase scene vs ~26 for unsorted bounce blocks).
    """
    c = bounds.shape[0]
    n = o.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    # Per-axis accumulation keeps every temporary [N, C] (a [N, C, 3] bcast
    # would pad its minor dim 3 -> 128 on TPU: 42x memory bloat).
    tn = jnp.full((n, c), -jnp.inf, jnp.float32)
    tf = jnp.full((n, c), jnp.inf, jnp.float32)
    for ax in range(3):
        t0 = (bounds[None, :, ax] - o[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        t1 = (bounds[None, :, 3 + ax] - o[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    ok = (tn <= tf) & (tf > 0.0) & (bounds[None, :, 0] <= bounds[None, :, 3])
    first = jnp.argmin(jnp.where(ok, jnp.maximum(tn, 0.0), jnp.inf), axis=1)
    first = jnp.where(jnp.any(ok, axis=1), first, c).astype(jnp.int32)
    octant = (
        ((d[:, 0] > 0).astype(jnp.int32) << 2)
        | ((d[:, 1] > 0).astype(jnp.int32) << 1)
        | (d[:, 2] > 0).astype(jnp.int32)
    )
    return first, octant, c + 1


def _counting_dest(bkey, n_buckets):
    """Stable counting-sort destination slots: dest[i] = output position.

    f32 arithmetic keeps the cumsum/gather on the TPU vector path (counts
    < 2^24 are exact). The one-hot matrix is [N, B]; keep B small (radix
    digits) — at B in the hundreds the cumsum's memory traffic blows up.
    """
    onehot = bkey[:, None] == jnp.arange(n_buckets, dtype=bkey.dtype)[None, :]
    within = jnp.cumsum(onehot.astype(jnp.float32), axis=0)  # [N, B]
    totals = within[-1]
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(totals)[:-1]]
    )
    rank = jnp.take_along_axis(within, bkey[:, None], axis=1)[:, 0] - 1.0
    return (base[bkey] + rank).astype(jnp.int32)


def _invert_perm(dest):
    """order[dest[i]] = i, via one f32 scatter (values < 2^24, exact)."""
    n = dest.shape[0]
    return (
        jnp.zeros((n,), jnp.float32)
        .at[dest].set(jnp.arange(n, dtype=jnp.float32))
        .astype(jnp.int32)
    )


def _radix_order(minor_key, major_key, n_major):
    """Permutation grouping lanes by (major_key, minor_key): LSD radix of
    two counting-sort passes. Returns (order, dest)."""
    dest1 = _counting_dest(minor_key, 8)
    order1 = _invert_perm(dest1)
    major1 = major_key.astype(jnp.float32)[order1].astype(jnp.int32)
    dest2 = _counting_dest(major1, n_major)
    # Lane i goes to slot dest2[dest1[i]].
    dest = dest2.astype(jnp.float32)[dest1].astype(jnp.int32)
    return _invert_perm(dest), dest


def intersect_brute_pallas_feats(scene, feats, tmin, *,
                                 interpret: bool = False) -> Hit:
    """Closest hit from prebuilt ray features (intersect.ray_features_soa):
    the SoA hot loop builds [N, 16] directly from component arrays, so no
    [N, 3] o/d arrays ever materialize."""
    tmin = jnp.asarray(tmin, jnp.float32).reshape(())
    sbounds = _coarsen_bounds(scene.mm.sphere_bounds)
    tbounds = _coarsen_bounds(scene.mm.tri_bounds)
    bbounds = _coarsen_bounds(scene.mm.box_bounds)
    t, idx, ptype = _closest_hit_call(
        feats, _pack_coeff(scene.mm.sphere_coeff),
        _pack_coeff(scene.mm.tri_coeff), _pack_coeff(scene.mm.box_coeff),
        sbounds, tbounds, bbounds, tmin,
        n_spheres=scene.spheres.count, n_tris=scene.triangles.count,
        n_boxes=scene.boxes.count if scene.boxes is not None else 0,
        interpret=interpret,
    )
    return Hit(t=t, prim_type=ptype, prim_idx=idx, hit=t < T_MAX)


def intersect_brute_pallas(scene, o, d, tmin, *, interpret: bool = False,
                           sort_rays: bool = False) -> Hit:
    """Closest hit over all primitives; drop-in for intersect_brute_mm.

    tmin must be a scalar here (the integrator always passes T_MIN).
    When sort_rays is set, rays are grouped into coherent kernel blocks by a
    (nearest-chunk, octant) counting sort and the results are permuted back
    — a pure scheduling change (identical hit set) that feeds the per-block
    chunk cull. Measured on v5e at 262k lanes / 26 chunks: the sort+permutes
    cost ~25 ms against ~7 ms of kernel savings, so it stays off by default;
    revisit for scenes with many more chunks, where the cull win scales and
    the sort cost does not.
    """
    tmin = jnp.asarray(tmin, jnp.float32).reshape(())
    sbounds = _coarsen_bounds(scene.mm.sphere_bounds)
    tbounds = _coarsen_bounds(scene.mm.tri_bounds)
    bbounds = _coarsen_bounds(scene.mm.box_bounds)
    order = None
    if sort_rays:
        bounds = jnp.concatenate([sbounds, tbounds, bbounds], axis=0)
        chunk_key, octant, n_major = _sort_key(o, d, bounds)
        order, dest = _radix_order(octant, chunk_key, n_major)
        o, d = o[order], d[order]
    feats = ray_features(o, d).T
    t, idx, ptype = _closest_hit_call(
        feats, _pack_coeff(scene.mm.sphere_coeff),
        _pack_coeff(scene.mm.tri_coeff), _pack_coeff(scene.mm.box_coeff),
        sbounds, tbounds, bbounds, tmin,
        n_spheres=scene.spheres.count, n_tris=scene.triangles.count,
        n_boxes=scene.boxes.count if scene.boxes is not None else 0,
        interpret=interpret,
    )
    if order is not None:
        # Un-permute: ray i's result sits at slot dest[i]; f32 gathers stay
        # on the fast vector path (idx/ptype values are < 2^24, exact).
        t = t[dest]
        idx = idx.astype(jnp.float32)[dest].astype(jnp.int32)
        ptype = ptype.astype(jnp.float32)[dest].astype(jnp.int32)
    return Hit(t=t, prim_type=ptype, prim_idx=idx, hit=t < T_MAX)
