"""Binned-pair Pallas intersector: work exactly proportional to per-ray
chunk overlap.

The union-cull kernel (pallas_intersect.py) executes, per 512-ray block,
every MM_PAD-wide coefficient chunk ANY ray in the block can reach — for
incoherent bounce batches that union approaches the whole scene even though
a single ray overlaps only a handful of chunk AABBs (measured mean ~7 of 26
on the showcase scene; the gap widens with finer chunks).

This module bins (ray, chunk) PAIRS instead, the wavefront analog of ray
binning in GPU path tracers:

  1. XLA: exact per-ray slab tests against every MM_FINE-wide chunk AABB
     -> ok[N, C] (pure VPU, per-axis accumulation so no [N, C, 3] bloat).
  2. XLA: chunk-major pair compaction — counting-sort arithmetic (cumsum +
     one scatter) assigns each overlapping (ray, chunk) a slot grouped by
     chunk and padded per chunk to the kernel block size; gather builds the
     component-major pair ray table [8, PAIR_CAP] (component-major: a
     [PAIR_CAP, 8] layout would pad its minor dim 8 -> 128 on TPU).
  3. Pallas: ONE persistent program walks chunks (outer fori over C) and
     each chunk's dynamic run of pair blocks (inner fori, counts prefetched
     to SMEM), DMAs each [8, B] pair block in, computes the chunk's
     candidate t for all pairs with one [G*FINE, 16] @ [16, B] MXU matmul
     (coefficients VMEM-resident, chunk block = static-stride leading-index
     slice of MMTables.*_coeff_t) + the transposed epilogue, reduces to the
     per-pair closest (t, code), and DMAs the results out. No per-chunk
     culling branches: every block processed is real work.
  4. XLA: per-ray closest hit via two f32 scatter-mins (t, then the packed
     (type, index) code among t-ties), reproducing the linear-scan oracle's
     tie-breaking (first hit in scan order == smallest code) exactly.

Hit-set parity: same matmul precision (HIGHEST) and epilogue arithmetic as
intersect_brute_mm, and the [tmin, best_t) candidate window only ever
excludes candidates that lose the global min anyway, so results are
bit-identical to the union-cull kernel and the XLA scan by construction.

Capacity: codes pack (type, prim index) as type * 2^23 + idx in f32 —
exact for up to 2^23 primitives per type.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import T_MAX
from ..models.geometry import PRIM_SPHERE, PRIM_TRIANGLE
from .intersect import MM_FINE, Hit

# Pairs per kernel block (one DMA + one matmul per block). 1024 is the
# minimum: 1-D HBM DMA slices must be aligned to the (1024) tiling.
PAIR_BLOCK = 1024
# f32-exact packed-code sentinel / type offset (see module docstring).
_CODE_TRI = float(1 << 23)
_CODE_BIG = float(1 << 24)


# ---------------------------------------------------------------------------
# XLA side: overlap tests + pair compaction
# ---------------------------------------------------------------------------

def _chunk_overlap(o, d, bounds):
    """ok[N, C]: exact slab test of every ray against every chunk AABB
    (aabb.hpp:44-66 semantics with the [0, inf) ray span; empty/padding
    chunks are rejected by the inverted-bounds check)."""
    n, c = o.shape[0], bounds.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    tn = jnp.full((n, c), -jnp.inf, jnp.float32)
    tf = jnp.full((n, c), jnp.inf, jnp.float32)
    for ax in range(3):
        t0 = (bounds[None, :, ax] - o[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        t1 = (bounds[None, :, 3 + ax] - o[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    return (tn <= tf) & (tf > 0.0) & (bounds[None, :, 0] <= bounds[None, :, 3])


def _build_pairs(o, d, bounds, pair_cap):
    """Chunk-major pair table from the overlap mask.

    Returns (pair_od f32[8, pair_cap+B], ray_of_pair i32[pair_cap+B],
    block_counts i32[C], block_starts i32[C]). Pair slots of chunk c occupy
    blocks [starts[c], starts[c] + counts[c]); in-block padding slots and
    the overflow tail carry the sentinel ray id N (combined away by the
    overflow row of the scatter-min). All bookkeeping runs in f32 (counts
    < 2^24) to stay on the TPU vector path.
    """
    n = o.shape[0]
    c = bounds.shape[0]
    b = PAIR_BLOCK
    ok = _chunk_overlap(o, d, bounds)

    okf = ok.astype(jnp.float32)
    within = jnp.cumsum(okf, axis=0)                    # [N, C] inclusive
    cnt = within[-1]                                    # [C]
    blocks = jnp.ceil(cnt / b)                          # [C] f32
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(blocks)[:-1]]
    )
    base = starts * b                                   # pair slot base per chunk

    # Scatter each overlapping (ray, chunk) into its slot; non-overlapping
    # entries and anything past pair_cap land in the overflow tail.
    slot = jnp.where(ok, base[None, :] + within - 1.0, float(pair_cap))
    slot = jnp.minimum(slot, float(pair_cap)).astype(jnp.int32)
    # Masked entries write the sentinel id into the overflow slot (writing
    # their real ray id there would attach the unprocessed tail's garbage
    # t/code to that ray in the combine step).
    ray_ids = jnp.where(
        ok, jnp.arange(n, dtype=jnp.float32)[:, None], float(n)
    )
    ray_of_pair = (
        jnp.full((pair_cap + b,), float(n), jnp.float32)
        .at[slot.reshape(-1)].set(ray_ids.reshape(-1))
    )

    # Component-major pair ray table: rows (ox, oy, oz, dx, dy, dz, 0, 0);
    # the sentinel column N is all-zero (decodes as never-hitting).
    od_cols = jnp.concatenate(
        [o, d], axis=1
    )  # [N, 6]
    od_cols = jnp.concatenate(
        [od_cols, jnp.zeros((1, 6), jnp.float32)], axis=0
    ).T                                                  # [6, N+1]
    ridx = ray_of_pair.astype(jnp.int32)
    pair_od = jnp.concatenate(
        [od_cols[:, ridx], jnp.zeros((2, pair_cap + b), jnp.float32)], axis=0
    )                                                    # [8, pair_cap+B]
    return pair_od, ridx, blocks.astype(jnp.int32), starts.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _feats_t(od):
    """Component-major ray features [16, B] from od rows [8, B].

    Row convention matches intersect.ray_features columns:
    0:3 d, 3:6 o, 6:9 o x d, 9 o.d, 10 |o|^2, 11 one, 12 |d|^2, 13:16 zero.
    """
    o = od[0:3]
    d = od[3:6]
    m = jnp.stack([
        o[1] * d[2] - o[2] * d[1],
        o[2] * d[0] - o[0] * d[2],
        o[0] * d[1] - o[1] * d[0],
    ])
    dot_od = jnp.sum(o * d, axis=0, keepdims=True)
    oo = jnp.sum(o * o, axis=0, keepdims=True)
    dd = jnp.sum(d * d, axis=0, keepdims=True)
    one = jnp.ones_like(dot_od)
    zero3 = jnp.zeros_like(m)
    return jnp.concatenate([d, o, m, dot_od, oo, one, dd, zero3], axis=0)


def _sphere_t_cols(h, c, a, tmin):
    """Transposed sphere epilogue: h/c [FINE, B], a [1, B] -> t [FINE, B].

    Same root-selection semantics as intersect.sphere_candidate_t_mm
    (sphere.hpp:18-39); the tmax window is T_MAX here — candidates beyond
    the eventual winner lose the closest-hit min regardless.
    """
    disc = h * h - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / a
    root0 = (h - sq) * inv_a
    root1 = (h + sq) * inv_a
    ok0 = (root0 > tmin) & (root0 < T_MAX)
    ok1 = (root1 > tmin) & (root1 < T_MAX)
    root = jnp.where(ok0, root0, root1)
    valid = (disc >= 0.0) & (ok0 | ok1)
    return jnp.where(valid, root, T_MAX)


def _tri_t_cols(det, u_num, v_num, t_num, tmin):
    """Transposed Moeller-Trumbore epilogue, all [FINE, B] (same hit set as
    intersect.triangle_candidate_t_mm / triangle.hpp:17-82)."""
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
        & (t > tmin)
        & (t < T_MAX)
    )
    return jnp.where(valid, t, T_MAX)


def _closest_in_chunk(t_cols, row_base, n_rows, code_base):
    """Reduce candidate columns [FINE, B] to per-pair (t [B], code [B])."""
    fine = t_cols.shape[0]
    rows = row_base + jax.lax.broadcasted_iota(jnp.int32, (fine, 1), 0)
    t_cols = jnp.where(rows < n_rows, t_cols, T_MAX)
    t = jnp.min(t_cols, axis=0)
    # First (lowest-index) row attaining the min — matches jnp.argmin and
    # the scan oracle's keep-first semantics. (tpu.iota is integer-only.)
    row_f = jax.lax.broadcasted_iota(
        jnp.int32, t_cols.shape, 0
    ).astype(jnp.float32)
    code = jnp.min(
        jnp.where(t_cols == t[None, :], code_base + row_f, _CODE_BIG), axis=0
    )
    return t, jnp.where(t < T_MAX, code, _CODE_BIG)


def _binned_kernel(counts_ref, starts_ref, tmin_ref,
                   od_hbm, scoeff_ref, tcoeff_ref,
                   t_hbm, code_hbm,
                   od_vmem, t_vmem, code_vmem, in_sem, out_sem,
                   *, n_sph_chunks, n_spheres, n_tris):
    """One persistent program: outer loop over chunks, inner loop over each
    chunk's pair blocks (dynamic trip counts from SMEM)."""
    b = PAIR_BLOCK
    tmin = tmin_ref[0]
    n_chunks = counts_ref.shape[0]

    def chunk_body(ci, _):
        n_blocks = counts_ref[ci]
        start = starts_ref[ci]

        def block_body(k, _):
            slot = (start + k) * b
            cp_in = pltpu.make_async_copy(
                od_hbm.at[:, pl.ds(slot, b)], od_vmem, in_sem
            )
            cp_in.start()
            cp_in.wait()
            feats = _feats_t(od_vmem[:])             # [16, B]
            a = feats[12:13]

            def sphere_case(_):
                coeff = scoeff_ref[ci]               # [2*FINE, 16]
                out = jax.lax.dot_general(
                    coeff, feats,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                    # [2*FINE, B]
                t_cols = _sphere_t_cols(
                    out[:MM_FINE], out[MM_FINE:], a, tmin
                )
                return _closest_in_chunk(
                    t_cols, ci * MM_FINE, n_spheres,
                    (ci * MM_FINE).astype(jnp.float32),
                )

            def tri_case(_):
                tci = ci - n_sph_chunks
                coeff = tcoeff_ref[tci]              # [4*FINE, 16]
                out = jax.lax.dot_general(
                    coeff, feats,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                    # [4*FINE, B]
                g = [out[i * MM_FINE:(i + 1) * MM_FINE] for i in range(4)]
                t_cols = _tri_t_cols(g[0], g[1], g[2], g[3], tmin)
                return _closest_in_chunk(
                    t_cols, tci * MM_FINE, n_tris,
                    _CODE_TRI + (tci * MM_FINE).astype(jnp.float32),
                )

            t, code = jax.lax.cond(
                ci < n_sph_chunks, sphere_case, tri_case, None
            )
            t_vmem[:] = t
            code_vmem[:] = code
            cp_t = pltpu.make_async_copy(
                t_vmem, t_hbm.at[pl.ds(slot, b)], out_sem
            )
            cp_t.start()
            cp_t.wait()
            cp_c = pltpu.make_async_copy(
                code_vmem, code_hbm.at[pl.ds(slot, b)], out_sem
            )
            cp_c.start()
            cp_c.wait()
            return 0

        jax.lax.fori_loop(0, n_blocks, block_body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_sph_chunks", "n_spheres", "n_tris", "pair_cap",
                     "interpret"),
)
def _binned_call(pair_od, counts, starts, tmin, scoeff_t, tcoeff_t,
                 *, n_sph_chunks, n_spheres, n_tris, pair_cap,
                 interpret=False):
    b = PAIR_BLOCK
    n_slots = pair_cap + b
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # counts, starts, tmin
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # pair od (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere coeff blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tri coeff blocks
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),    # t (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),    # code (HBM)
        ),
        scratch_shapes=[
            pltpu.VMEM((8, b), jnp.float32),
            pltpu.VMEM((b,), jnp.float32),
            pltpu.VMEM((b,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _binned_kernel, n_sph_chunks=n_sph_chunks, n_spheres=n_spheres,
        n_tris=n_tris,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_slots,), jnp.float32),
            jax.ShapeDtypeStruct((n_slots,), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(counts, starts, tmin, pair_od, scoeff_t, tcoeff_t)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def intersect_brute_binned(scene, o, d, tmin, *, interpret: bool = False) -> Hit:
    """Closest hit over all primitives via (ray, chunk) pair binning.

    Drop-in for pallas_intersect.intersect_brute_pallas (scalar tmin);
    hit-set-identical by construction (see module docstring).
    """
    n = o.shape[0]
    mm = scene.mm
    sbounds = jnp.asarray(mm.sphere_bounds)
    tbounds = jnp.asarray(mm.tri_bounds)
    bounds = jnp.concatenate([sbounds, tbounds], axis=0)
    n_sph_chunks = sbounds.shape[0]
    c = bounds.shape[0]
    b = PAIR_BLOCK
    # Exact capacity: every chunk fully overlapped plus per-chunk padding.
    pair_cap = n * c + c * b

    pair_od, ridx, counts, starts = _build_pairs(o, d, bounds, pair_cap)
    tmin_arr = jnp.reshape(jnp.asarray(tmin, jnp.float32), (1,))

    t_pairs, code_pairs = _binned_call(
        pair_od, counts, starts, tmin_arr,
        jnp.asarray(mm.sphere_coeff_t), jnp.asarray(mm.tri_coeff_t),
        n_sph_chunks=n_sph_chunks,
        n_spheres=scene.spheres.count, n_tris=scene.triangles.count,
        pair_cap=pair_cap, interpret=interpret,
    )

    # Per-ray closest hit: min t, then min code among exact-t ties (the
    # scan oracle keeps the first strictly-closer hit; first in scan order
    # == smallest (type, index) code). Sentinel/padding pairs route to the
    # overflow row n, sliced off below (their t/code may be garbage or NaN
    # from unprocessed slots — jnp.minimum quarantines that in row n).
    best_t = jnp.full((n + 1,), T_MAX, jnp.float32).at[ridx].min(t_pairs)
    bt_of_pair = best_t[ridx]
    code_m = jnp.where(t_pairs <= bt_of_pair, code_pairs, _CODE_BIG)
    best_code = (
        jnp.full((n + 1,), _CODE_BIG, jnp.float32).at[ridx].min(code_m)
    )
    t = best_t[:n]
    code = best_code[:n]
    hit = t < T_MAX
    is_tri = code >= _CODE_TRI
    idx = jnp.where(is_tri, code - _CODE_TRI, code)
    return Hit(
        t=jnp.where(hit, t, T_MAX),
        prim_type=jnp.where(
            hit & is_tri, PRIM_TRIANGLE, PRIM_SPHERE
        ).astype(jnp.int32),
        prim_idx=jnp.where(hit, idx, 0.0).astype(jnp.int32),
        hit=hit,
    )
