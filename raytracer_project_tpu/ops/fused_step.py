"""Fused pooled-wavefront step: two Pallas kernels + a thin XLA seam.

Round-3 profiling showed the pooled loop's per-step cost was NOT the
intersection kernel (12 ms of a 42-48 ms step at 262k lanes) but the ~500
XLA ops around it: record-decode gathers, shading fusions, and the
VMEM<->HBM copy churn XLA's memory-space assignment inserts between them
(562 copy-starts per step, each ~2 ms for a 1 MB lane array — measured).
Every one of those ops is fast in isolation; the composition is what XLA
schedules badly. The fix is architectural: take the whole step out of
XLA's hands.

  kernel A (trace_decode): per 512-lane block — ray-feature assembly ->
    chunk-culled MXU intersection (pallas_intersect.scan_tables) ->
    hit-record decode via a one-hot MXU matmul against the packed
    primitive table (no gathers) -> material row via one-hot matmul ->
    texture/bump/env *row index* computation. Everything VMEM-resident.

  XLA seam: the only operations Pallas cannot vectorize on TPU — dynamic
    per-lane gathers — fetch image texels / bump gradients / HDR texels
    from flat f32 tables using kernel A's row indices (~6 small 1-D
    gathers), plus the masked scatter-add of finished-path radiance.

  kernel B (shade_advance): per 4096-lane block — counter-hash RNG draws,
    branchless material scatter, sky shading, Russian roulette, path-state
    advance, and in-kernel lane respawn: the global work-queue prefix sum
    rides an SMEM scalar across the sequential TPU grid (block-local ranks
    via two small triangular matmuls), and respawned lanes regenerate
    their camera rays in-kernel.

Per-sample semantics are identical to ops/wavefront.body (same RNG
contexts, same constants, same update order); pool-vs-chunked image tests
cover the fused path end-to-end in interpret mode.

Reference parity: the fused step covers the iterative ray_color loop
(/root/reference/camera.hpp:928-986) with material.hpp scatter semantics
and camera.hpp:784-794 ray generation, at reference constants.

Scope (falls back to ops/wavefront.make_pool otherwise): full-frame
renders (identity pixel ids, or per-shard identity pixel windows) of
scenes whose coefficient tables fit the VMEM budget — beauty, the
albedo/normal/z-depth AOVs, the reflection/refraction split passes,
solid-albedo participating media (fog), and all three environment modes
are covered. Textured fog is the one remaining fallback.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import rng
from ..core.constants import (
    RAY_EPSILON,
    RR_P_MAX,
    RR_P_MIN,
    RR_START_BOUNCE,
    T_MAX,
    T_MIN,
    WEAK_RAY_EPS,
)
from ..models import environment as env_mod
from ..models import materials as mat_mod
from ..models import textures as tex_mod
from . import intersect
from .intersect import (
    _BOX_DEFAULT_ROW,
    _PACK_COLS,
    _SPHERE_DEFAULT_ROW,
    _TRI_DEFAULT_ROW,
    _box_record_soa,
    _packed_all,
    _sphere_record_soa,
    _triangle_record_soa,
    PRIM_BOX,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
)
from .pallas_intersect import _coarsen_bounds, scan_tables

# Lanes per kernel-A program (matmul block), decode kernel program, and
# kernel-B program. 1-D lane blocks must be multiples of 1024 (XLA's
# T(1024) layout for flat f32 arrays).
A_BLOCK = 512
D_BLOCK = 2048
B_BLOCK = 4096
LANE = 128  # minor dim of the [R, 128] lane-state layout

# Kernel-A output row map: ONE transposed [24, P] matrix (rows are dense
# [P] lane vectors — any per-lane [P, 1] column buffer would pad its lane
# dim 1 -> 128 in VMEM, a 128x footprint blowup across the pipeline).
_RO_HIT = 0
_RO_T = 1
_RO_N = 2        # 2:5 shading normal
_RO_TAN = 5      # 5:8 tangent
_RO_BIT = 8      # 8:11 bitangent
_RO_FRONT = 11
_RO_MTYPE = 12
_RO_PARAM = 13
_RO_BSTR = 14
_RO_BASE = 15    # 15:18 base color (non-image texture result / solid)
_RO_GU = 18      # bump u-crossing gate
_RO_GV = 19
_RO_HASB = 20
_RO_TEXROW = 21  # flat atlas row (-1 = use base color)
_RO_BUMPROW = 22
_RO_ENVROW = 23  # equirect HDR row (HDR mode; 0 otherwise)
_RO_ROWS = 24


def _pad_rows(a, mult, fill=0.0):
    n = a.shape[0]
    pad = (-n) % mult
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                    constant_values=fill)
    return a


class FusedTables(NamedTuple):
    """Scene constants consumed by the fused kernels (all jnp, traced).

    The row tables are stored TRANSPOSED ([cols, rows]): the decode
    kernel's one-hot fetch computes tableT @ onehotT -> [cols, B] so each
    fetched field is a dense [B] row slice. The untransposed orientation
    would need per-field column extraction from a [B, cols] product,
    which the Mosaic compiler handles catastrophically (8 extracted
    columns = 56 s compile, 16+ = compile-helper OOM — the round-4
    "device hang"; tools/probe_onehot2.py).

    The row tables are stored as exact bf16 digit TRIPLES ([3*cols, rows]:
    hi block, mid block, lo block — intersect.splitk_pack_rows): a one-hot
    matrix is exact in bf16, so the fetch reconstructs every f32
    bit-exactly from default-precision bf16 passes — where an f32 table
    operand would need precision=HIGHEST's six-pass emulation."""

    rectab: jax.Array     # bf16[3*28, Ntot_pad] packed primitive shading rows
    mattab: jax.Array     # bf16[3*8, M_pad] material columns (_mat_fetch order)
    texmeta: jax.Array    # bf16[3*10, K_pad] texture metadata (sample_soa order)
    atlas_rows: jax.Array   # f32[K*AH*AW, 4] image texels (r, g, b, 0)
    grad_rows: jax.Array    # f32[K*AH*AW, 2] bump neighbor deltas (du, dv)
    env_rows: jax.Array | None  # f32[EH*EW, 4] HDR texels (HDR mode only)


def build_tables(scene, env, env_mode: int) -> FusedTables:
    m = scene.materials
    mattab = jnp.stack(
        [m.albedo[:, 0], m.albedo[:, 1], m.albedo[:, 2], m.param,
         m.mtype.astype(jnp.float32), m.texture_id.astype(jnp.float32),
         m.bump_id.astype(jnp.float32), m.bump_strength], axis=1,
    )
    bank = scene.textures
    texmeta = jnp.stack(
        [bank.kind.astype(jnp.float32), bank.size[:, 0].astype(jnp.float32),
         bank.size[:, 1].astype(jnp.float32), bank.checker_inv_scale,
         bank.checker_even[:, 0], bank.checker_even[:, 1],
         bank.checker_even[:, 2], bank.checker_odd[:, 0],
         bank.checker_odd[:, 1], bank.checker_odd[:, 2]], axis=1,
    )
    # ROW-structured texel tables: the per-step seam gathers whole rows
    # ([P] row indices fetching 4/2-wide rows) instead of per-channel
    # flat indices. Gather cost on this backend is ~per-INDEX (~7 ns),
    # so 2 row gathers beat 5 flat gathers by ~7 ms/step at 262k lanes
    # (measured in loop context; the isolated numbers mislead).
    atlas_rows = jnp.reshape(bank.data, (-1, 3))
    atlas_rows = jnp.concatenate(
        [atlas_rows, jnp.zeros((atlas_rows.shape[0], 1), jnp.float32)],
        axis=1)
    grad_rows = jnp.reshape(bank.grad, (-1, 2))
    env_rows = None
    if env_mode == env_mod.HDR_MAP:
        er = jnp.reshape(env.hdr_image, (-1, 3))
        env_rows = jnp.concatenate(
            [er, jnp.zeros((er.shape[0], 1), jnp.float32)], axis=1)
    return FusedTables(
        rectab=intersect.splitk_pack_rows(
            _pad_rows(_packed_all(scene), A_BLOCK).T),
        mattab=intersect.splitk_pack_rows(_pad_rows(mattab, 8).T),
        texmeta=intersect.splitk_pack_rows(_pad_rows(texmeta, 8).T),
        atlas_rows=atlas_rows,
        grad_rows=grad_rows,
        env_rows=env_rows,
    )


# Work-id cap: kernel B's respawn decodes (pixel, sample) from the global
# work counter in f32, which is exact only below 2^24. Callers with more
# total work sample-chunk (see wavefront.render_pool / fused_spp_chunk).
_TOTAL_WORK_CAP = 1 << 24


def fused_spp_chunk(scene, config, env=None,
                    n_pixels_local: int | None = None) -> int:
    """Largest per-call spp the fused step can cover for this scene/config
    (0 = unsupported regardless of spp). render_pool uses this to
    sample-chunk big renders onto the fused engine: each chunk is
    bit-identical to the corresponding sample range of one big call
    because lane RNG streams are (pixel, sample)-keyed. Under sharding
    the cap applies to the shard's local pixel window, so shards admit
    proportionally larger spp chunks."""
    if not fused_supported(scene, config, True, env, check_spp=False):
        return 0
    n = n_pixels_local if n_pixels_local is not None else config.n_pixels
    return max(0, (_TOTAL_WORK_CAP - 1) // (2 * n))


def fused_supported(scene, config, identity_pixels: bool,
                    env=None, check_spp: bool = True) -> bool:
    """Whether the v1 fused step covers this render (else unfused pool)."""
    n_tex = int(np.prod(scene.textures.data.shape[:3]))
    if scene.mm is None:
        return False
    # The intersect kernel holds every coefficient table in VMEM; leave
    # headroom for ray blocks (v5e: 128 MB VMEM). SPLITK packing stores
    # 96 bf16 rows per 16 f32 rows (3x the bytes, intersect.
    # splitk_pack_coeff); the estimate uses the packed footprint.
    coeff_bytes = intersect.COEFF_BYTES_PER_F32 * sum(
        int(np.prod(t.shape))
        for t in (scene.mm.sphere_coeff, scene.mm.tri_coeff,
                  scene.mm.box_coeff)
    )
    # The decode kernel carries the equirect row index as f32
    # (envrow = ej*ew + ei): an HDRI at or beyond 2^24 texels would lose
    # integer precision and fetch wrong environment texels.
    env_texels = 0
    if env is not None and config.env_mode == env_mod.HDR_MAP:
        env_texels = int(np.prod(env.hdr_image.shape[:2]))
    # Fog is sampled in kernel B with the volume's albedo pre-resolved,
    # which requires solid (untextured) phase materials — the only kind
    # the builder creates by default (constant_medium fog,
    # scene_management.hpp:227-234). Textured fog falls back to the pool.
    # The marker is STRUCTURAL (None vs array) because this decision must
    # be makeable on a traced scene inside jit.
    volumes_ok = (scene.volumes is None
                  or getattr(scene.volumes, "textured", None) is None)
    return (
        volumes_ok
        and identity_pixels
        and (not check_spp
             or config.n_pixels * config.samples_per_pixel * 2
             < _TOTAL_WORK_CAP)
        and n_tex < (1 << 24)
        and env_texels < (1 << 24)
        and coeff_bytes < 48 * 1024 * 1024
    )


# ---------------------------------------------------------------------------
# Kernel A: trace + decode
# ---------------------------------------------------------------------------

def _onehot_rows(idx_f32, tableT_ref, window: int = 512):
    """table[:, idx] for a [B] f32 index vector via one-hot MXU matmuls.

    tableT_ref is the TRANSPOSED, bf16-digit-split [3*cols, rows] table
    (intersect.splitk_pack_rows); the result is [cols, B] f32 so each
    fetched field is a dense [B] row slice (``out[k, :]``). The
    orientation is load-bearing: extracting per-field COLUMNS from a
    [B, cols] product sends the Mosaic compiler into a pathological
    relayout search (8 columns = 56 s, 16+ = compile-helper OOM-kill —
    the round-4 "device hang"), while row slices of [cols, B] are free
    (0.9 s compile at 24 fields; tools/probe_onehot2.py).

    Exactness: a one-hot fetch must be bit-exact (geometry coefficients
    feed hit decisions; default bf16 passes on an f32 table put 8% of
    showcase pixels >0.05 off the unfused pool on device). The digit
    split gives that exactness at default precision: the one-hot operand
    is exact in bf16, each digit block's product is an exact f32, and
    hi + mid + lo reconstructs the stored f32 exactly (hi+mid carries
    <= 16 mantissa bits; adding lo is the exact split residual) — 3
    one-pass matmuls where an f32 table needed HIGHEST's 6 passes.

    Tables wider than `window` rows are swept in window-sized one-hot
    matmuls with accumulation, bounding the [window, B] transient (an
    unwindowed [4096, 1536] one-hot also OOM-killed the compile helper).
    The last window may be short: tables are padded to a multiple of 8,
    not of `window`.
    """
    n_rows = tableT_ref.shape[1]
    cols = tableT_ref.shape[0] // 3
    b = idx_f32.shape[0]
    idx_i = idx_f32.astype(jnp.int32)
    acc = jnp.zeros((cols, b), jnp.float32)

    def sweep(w0, acc, wlen):
        rows = jax.lax.broadcasted_iota(jnp.int32, (wlen, b), 0)
        onehotT = (rows == idx_i[None, :] - w0).astype(jnp.bfloat16)
        # Slice the REF (pl.ds): value-level dynamic_slice has no Mosaic
        # lowering.
        tab = tableT_ref[:, pl.ds(w0, wlen)]
        prod = jnp.dot(tab, onehotT, preferred_element_type=jnp.float32)
        # (hi + mid) is exact (<= 16 mantissa bits), + lo is the exact
        # split residual: bit-equal to the f32 table entry.
        return acc + ((prod[0:cols] + prod[cols:2 * cols])
                      + prod[2 * cols:3 * cols])

    n_full = n_rows // window
    if n_full > 8:
        # Big tables (e.g. a 25k-primitive rectab = 50 windows): a rolled
        # loop bounds the live registers to ONE window sweep — unrolled,
        # the register allocator spills 241 MB of scoped VMEM for the
        # funnel scene and the kernel fails to compile.
        acc = jax.lax.fori_loop(
            0, n_full, lambda w, a: sweep(w * window, a, window), acc)
    else:
        for w in range(n_full):
            acc = sweep(w * window, acc, window)
    if n_rows % window:
        # The last window may be short: tables are padded to a multiple
        # of 8, not of `window`.
        acc = sweep(n_full * window, acc, n_rows - n_full * window)
    return acc


# Kernel-A scalar params layout (SMEM f32 [1, 8]):
# [tmin, cos(yaw), sin(yaw), cos(tilt), sin(tilt), cos(roll), sin(roll), -]
_AP_TMIN = 0
_AP_ROT = 1


def _decode_kernel(
    aparams_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_ref, idx_ref, type_ref, rectab_ref, mattab_ref, texmeta_ref,
    *out_refs,
    n_spheres: int, n_tris: int, n_boxes: int, has_boxes: bool,
    atlas_hw: tuple, env_hw: tuple | None,
):
    """Kernel A2: hit-record decode + texture/bump/env row computation.

    Runs at D_BLOCK (4096) lanes per program: the decode's elementwise
    math and one-hot matmuls are cheap at that width (measured ~1 ms
    per decoder), where fusing them into the 512-lane intersect kernel
    cost a nonlinear +15 ms (VMEM/register-pressure cliff).
    """
    best_t = t_ref[:]
    best_idx = idx_ref[:]
    best_type = type_ref[:]
    b = best_t.shape[0]
    hit = best_t < T_MAX
    t_safe = jnp.where(hit, best_t, 1.0)
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])

    # --- record decode: one-hot row fetch + the shared SoA decoders ---
    is_tri = best_type == PRIM_TRIANGLE
    is_box = best_type == PRIM_BOX
    is_sph = best_type == PRIM_SPHERE
    base = jnp.where(is_tri, n_spheres,
                     jnp.where(is_box, n_spheres + n_tris, 0))
    row_f = jnp.clip((best_idx + base).astype(jnp.float32), 0.0,
                     float(rectab_ref.shape[1] - 1))
    grow = _onehot_rows(row_f, rectab_ref)    # [28, B] (transposed fetch)

    def sel_cols(mask, default, ncols):
        zero = jnp.zeros((b,), jnp.float32)
        return tuple(
            jnp.where(mask, grow[k, :], float(default[k])) if k < ncols
            else zero
            for k in range(_PACK_COLS)
        )

    from ..core import vecmath
    sp = _sphere_record_soa(sel_cols(is_sph, _SPHERE_DEFAULT_ROW, 5),
                            o, d, t_safe, acos_fn=vecmath.acos_poly,
                            atan2_fn=vecmath.atan2_poly)
    tp = _triangle_record_soa(sel_cols(is_tri, _TRI_DEFAULT_ROW, 28),
                              o, d, t_safe)

    def widen(parts):
        # Mosaic cannot select i1 vectors (i8->i1 trunci is unsupported);
        # front_face rides the select as f32 and mat as i32.
        parts = list(parts)
        parts[4] = parts[4].astype(jnp.float32)
        return parts

    def sel(mask, a, bb):
        if isinstance(a, tuple):
            return tuple(jnp.where(mask, y, x) for x, y in zip(a, bb))
        return jnp.where(mask, bb, a)

    sp, tp = widen(sp), widen(tp)
    parts = tuple(sel(is_tri, sp[i], tp[i]) for i in range(8))
    if has_boxes:
        bp = widen(_box_record_soa(sel_cols(is_box, _BOX_DEFAULT_ROW, 13),
                                   o, d, t_safe))
        parts = tuple(sel(is_box, parts[i], bp[i]) for i in range(8))
    p, normal, tangent, bitangent, front, u, v, mat = parts
    front = front > 0.5

    # --- material row via one-hot (mattab in _mat_fetch column order) ---
    mrow = _onehot_rows(
        jnp.clip(mat.astype(jnp.float32), 0.0,
                 float(mattab_ref.shape[1] - 1)),
        mattab_ref,
    )
    solid = (mrow[0, :], mrow[1, :], mrow[2, :])
    param = mrow[3, :]
    mtype = mrow[4, :]
    tex_id = mrow[5, :]
    bump_id = mrow[6, :]
    bstr = mrow[7, :]

    # --- texture row index + non-image base color (textures.sample_soa) ---
    tmeta = _onehot_rows(
        jnp.clip(tex_id, 0.0, float(texmeta_ref.shape[1] - 1)), texmeta_ref,
    )
    kind = tmeta[0, :]
    tw, th = tmeta[1, :], tmeta[2, :]
    uu = u - jnp.floor(u)
    ti = jnp.clip(jnp.floor(uu * tw), 0.0, jnp.maximum(tw - 1.0, 0.0))
    tj = jnp.clip(jnp.floor(v * th), 0.0, jnp.maximum(th - 1.0, 0.0))
    ah, aw = atlas_hw
    texrow = (jnp.maximum(tex_id, 0.0) * ah + tj) * aw + ti
    is_diel = mtype == mat_mod.DIELECTRIC
    # Dielectric attenuation is the untextured solid albedo
    # (material.hpp:193) — route it through base_color regardless of any
    # texture id so kernel B's tex3 select matches shade.scatter_soa.
    is_image = (kind == tex_mod.KIND_IMAGE) & (tex_id >= 0.0) & ~is_diel
    # Checker (parity of floored world cells) + missing-cyan + solid base.
    inv_scale = tmeta[3, :]
    cells = (jnp.floor(inv_scale * p[0]) + jnp.floor(inv_scale * p[1])
             + jnp.floor(inv_scale * p[2]))
    is_even = cells - 2.0 * jnp.floor(cells * 0.5) == 0.0
    cyan = (0.0, 1.0, 1.0)
    base_color = []
    for c in range(3):
        col = jnp.where(is_even, tmeta[4 + c, :], tmeta[7 + c, :])
        col = jnp.where(kind == tex_mod.KIND_MISSING, cyan[c], col)
        base_color.append(
            jnp.where((tex_id < 0.0) | is_diel, solid[c], col))

    # --- bump row + finite-difference crossing gates (sample_bump_deltas) ---
    bmeta = _onehot_rows(
        jnp.clip(bump_id, 0.0, float(texmeta_ref.shape[1] - 1)), texmeta_ref,
    )
    bw, bh = bmeta[1, :], bmeta[2, :]
    buu = u - jnp.floor(u)
    bi = jnp.clip(jnp.floor(buu * bw), 0.0, jnp.maximum(bw - 1.0, 0.0))
    bj = jnp.clip(jnp.floor(v * bh), 0.0, jnp.maximum(bh - 1.0, 0.0))
    bumprow = (jnp.maximum(bump_id, 0.0) * ah + bj) * aw + bi
    delta = 1.0 / 1024.0
    u2 = u + delta
    uu2 = u2 - jnp.floor(u2)
    bi2 = jnp.clip(jnp.floor(uu2 * bw), 0.0, jnp.maximum(bw - 1.0, 0.0))
    bj2 = jnp.clip(jnp.floor((v + delta) * bh), 0.0,
                   jnp.maximum(bh - 1.0, 0.0))
    has_bump = bump_id >= 0.0
    gate_u = jnp.where((bi2 != bi) & has_bump, 1.0, 0.0)
    gate_v = jnp.where((bj2 != bj) & has_bump, 1.0, 0.0)

    # --- HDR environment row (equirect yaw/tilt/roll rotation + nearest
    # lookup; environment._shade_hdr_soa / camera.hpp:837-870) ---
    envrow = jnp.zeros((b,), jnp.float32)
    if env_hw is not None:
        from ..core import soa as soa_mod
        from ..core.constants import PI
        ex, ey, ez = soa_mod.normalize(d)
        cy, sy = aparams_ref[0, _AP_ROT], aparams_ref[0, _AP_ROT + 1]
        cp, sp = aparams_ref[0, _AP_ROT + 2], aparams_ref[0, _AP_ROT + 3]
        cr, sr = aparams_ref[0, _AP_ROT + 4], aparams_ref[0, _AP_ROT + 5]
        ex, ez = cy * ex + sy * ez, -sy * ex + cy * ez
        ey, ez = cp * ey - sp * ez, sp * ey + cp * ez
        ex, ey = cr * ex - sr * ey, sr * ex + cr * ey
        # Polynomial atan2/acos: Mosaic has no transcendental arcs; the
        # ~1e-5 rad error only steers the nearest-texel equirect lookup.
        from ..core import vecmath as _vm
        phi = _vm.atan2_poly(ez, ex) + PI
        theta = _vm.acos_poly(ey)
        eh, ew = env_hw
        euu = phi / (2.0 * PI)
        euu = euu - jnp.floor(euu)
        ei = jnp.clip(jnp.floor(euu * ew), 0.0, ew - 1.0)
        ej = jnp.clip(jnp.floor(theta / PI * eh), 0.0, eh - 1.0)
        envrow = ej * ew + ei

    rows = (hit.astype(jnp.float32), best_t,
            normal[0], normal[1], normal[2],
            tangent[0], tangent[1], tangent[2],
            bitangent[0], bitangent[1], bitangent[2],
            front.astype(jnp.float32), mtype, param, bstr,
            base_color[0], base_color[1], base_color[2],
            gate_u, gate_v, jnp.where(has_bump, 1.0, 0.0),
            jnp.where(is_image, texrow, -1.0),
            jnp.where(has_bump, bumprow, 0.0),
            envrow)
    for ref, val in zip(out_refs, rows):
        ref[:] = val


def trace_decode(scene, tables: FusedTables, o, d, aparams, env_hw,
                 *, interpret=False):
    """Kernels A1+A2: intersect (the proven chunk-cull kernel, ray
    features built in-kernel from o/d) then the decode kernel at D_BLOCK
    lanes. Returns a tuple of _RO_ROWS flat [P] per-lane vectors in
    _RO_* order."""
    from . import pallas_intersect

    p_lanes = o[0].shape[0]
    hit = pallas_intersect.intersect_brute_pallas_od(
        scene, o, d, T_MIN, interpret=interpret)

    ah, aw = scene.textures.data.shape[1], scene.textures.data.shape[2]
    kernel = functools.partial(
        _decode_kernel,
        n_spheres=scene.spheres.count, n_tris=scene.triangles.count,
        n_boxes=scene.boxes.count if scene.boxes is not None else 0,
        has_boxes=scene.boxes is not None,
        atlas_hw=(float(ah), float(aw)), env_hw=env_hw,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((D_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(p_lanes // D_BLOCK,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + [lane] * 9 + [
            full(tables.rectab.shape),
            full(tables.mattab.shape),
            full(tables.texmeta.shape),
        ],
        out_specs=tuple([lane] * _RO_ROWS),
        out_shape=tuple(
            jax.ShapeDtypeStruct((p_lanes,), jnp.float32)
            for _ in range(_RO_ROWS)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(aparams, *o, *d, hit.t, hit.prim_idx, hit.prim_type,
      tables.rectab, tables.mattab, tables.texmeta)
    return out


# ---------------------------------------------------------------------------
# Kernel B: shade + advance + respawn
# ---------------------------------------------------------------------------

# Kernel-B vector params layout (f32 [1, 32] SMEM):
_BP_CENTER = 0     # 0:3   camera center
_BP_P00 = 3        # 3:6   pixel00
_BP_DU = 6         # 6:9   pixel_delta_u
_BP_DV = 9         # 9:12  pixel_delta_v
_BP_DDU = 12       # 12:15 defocus_disk_u
_BP_DDV = 15       # 15:18 defocus_disk_v
_BP_SUN_DIR = 18   # 18:21 normalized sun direction
_BP_SUN_COL = 21   # 21:24 sun color
_BP_SUN_INT = 24
_BP_SUN_SIZE = 25
_BP_INTENSITY = 26
_BP_BG = 27        # 27:30 solid background color
_BP_CAM_U = 30     # 30:33 camera right (view-space normal AOV)
_BP_CAM_V = 33     # 33:36 camera up
_BP_CAM_W = 36     # 36:39 camera backward
_BP_COLS = 40

# i32 scalar inputs [1, 4]: [seed(u32 bits), next_work, sample_offset,
#   pixel_offset]. pixel_offset supports pixel-window rendering under
# sharding: the kernel's static `n_pixels` is the LOCAL window size, lane
# `li` stays the GLOBAL pixel id (RNG streams and camera decode are
# shard-invariant), and accumulation targets are li - pixel_offset.
# f32 scalar inputs [1, 2]: [segments, -]


def _inclusive_rank(free_f):
    """Inclusive prefix count of a [B] 0/1 f32 vector via two triangular
    MXU matmuls (no scan primitive on TPU): reshape to [B/128, 128],
    within-row prefix = row @ U (U upper-tri incl. diag), row offsets via a
    strictly-lower-tri [R, R] matmul on the row sums."""
    b = free_f.shape[0]
    r = b // LANE
    m = jnp.reshape(free_f, (r, LANE))
    iu = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    ju = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    upper = (iu <= ju).astype(jnp.float32)
    within = jnp.dot(m, upper, preferred_element_type=jnp.float32)
    rowsum = within[:, LANE - 1:LANE]                     # [R, 1]
    il = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    jl = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    strict = (jl < il).astype(jnp.float32)
    offs = jnp.dot(strict, rowsum, preferred_element_type=jnp.float32)
    return jnp.reshape(within + offs, (b,))


def _sun_sky(bp, ux, uy, uz):
    """In-kernel twin of environment._shade_sun_sky_soa (camera.hpp:871-925)
    with env scalars read from the params ref."""
    from ..core import vecmath

    sdx, sdy, sdz = bp[_BP_SUN_DIR], bp[_BP_SUN_DIR + 1], bp[_BP_SUN_DIR + 2]
    sun_height = sdy
    adjusted = sun_height - 0.05
    sky_exposure = jnp.clip(adjusted * 8.0 + 1.4, 0.0, 1.0)
    day_factor = jnp.clip(adjusted * 10.0 + 1.1, 0.0, 1.0)
    sunset_i = jnp.clip(1.0 - jnp.abs(adjusted + 0.05) * 30.0, 0.0, 1.0)
    sunset = jnp.where(adjusted > -0.1, sunset_i, 0.0)
    sunset = jnp.where(sun_height < 0.0, sunset * (sun_height * 10.0 + 1.0),
                       sunset)
    sunset = jnp.clip(sunset, 0.0, 1.0)
    zen = [0.01, 0.03, 0.1]
    zday = [0.2, 0.5, 1.0]
    hor = [0.05, 0.02, 0.01]
    hday = [0.6, 0.8, 1.0]
    hsun = [1.0, 0.35, 0.1]
    scol_sunset = [1.0, 0.3, 0.1]
    visibility = jnp.clip(sun_height * 5.0 + 1.0, 0.0, 1.0)
    threshold = 1.0 - bp[_BP_SUN_SIZE] * 0.001
    sun_focus = ux * sdx + uy * sdy + uz * sdz
    alpha = vecmath.smoothstep(threshold, threshold + 0.0002, sun_focus)
    disc_on = (sun_focus > threshold) & (adjusted > -0.1)
    up = uy > 0.0
    gain = bp[_BP_INTENSITY] * 1.5 * sky_exposure
    out = []
    sun_col = (bp[_BP_SUN_COL], bp[_BP_SUN_COL + 1], bp[_BP_SUN_COL + 2])
    for k in range(3):
        zenith = zen[k] * (1.0 - day_factor) + zday[k] * day_factor
        horizon = hor[k] * (1.0 - day_factor) + hday[k] * day_factor
        horizon = horizon * (1.0 - sunset) + hsun[k] * sunset
        sky = jnp.where(up, (1.0 - uy) * horizon + uy * zenith, horizon * 0.1)
        s_col = sun_col[k] * (1.0 - sunset) + scol_sunset[k] * sunset
        disc = jnp.where(disc_on,
                         s_col * bp[_BP_SUN_INT] * visibility * alpha, 0.0)
        out.append(sky * gain + disc)
    return tuple(out)


def _raygen(bp, seed, pix_i32, samp_i32, width: int):
    """In-kernel twin of camera.generate_rays_soa + rng.draw_camera
    (camera.hpp:784-794): identical draws and math, params from the ref."""
    lr0 = rng.LaneRng(seed, pix_i32.astype(jnp.uint32),
                      samp_i32.astype(jnp.uint32), jnp.uint32(0))
    a, b2, c, dd = rng.bits4(lr0, rng.STREAM_CAMERA)
    off_x = rng._u01(a) - 0.5
    off_y = rng._u01(b2) - 0.5
    disk_r = jnp.sqrt(rng._u01(c))
    disk_t = (2.0 * jnp.pi) * rng._u01(dd)
    r0 = disk_r * jnp.cos(disk_t)
    r1 = disk_r * jnp.sin(disk_t)

    pf = pix_i32.astype(jnp.float32)
    jj = jnp.floor((pf + 0.5) * (1.0 / width))
    ii = pf - jj * width
    jj = jnp.where(ii < 0.0, jj - 1.0, jnp.where(ii >= width, jj + 1.0, jj))
    ii = pf - jj * width
    px = ii + off_x
    py = jj + off_y
    o = tuple(
        bp[_BP_CENTER + k] + r0 * bp[_BP_DDU + k] + r1 * bp[_BP_DDV + k]
        for k in range(3)
    )
    d = tuple(
        bp[_BP_P00 + k] + px * bp[_BP_DU + k] + py * bp[_BP_DV + k] - o[k]
        for k in range(3)
    )
    return o, d


def _n_aov(aovs: tuple) -> int:
    return (3 * ("albedo" in aovs) + 3 * ("normal" in aovs)
            + ("z_depth" in aovs))


def _shade_advance_kernel(
    *refs,
    n_pixels: int, width: int, total_work: int, max_depth: int,
    env_mode: int, spp: int, aux: int, z_max: float, aovs: tuple,
    want_spec: bool, use_reflection: bool, use_refraction: bool,
    n_beauty: int, n_volumes: int = 0,
):
    # Positional ref unpacking (pallas passes refs flat; the AOV/spec
    # ref counts vary with the static config).
    iscal_ref, fscal_ref, bparams_ref = refs[:3]
    if n_volumes:
        vparams_ref = refs[3]
        refs = refs[:3] + refs[4:]
    rec_refs = refs[3:3 + _RO_ROWS]
    (texr_ref, texg_ref, texb_ref, gu_ref, gv_ref,
     envr_ref, envg_ref, envb_ref) = refs[3 + _RO_ROWS:11 + _RO_ROWS]
    k = 11 + _RO_ROWS
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     thx_ref, thy_ref, thz_ref, rdx_ref, rdy_ref, rdz_ref,
     live_ref, bounce_ref, samp_ref, li_ref) = refs[k:k + 16]
    k += 16
    if want_spec:
        (spec_ref, refl_ref, refr_ref,
         a0x_ref, a0y_ref, a0z_ref) = refs[k:k + 6]
        k += 6
    out = refs[k:]
    (n_ox_ref, n_oy_ref, n_oz_ref, n_dx_ref, n_dy_ref, n_dz_ref,
     n_thx_ref, n_thy_ref, n_thz_ref, n_rdx_ref, n_rdy_ref, n_rdz_ref,
     n_live_ref, n_bounce_ref, n_samp_ref, n_li_ref) = out[:16]
    cr_ref, cg_ref, cb_ref, tgt_ref = out[16:20]
    ko = 20
    if want_spec:
        (n_spec_ref, n_refl_ref, n_refr_ref,
         n_a0x_ref, n_a0y_ref, n_a0z_ref,
         srx_ref, sry_ref, srz_ref, tgt_refl_ref,
         sfx_ref, sfy_ref, sfz_ref, tgt_refr_ref) = out[ko:ko + 14]
        ko += 14
    na = _n_aov(aovs)
    aov_refs = out[ko:ko + na]
    tgtaux_ref = out[ko + na] if aovs else None
    nw_ref, seg_ref, lc_ref = out[-6:-3]
    base_sm, seg_sm, lc_sm = out[-3:]
    from ..core import soa

    prog = pl.program_id(0)
    nprog = pl.num_programs(0)
    b = rec_refs[0].shape[0]
    bp = tuple(bparams_ref[0, k] for k in range(_BP_COLS))

    @pl.when(prog == 0)
    def _init():
        base_sm[0] = iscal_ref[0, 1]
        seg_sm[0] = fscal_ref[0, 0]
        lc_sm[0] = jnp.int32(0)

    # i32 -> u32 convert is modular in XLA/Mosaic, i.e. bit-preserving
    # (tpu.bitcast only accepts vectors).
    seed = iscal_ref[0, 0].astype(jnp.uint32)
    sample_offset = iscal_ref[0, 2]
    poff = iscal_ref[0, 3]

    rec = tuple(r[:] for r in rec_refs)
    hit = rec[_RO_HIT] > 0.5
    t_hit = rec[_RO_T]
    normal = (rec[_RO_N], rec[_RO_N + 1], rec[_RO_N + 2])
    tangent = (rec[_RO_TAN], rec[_RO_TAN + 1], rec[_RO_TAN + 2])
    bitangent = (rec[_RO_BIT], rec[_RO_BIT + 1], rec[_RO_BIT + 2])
    front = rec[_RO_FRONT] > 0.5
    mtype = rec[_RO_MTYPE]
    param = rec[_RO_PARAM]
    bstr = rec[_RO_BSTR]
    base_col = (rec[_RO_BASE], rec[_RO_BASE + 1], rec[_RO_BASE + 2])
    gate_u = rec[_RO_GU]
    gate_v = rec[_RO_GV]

    # Image-texture lanes take the gathered texel; everything else
    # (checker / solid / missing-cyan) was resolved by kernel A into
    # base_col and carries texrow == -1.
    is_image_lane = rec[_RO_TEXROW] >= -0.5
    gathered = (texr_ref[:], texg_ref[:], texb_ref[:])
    tex3 = tuple(jnp.where(is_image_lane, gathered[k], base_col[k])
                 for k in range(3))

    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    thr = (thx_ref[:], thy_ref[:], thz_ref[:])
    rad = (rdx_ref[:], rdy_ref[:], rdz_ref[:])
    live = live_ref[:] > 0
    bounce = bounce_ref[:]
    samp = samp_ref[:]
    li = li_ref[:]
    if want_spec:
        is_spec = spec_ref[:] > 0
        to_refl = refl_ref[:] > 0
        to_refr = refr_ref[:] > 0
        attn0 = (a0x_ref[:], a0y_ref[:], a0z_ref[:])
        spec_bit = spec_ref[:].astype(jnp.uint32)
    else:
        is_spec = jnp.zeros_like(live)
        spec_bit = jnp.uint32(0)
    lr = rng.LaneRng(seed, li.astype(jnp.uint32), samp.astype(jnp.uint32),
                     (bounce.astype(jnp.uint32) << jnp.uint32(1)) | spec_bit)

    # --- participating media (volumes.sample_interaction in-kernel;
    # constant_medium.hpp:39-77): per volume, boundary span clamped by
    # the surface hit, exponential free flight, override the hit record
    # with the volume's solid-albedo ISOTROPIC phase material. Same RNG
    # stream/salt as the unfused pool, so per-sample values match. ---
    if n_volumes:
        best_vt = jnp.where(hit, t_hit, T_MAX)
        vol_take = hit & False
        valb = (jnp.zeros((b,), jnp.float32),) * 3
        dd_v = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        ray_len = jnp.sqrt(dd_v)
        from ..core import vecmath as _vmv
        for v in range(n_volumes):
            vp_ = tuple(vparams_ref[v, j] for j in range(16))
            kind, cx, cy, cz, radius = vp_[0], vp_[1], vp_[2], vp_[3], vp_[4]
            bmin = vp_[5:8]
            bmax = vp_[8:11]
            nid = vp_[11]
            alb = vp_[12:15]
            oc = (cx - o[0], cy - o[1], cz - o[2])
            h_v = d[0] * oc[0] + d[1] * oc[1] + d[2] * oc[2]
            c_v = (oc[0] * oc[0] + oc[1] * oc[1] + oc[2] * oc[2]
                   - radius * radius)
            disc = h_v * h_v - dd_v * c_v
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            s_entry = (h_v - sq) / dd_v
            s_exit = (h_v + sq) / dd_v
            s_hit = (disc > 0.0) & (radius > 0.0)
            inv = tuple(
                1.0 / jnp.where(jnp.abs(d[k2]) < 1e-20,
                                jnp.where(d[k2] < 0, -1e-20, 1e-20), d[k2])
                for k2 in range(3))
            t0v = tuple((bmin[k2] - o[k2]) * inv[k2] for k2 in range(3))
            t1v = tuple((bmax[k2] - o[k2]) * inv[k2] for k2 in range(3))
            b_entry = jnp.maximum(
                jnp.maximum(jnp.minimum(t0v[0], t1v[0]),
                            jnp.minimum(t0v[1], t1v[1])),
                jnp.minimum(t0v[2], t1v[2]))
            b_exit = jnp.minimum(
                jnp.minimum(jnp.maximum(t0v[0], t1v[0]),
                            jnp.maximum(t0v[1], t1v[1])),
                jnp.maximum(t0v[2], t1v[2]))
            is_sphere = kind < 0.5
            entry = jnp.where(is_sphere, s_entry, b_entry)
            exit_ = jnp.where(is_sphere, s_exit, b_exit)
            # Boolean algebra, not where(): Mosaic cannot select i1
            # vectors (arith.select on vector<i1> fails to legalize).
            bhit = ((is_sphere & s_hit)
                    | (~is_sphere & (b_entry < b_exit)))
            e_v = jnp.maximum(entry, 1e-3)
            x_v = jnp.minimum(exit_, best_vt)
            valid = bhit & (e_v < x_v)
            u_v = rng.draw_uniform(lr, rng.STREAM_VOLUME, salt=v + 1)
            flight = nid * jnp.log(jnp.maximum(u_v, 1e-38))
            scatters = valid & (flight <= (x_v - e_v) * ray_len)
            t_v = e_v + flight / jnp.maximum(ray_len, 1e-20)
            take = scatters & (t_v < best_vt)
            best_vt = jnp.where(take, t_v, best_vt)
            valb = tuple(jnp.where(take, alb[k2], valb[k2])
                         for k2 in range(3))
            vol_take = vol_take | take
        hit = hit | vol_take
        t_hit = jnp.where(vol_take, best_vt, t_hit)
        mtype = jnp.where(vol_take, float(mat_mod.ISOTROPIC), mtype)
        tex3 = tuple(jnp.where(vol_take, valb[k2], tex3[k2])
                     for k2 in range(3))
        one_b = jnp.ones((b,), jnp.float32)
        zero_b = jnp.zeros((b,), jnp.float32)
        # Reference's arbitrary volume-hit frame (constant_medium.hpp:72-73).
        normal = (jnp.where(vol_take, one_b, normal[0]),
                  jnp.where(vol_take, zero_b, normal[1]),
                  jnp.where(vol_take, zero_b, normal[2]))
        front = front | vol_take

    # Hit point recomputed exactly as the decoders' soa.axpy(t, d, o).
    t_safe = jnp.where(hit, t_hit, 1.0)
    hp = tuple(t_safe * d[k] + o[k] for k in range(3))

    # --- background (miss) color ---
    ud = soa.normalize(d)
    if env_mode == env_mod.PHYSICAL_SUN:
        bg = _sun_sky(bp, *ud)
    elif env_mode == env_mod.SOLID_COLOR:
        one = jnp.ones((b,), jnp.float32)
        bg = tuple(bp[_BP_BG + k] * bp[_BP_INTENSITY] * one
                   for k in range(3))
    else:
        bg = tuple(r[:] * bp[_BP_INTENSITY]
                   for r in (envr_ref, envg_ref, envb_ref))

    # --- branchless scatter (shade.scatter_soa post-fetch math) ---
    sphere_draw, choice_u = rng.draw_unit_vector_and_uniform_soa(
        lr, rng.STREAM_SCATTER)
    f_u = gu_ref[:] * gate_u * bstr
    f_v = gv_ref[:] * gate_v * bstr
    n_b = tuple(normal[k] - f_u * tangent[k] - f_v * bitangent[k]
                for k in range(3))
    # scatter_soa applies normalize(n_b) whenever the material HAS a bump
    # map (bump_id >= 0) even when both taps are zero; kernel A mirrors
    # that presence bit into the _RO_HASB row.
    has_bump = rec[_RO_HASB] > 0.5
    working_n = soa.where(has_bump, soa.normalize(n_b), normal)
    unit_in = soa.normalize(d)

    lam_dir = soa.add(working_n, sphere_draw)
    lam_dir = soa.where(soa.near_zero(lam_dir), working_n, lam_dir)
    eps_origin = soa.axpy(RAY_EPSILON, normal, hp)

    reflected = soa.reflect(unit_in, working_n)
    metal_dir = soa.normalize(soa.axpy(param, sphere_draw, reflected))
    metal_ok = soa.dot(metal_dir, normal) > 0.0

    from ..core import vecmath
    ri = jnp.where(front, 1.0 / jnp.maximum(param, 1e-6), param)
    cos_theta = jnp.minimum(soa.dot(soa.neg(unit_in), working_n), 1.0)
    sin_theta = vecmath.safe_sqrt(1.0 - cos_theta * cos_theta)
    cannot_refract = ri * sin_theta > 1.0
    r0s = ((1.0 - ri) / (1.0 + ri)) ** 2
    reflect_prob = r0s + (1.0 - r0s) * (1.0 - cos_theta) ** 5
    do_reflect = cannot_refract | (reflect_prob > choice_u)
    refracted = soa.refract(unit_in, working_n, ri)
    diel_dir = soa.where(do_reflect, reflected, refracted)
    offset_out = soa.dot(diel_dir, normal) > 0.0
    diel_origin = soa.axpy(
        jnp.where(offset_out, RAY_EPSILON, -RAY_EPSILON), normal, hp)

    is_lam = mtype == mat_mod.LAMBERTIAN
    is_metal = mtype == mat_mod.METAL
    is_diel = mtype == mat_mod.DIELECTRIC
    is_iso = mtype == mat_mod.ISOTROPIC
    is_emit = mtype == mat_mod.EMISSIVE

    sc_dir = soa.where(is_lam, lam_dir,
             soa.where(is_metal, metal_dir,
             soa.where(is_diel, diel_dir, sphere_draw)))
    sc_origin = soa.where(is_lam | is_metal, eps_origin,
                soa.where(is_diel, diel_origin, hp))
    # base_col is the texture sample for non-image textures / solid; the
    # dielectric uses the untextured solid albedo which kernel A routed
    # into base_col for tex_id < 0 materials; dielectrics are always
    # untextured (materials.dielectric never sets texture_id).
    attenuation = tex3
    scattered = is_lam | (is_metal & metal_ok) | is_diel | is_iso
    zero = jnp.zeros((b,), jnp.float32)
    emitted = soa.where(is_emit, tex3, (zero, zero, zero))

    # --- radiance / path update (wavefront.body order) ---
    # Spec paths skip first-hit emission/attenuation: their trace starts
    # AFTER the first scatter with throughput 1 (camera.hpp:494-498).
    at0 = bounce == 0
    emit_ok = (~(at0 & is_spec)) if want_spec else jnp.ones_like(live)
    miss = live & ~hit
    rad = tuple(rad[k] + jnp.where(miss, thr[k] * bg[k], 0.0)
                for k in range(3))
    active = live & hit
    emit_lanes = active & emit_ok
    rad = tuple(rad[k] + jnp.where(emit_lanes, thr[k] * emitted[k], 0.0)
                for k in range(3))
    gainm = active & scattered & emit_ok
    thr = soa.where(gainm, soa.mul(thr, attenuation), thr)
    active = active & scattered

    late = (bounce - 1) > RR_START_BOUNCE
    weak = late & (soa.length(thr) < WEAK_RAY_EPS)
    active = active & ~weak
    p_rr = jnp.clip(jnp.maximum(thr[0], jnp.maximum(thr[1], thr[2])),
                    RR_P_MIN, RR_P_MAX)
    u_rr = rng.draw_uniform(lr, rng.STREAM_RR)
    active = active & ~(late & (u_rr > p_rr))
    thr = soa.where(late & active, soa.scale(thr, 1.0 / p_rr), thr)
    active = active & (bounce + 1 < max_depth)

    # --- spec-pass routing flags, decided at the first hit
    # (camera.hpp:492-517) ---
    if want_spec:
        spec0 = at0 & is_spec & live
        unit_d0 = soa.normalize(d)
        refl_dir = soa.reflect(unit_d0, soa.normalize(normal))
        is_specular = soa.dot(soa.normalize(sc_dir), refl_dir) > 0.9
        entering = soa.dot(sc_dir, normal) < 0.0
        spec_live = hit & scattered
        # Boolean algebra, not where(): Mosaic cannot select/truncate i1
        # vectors; use_reflection/refraction are static Python bools.
        refl_new = (spec_live & is_specular if use_reflection
                    else jnp.zeros_like(spec_live))
        refr_new = (spec_live & ~is_specular & entering if use_refraction
                    else jnp.zeros_like(spec_live))
        to_refl = (spec0 & refl_new) | (~spec0 & to_refl)
        to_refr = (spec0 & refr_new) | (~spec0 & to_refr)
        attn0 = soa.where(spec0, attenuation, attn0)
        # Spec paths routed to neither buffer are dead work: kill now.
        active = active & ~(spec0 & ~(to_refl | to_refr))

    # --- AOV contributions from camera segments (wavefront.body parity:
    # bounce-0 beauty lanes with samp < aux; camera.hpp:463-487) ---
    if aovs:
        is_aux = live & (bounce == 0) & (samp < aux)
        if want_spec:
            is_aux = is_aux & ~is_spec
        tgtaux_ref[:] = jnp.where(is_aux, li - poff, n_pixels)
        ai = 0
        if "albedo" in aovs:
            one_a = jnp.ones((b,), jnp.float32)
            alb = list(tex3)
            alb = [jnp.where(is_diel, one_a, c) for c in alb]
            alb = [jnp.where(is_emit, jnp.minimum(tex3[k], 1.0), alb[k])
                   for k in range(3)]
            alb = [jnp.where(is_iso, 0.0, c) for c in alb]
            for k in range(3):
                aov_refs[ai][:] = jnp.where(is_aux & hit, alb[k], 0.0)
                ai += 1
        if "normal" in aovs:
            nn = soa.normalize(normal)
            for k, base_idx in enumerate((_BP_CAM_U, _BP_CAM_V, _BP_CAM_W)):
                c = (nn[0] * bp[base_idx] + nn[1] * bp[base_idx + 1]
                     + nn[2] * bp[base_idx + 2])
                c = (c + 1.0) * 0.5
                miss_c = 0.5 if k < 2 else 1.0
                aov_refs[ai][:] = jnp.where(
                    is_aux, jnp.where(hit, c, miss_c), 0.0)
                ai += 1
        if "z_depth" in aovs:
            zval = 1.0 - jnp.clip(t_hit / z_max, 0.0, 1.0)
            aov_refs[ai][:] = jnp.where(is_aux & hit, zval, 0.0)
            ai += 1

    # --- finished paths -> contribution outputs ---
    done = live & ~active
    done_beauty = done & ~is_spec if want_spec else done
    tgt = jnp.where(done_beauty, li - poff, n_pixels)
    cr, cg, cb = (jnp.where(done_beauty, rad[k], 0.0) for k in range(3))
    if want_spec:
        # Firefly clamp on the continuation color, then modulate by the
        # stored first-hit attenuation (camera.hpp:499-509).
        luma = 0.2126 * soa.length(rad)
        fscale = jnp.where(luma > 2.0, 2.0 / jnp.maximum(luma, 1e-12), 1.0)
        contrib = tuple(attn0[k] * rad[k] * fscale for k in range(3))
        d_refl = done & to_refl
        d_refr = done & to_refr
        tgt_refl_ref[:] = jnp.where(d_refl, li - poff, n_pixels)
        tgt_refr_ref[:] = jnp.where(d_refr, li - poff, n_pixels)
        for ref, k in ((srx_ref, 0), (sry_ref, 1), (srz_ref, 2)):
            ref[:] = jnp.where(d_refl, contrib[k], 0.0)
        for ref, k in ((sfx_ref, 0), (sfy_ref, 1), (sfz_ref, 2)):
            ref[:] = jnp.where(d_refr, contrib[k], 0.0)

    # --- respawn: global work counter rides SMEM across the grid ---
    free = ~live | done
    free_f = free.astype(jnp.float32)
    base = base_sm[0]
    rank = _inclusive_rank(free_f).astype(jnp.int32) - 1
    new_w = base + rank
    can_spawn = free & (new_w < total_work)
    # 1-D [B] reductions hit Mosaic's "Offset change" limitation; reduce
    # in the (R, LANE) layout instead.
    blocksum = lambda v: jnp.sum(jnp.reshape(v, (b // LANE, LANE)))
    block_free = blocksum(free_f).astype(jnp.int32)
    base_sm[0] = base + block_free

    w = jnp.clip(new_w, 0, total_work - 1)
    if want_spec:
        new_spec = w >= n_beauty
        w = jnp.where(new_spec, w - n_beauty, w)
    wf = w.astype(jnp.float32)
    sr = jnp.floor((wf + 0.5) * (1.0 / n_pixels))
    sli = wf - sr * n_pixels
    sr = jnp.where(sli < 0.0, sr - 1.0, jnp.where(sli >= n_pixels,
                                                  sr + 1.0, sr))
    sli = wf - sr * n_pixels
    new_li = sli.astype(jnp.int32) + poff     # global pixel id
    new_samp = sample_offset + sr.astype(jnp.int32)
    # Camera draws always use ctx 0: a spec path re-traces the SAME
    # camera ray as its beauty path (camera.hpp:455,492).
    so, sd = _raygen(bp, seed, new_li, new_samp, width)

    sel = lambda fresh, old: jnp.where(can_spawn, fresh, old)
    one = jnp.ones((b,), jnp.float32)
    n_live = (live & active) | can_spawn
    outs = [
        sel(so[0], jnp.where(active, sc_origin[0], o[0])),
        sel(so[1], jnp.where(active, sc_origin[1], o[1])),
        sel(so[2], jnp.where(active, sc_origin[2], o[2])),
        sel(sd[0], jnp.where(active, sc_dir[0], d[0])),
        sel(sd[1], jnp.where(active, sc_dir[1], d[1])),
        sel(sd[2], jnp.where(active, sc_dir[2], d[2])),
        sel(one, thr[0]), sel(one, thr[1]), sel(one, thr[2]),
        sel(zero, rad[0]), sel(zero, rad[1]), sel(zero, rad[2]),
    ]
    for ref, val in zip(
        (n_ox_ref, n_oy_ref, n_oz_ref, n_dx_ref, n_dy_ref, n_dz_ref,
         n_thx_ref, n_thy_ref, n_thz_ref, n_rdx_ref, n_rdy_ref, n_rdz_ref),
        outs,
    ):
        ref[:] = val
    n_live_ref[:] = n_live.astype(jnp.int32)
    n_bounce_ref[:] = jnp.where(can_spawn, 0, bounce + 1)
    n_samp_ref[:] = sel(new_samp, samp)
    n_li_ref[:] = sel(new_li, li)
    if want_spec:
        fz = jnp.zeros((b,), jnp.int32)
        n_spec_ref[:] = jnp.where(can_spawn, new_spec.astype(jnp.int32),
                                  is_spec.astype(jnp.int32))
        n_refl_ref[:] = jnp.where(can_spawn, fz, to_refl.astype(jnp.int32))
        n_refr_ref[:] = jnp.where(can_spawn, fz, to_refr.astype(jnp.int32))
        n_a0x_ref[:] = sel(one, attn0[0])
        n_a0y_ref[:] = sel(one, attn0[1])
        n_a0z_ref[:] = sel(one, attn0[2])
    cr_ref[:] = cr
    cg_ref[:] = cg
    cb_ref[:] = cb
    tgt_ref[:] = tgt

    seg_sm[0] = seg_sm[0] + blocksum(live.astype(jnp.float32))
    lc_sm[0] = lc_sm[0] + blocksum(n_live.astype(jnp.float32)).astype(jnp.int32)

    @pl.when(prog == nprog - 1)
    def _fin():
        nw_ref[0, 0] = jnp.minimum(base_sm[0], total_work)
        seg_ref[0, 0] = seg_sm[0]
        lc_ref[0, 0] = lc_sm[0]


def shade_advance(tables: FusedTables, iscal, fscal, bparams, rec,
                  tex3, bump2, env3, state_cols, *,
                  n_pixels: int, width: int, total_work: int, max_depth: int,
                  env_mode: int, spp: int, aux: int, z_max: float,
                  aovs: tuple, want_spec: bool = False,
                  use_reflection: bool = False, use_refraction: bool = False,
                  n_beauty: int = 0, vparams=None, interpret=False):
    """Kernel-B wrapper.

    rec: tuple of _RO_ROWS flat [P] vectors (trace_decode output).
    state_cols: 16 flat [P] arrays in kernel order (o3, d3, thr3, rad3
    f32; live, bounce, samp, li i32). Returns (new_state_cols (16),
    contrib r/g/b [P], tgt [P] i32, per-AOV channels + tgt_aux when
    `aovs` is nonempty, next_work [1,1] i32, segments [1,1] f32,
    live_count [1,1] i32).
    """
    p_lanes = rec[0].shape[0]
    grid = (p_lanes // B_BLOCK,)
    lane = pl.BlockSpec((B_BLOCK,), lambda i: (i,),
                        memory_space=pltpu.VMEM)
    scal = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    n_volumes = 0 if vparams is None else int(vparams.shape[0])
    kernel = functools.partial(
        _shade_advance_kernel, n_pixels=n_pixels, width=width,
        total_work=total_work, max_depth=max_depth, env_mode=env_mode,
        spp=spp, aux=aux, z_max=z_max, aovs=aovs, want_spec=want_spec,
        use_reflection=use_reflection, use_refraction=use_refraction,
        n_beauty=n_beauty, n_volumes=n_volumes,
    )
    lane_f = jax.ShapeDtypeStruct((p_lanes,), jnp.float32)
    lane_i = jax.ShapeDtypeStruct((p_lanes,), jnp.int32)
    na = _n_aov(aovs)
    n_state = 16 + (6 if want_spec else 0)
    spec_outs = 14 if want_spec else 0
    n_lane_outs = 20 + spec_outs + na + (1 if aovs else 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            scal((1, 4)), scal((1, 2)), scal((1, _BP_COLS)),
        ] + ([scal((n_volumes, 16))] if n_volumes else []) + [
        ] + [lane] * _RO_ROWS + [
            lane, lane, lane,            # tex r/g/b
            lane, lane,                  # bump gu/gv
            lane, lane, lane,            # env r/g/b
        ] + [lane] * n_state,            # state (+ spec routing)
        out_specs=tuple([lane] * n_lane_outs + [scal((1, 1))] * 3),
        out_shape=tuple(
            [lane_f] * 12 + [lane_i] * 4 + [lane_f] * 3 + [lane_i]
            + ([lane_i] * 3 + [lane_f] * 3          # spec state
               + [lane_f] * 3 + [lane_i]            # reflection contribs
               + [lane_f] * 3 + [lane_i]            # refraction contribs
               if want_spec else [])
            + [lane_f] * na + ([lane_i] if aovs else [])
            + [jax.ShapeDtypeStruct((1, 1), jnp.int32),
               jax.ShapeDtypeStruct((1, 1), jnp.float32),
               jax.ShapeDtypeStruct((1, 1), jnp.int32)]
        ),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(iscal, fscal, bparams,
      *(() if vparams is None else (vparams,)),
      *rec, *tex3, *bump2, *env3, *state_cols)
    return out


# ---------------------------------------------------------------------------
# Fused pool orchestration
# ---------------------------------------------------------------------------


class FusedPoolState(NamedTuple):
    """Loop carry of the fused pooled-wavefront (per-lane arrays are flat
    [P] vectors — the dense T(1024) layout every kernel block maps 1:1)."""

    next_work: jax.Array   # i32 [1, 1]
    live_count: jax.Array  # i32 [1, 1]
    o: tuple               # 3 x f32 [P]
    d: tuple
    thr: tuple
    rad: tuple
    live: jax.Array        # i32 [P]
    bounce: jax.Array      # i32 [P]
    samp: jax.Array        # i32 [P]
    li: jax.Array          # i32 [P]
    # Spec split-pass routing (empty tuples when disabled).
    spec: tuple            # () or (is_spec, to_refl, to_refr) i32 [P]
    attn0: tuple           # () or 3 x f32 [P]
    acc: jax.Array         # f32 [n_channels*(n+1)] flat accumulator
                           # (channel c occupies [c*(n+1), (c+1)*(n+1));
                           # order: beauty xyz then 3 per enabled AOV)
    segments: jax.Array    # f32 [1, 1]
    steps: jax.Array       # i32 []


def make_pool_fused(scene, cam, env, key, config, sample_offset=0,
                    pool_lanes=None, interpret: bool = False,
                    pixel_offset=0, n_pixels_local: int | None = None):
    """Fused twin of wavefront.make_pool for the v1-supported config set.

    Returns (state0, cond, body) whose per-sample radiance is identical to
    the unfused pool (same RNG contexts, constants, and update order).

    pixel_offset / n_pixels_local render the pixel WINDOW
    [pixel_offset, pixel_offset + n_pixels_local) — the sharded path's
    per-shard slice (parallel/render.py). n_pixels_local must be static;
    pixel_offset may be traced (e.g. axis_index * n_local inside
    shard_map). Lane pixel ids stay GLOBAL so RNG streams and camera
    decode are shard-invariant; the accumulator is local-window-sized.
    Windows past config.n_pixels (shard padding) trace phantom rays whose
    results the caller drops on unpad.
    """
    from ..models import camera as camera_mod

    n = n_pixels_local if n_pixels_local is not None else config.n_pixels
    spp = config.samples_per_pixel
    want_spec = config.use_reflection or config.use_refraction
    n_beauty = n * spp
    total_work = n_beauty * (2 if want_spec else 1)
    # 131k lanes (round-5 sweep on the 800x450@32spp bench): per-step
    # lane throughput saturates at ~13.1M lane-steps/s from 131k lanes
    # up, so the smallest saturating pool wins via live-lane fraction
    # (93.8% at 131k vs 88% at 262k): 12.28M measured rays/s vs 11.6M
    # (262k) / 11.2M (65k, fixed per-step overhead dominates below
    # saturation). RAYTRACER_TPU_POOL_LANES overrides for sweeps.
    import os as _os
    default_pool = int(_os.environ.get("RAYTRACER_TPU_POOL_LANES", 131_072))
    p = pool_lanes or min(total_work, default_pool)
    p = max(B_BLOCK, -(-p // B_BLOCK) * B_BLOCK)
    seed = rng.seed_from_key(key)
    sample_offset = jnp.asarray(sample_offset, jnp.int32)
    poff_i32 = jnp.asarray(pixel_offset, jnp.int32)
    env_mode = config.env_mode

    aovs = tuple(
        name for name, on in (("albedo", config.use_albedo),
                              ("normal", config.use_normal),
                              ("z_depth", config.use_z_depth)) if on
    )
    aux = min(config.aux_samples, spp)
    tables = build_tables(scene, env, env_mode)
    env_hw = None
    if env_mode == env_mod.HDR_MAP:
        env_hw = (float(env.hdr_image.shape[0]), float(env.hdr_image.shape[1]))

    # Scalar param vectors for the kernels.
    from ..core import vecmath
    aparams = jnp.concatenate([
        jnp.asarray([T_MIN], jnp.float32),
        jnp.cos(env.hdri_rotation)[None], jnp.sin(env.hdri_rotation)[None],
        jnp.cos(env.hdri_tilt)[None], jnp.sin(env.hdri_tilt)[None],
        jnp.cos(env.hdri_roll)[None], jnp.sin(env.hdri_roll)[None],
        jnp.zeros((1,), jnp.float32),
    ]).reshape(1, 8)
    sun_dir = vecmath.normalize(env.sun_direction)
    bparams = jnp.concatenate([
        cam.center, cam.pixel00, cam.pixel_delta_u, cam.pixel_delta_v,
        cam.defocus_disk_u, cam.defocus_disk_v,
        sun_dir, env.sun_color,
        env.sun_intensity[None], env.sun_size[None], env.intensity[None],
        env.background_color,
        cam.u, cam.v, cam.w,
        jnp.zeros((1,), jnp.float32),
    ]).reshape(1, _BP_COLS)

    # Volume params for kernel B (solid-albedo fog; see fused_supported):
    # [kind, center xyz, radius, bmin xyz, bmax xyz, neg_inv_density,
    #  albedo rgb, pad] per volume.
    vparams = None
    if scene.volumes is not None and scene.volumes.count:
        vol = scene.volumes
        vparams = jnp.concatenate([
            vol.kind.astype(jnp.float32)[:, None],
            jnp.asarray(vol.center, jnp.float32),
            vol.radius[:, None],
            jnp.asarray(vol.box_min, jnp.float32),
            jnp.asarray(vol.box_max, jnp.float32),
            vol.neg_inv_density[:, None],
            scene.materials.albedo[vol.mat],
            jnp.zeros((vol.count, 1), jnp.float32),
        ], axis=1)

    # --- initial fill (same decode as kernel B's respawn) ---
    w0 = jnp.arange(p, dtype=jnp.int32)
    wc = jnp.minimum(w0, total_work - 1)
    spec0 = wc >= n_beauty
    wc = jnp.where(spec0, wc - n_beauty, wc)
    samp_rel = wc // n
    li0 = (wc - samp_rel * n) + poff_i32      # global pixel id
    samp0 = sample_offset + samp_rel
    lr0 = rng.LaneRng(seed, li0.astype(jnp.uint32), samp0.astype(jnp.uint32),
                      jnp.uint32(0))
    o0, d0 = camera_mod.generate_rays_soa(cam, lr0, li0, config.width,
                                          config.n_pixels)
    live0 = (w0 < total_work).astype(jnp.int32)
    ones = jnp.ones((p,), jnp.float32)
    zeros = jnp.zeros((p,), jnp.float32)
    state0 = FusedPoolState(
        next_work=jnp.full((1, 1), min(p, total_work), jnp.int32),
        live_count=jnp.sum(live0)[None, None],
        o=tuple(jnp.asarray(c, jnp.float32) for c in o0),
        d=tuple(jnp.asarray(c, jnp.float32) for c in d0),
        thr=(ones, ones, ones),
        rad=(zeros, zeros, zeros),
        live=live0,
        bounce=jnp.zeros((p,), jnp.int32),
        samp=jnp.asarray(samp0, jnp.int32),
        li=jnp.asarray(li0, jnp.int32),
        spec=((spec0.astype(jnp.int32), jnp.zeros((p,), jnp.int32),
               jnp.zeros((p,), jnp.int32)) if want_spec else ()),
        attn0=((ones, ones, ones) if want_spec else ()),
        acc=jnp.zeros(
            ((3 + 3 * len(aovs) + (6 if want_spec else 0)) * (n + 1),),
            jnp.float32),
        segments=jnp.zeros((1, 1), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
    )

    def cond(s: FusedPoolState):
        return s.live_count[0, 0] > 0

    def body(s: FusedPoolState):
        # Kernels A1 (intersect, features in-kernel) + A2 (decode).
        rec = trace_decode(
            scene, tables, s.o, s.d, aparams, env_hw, interpret=interpret)

        # XLA seam: ROW gathers — one [P] row-index fetch per texel
        # table. Gather cost here is ~per-index, so 2-3 row gathers beat
        # the previous single 5-8-channel flat gather by ~7 ms/step at
        # 262k lanes (measured in loop context).
        trow = jnp.clip(rec[_RO_TEXROW], 0.0, None).astype(jnp.int32)
        brow = jnp.clip(rec[_RO_BUMPROW], 0.0, None).astype(jnp.int32)
        tex4 = tables.atlas_rows[trow]            # [P, 4]
        gb2 = tables.grad_rows[brow]              # [P, 2]
        tex3 = (tex4[:, 0], tex4[:, 1], tex4[:, 2])
        bump2 = (gb2[:, 0], gb2[:, 1])
        if env_hw is not None:
            erow = rec[_RO_ENVROW].astype(jnp.int32)
            env4 = tables.env_rows[erow]
            env3 = (env4[:, 0], env4[:, 1], env4[:, 2])
        else:
            zc = jnp.zeros((p,), jnp.float32)
            env3 = (zc, zc, zc)

        iscal = jnp.concatenate([
            seed.astype(jnp.int32)[None],  # modular, bit-preserving
            s.next_work[0, 0][None],
            sample_offset[None], poff_i32[None],
        ]).reshape(1, 4)
        fscal = jnp.concatenate([
            s.segments[0, 0][None], jnp.zeros((1,), jnp.float32),
        ]).reshape(1, 2)

        state_cols = (*s.o, *s.d, *s.thr, *s.rad,
                      s.live, s.bounce, s.samp, s.li, *s.spec, *s.attn0)
        out = shade_advance(
            tables, iscal, fscal, bparams, rec, tex3, bump2, env3,
            state_cols, n_pixels=n, width=config.width,
            total_work=total_work, max_depth=config.max_depth,
            env_mode=env_mode, spp=spp, aux=aux, z_max=config.z_depth_max_dist,
            aovs=aovs, want_spec=want_spec,
            use_reflection=config.use_reflection,
            use_refraction=config.use_refraction, n_beauty=n_beauty,
            vparams=vparams, interpret=interpret,
        )
        (n_ox, n_oy, n_oz, n_dx, n_dy, n_dz, n_thx, n_thy, n_thz,
         n_rdx, n_rdy, n_rdz, n_live, n_bounce, n_samp, n_li,
         cr, cg, cb, tgt) = out[:20]
        ko = 20
        if want_spec:
            (n_sp, n_rl, n_rr, n_ax, n_ay, n_az,
             srx, sry, srz, tgt_refl, sfx, sfy, sfz, tgt_refr) = out[ko:ko + 14]
            ko += 14
        na = _n_aov(aovs)
        aov_vals = out[ko:ko + na]
        tgt_aux = out[ko + na] if aovs else None
        nw, seg, lc = out[-3:]

        # XLA seam: ONE combined scatter-add for every accumulator
        # channel (radiance + AOVs) — per-op staging dominates scatter
        # cost on this backend (~2.15 ms per scatter in loop context),
        # so 3-12 scatters collapse into one wide one. Duplicate pixel
        # targets make XLA lower this via its sort-based path, but the
        # small pixel-space accumulator stays VMEM-resident, which wins.
        # Measured dead ends (round-5 in-loop bench, 800x450@32spp):
        # - 2-D ROW scatters: 18-24 ms/step vs 10.0, in pixel OR work-id
        #   space, unique indices or not, even with constant values —
        #   the 2-D scatter lowering itself is the cost.
        # - Channel-interleaved flat indices (3*tgt+c): no change; the
        #   cost is per-index staging, not HBM locality.
        # - WORK-ID-space flat scatter (indices unique by construction,
        #   unique_indices=True drops the sort; per-pixel sums via one
        #   dense end reduce): scatter-apply profiled 6.3 -> 3.7 ms, but
        #   the (spp*n)-row accumulator no longer fits VMEM and the net
        #   step got SLOWER (10.9 vs 10.0 ms; spp-chunking it back under
        #   the VMEM budget loses more to fill/drain tails: 10.0-10.7
        #   ms/step at 2-8 spp chunks with 9-45% more steps).
        stride = n + 1
        idx_parts = [tgt, tgt + stride, tgt + 2 * stride]
        val_parts = [cr, cg, cb]
        ai = 0
        ch = 3
        for f in aovs:
            chans = 1 if f == "z_depth" else 3
            for ci in range(3):
                idx_parts.append(tgt_aux + (ch + ci) * stride)
                val_parts.append(aov_vals[ai + min(ci, chans - 1)])
            ai += chans
            ch += 3
        if want_spec:
            for ci, v in enumerate((srx, sry, srz)):
                idx_parts.append(tgt_refl + (ch + ci) * stride)
                val_parts.append(v)
            ch += 3
            for ci, v in enumerate((sfx, sfy, sfz)):
                idx_parts.append(tgt_refr + (ch + ci) * stride)
                val_parts.append(v)
            ch += 3
        acc = s.acc.at[jnp.concatenate(idx_parts)].add(
            jnp.concatenate(val_parts))

        return FusedPoolState(
            next_work=nw, live_count=lc,
            o=(n_ox, n_oy, n_oz), d=(n_dx, n_dy, n_dz),
            thr=(n_thx, n_thy, n_thz), rad=(n_rdx, n_rdy, n_rdz),
            live=n_live, bounce=n_bounce, samp=n_samp, li=n_li,
            spec=((n_sp, n_rl, n_rr) if want_spec else ()),
            attn0=((n_ax, n_ay, n_az) if want_spec else ()),
            acc=acc, segments=seg, steps=s.steps + 1,
        )

    return state0, cond, body


def render_pool_fused(scene, cam, env, key, config, sample_offset=0,
                      pool_lanes=None, with_stats: bool = False,
                      interpret: bool = False, pixel_offset=0,
                      n_pixels_local: int | None = None):
    """Fused drop-in for wavefront.render_pool (beauty-only contract).

    pixel_offset / n_pixels_local select a pixel window (sharded path);
    see make_pool_fused. Buffers come back window-sized."""
    from .integrator import SampleBuffers

    n = n_pixels_local if n_pixels_local is not None else config.n_pixels
    state0, cond, body = make_pool_fused(
        scene, cam, env, key, config, sample_offset, pool_lanes,
        interpret=interpret, pixel_offset=pixel_offset,
        n_pixels_local=n_pixels_local,
    )
    aovs = tuple(
        name for name, on in (("albedo", config.use_albedo),
                              ("normal", config.use_normal),
                              ("z_depth", config.use_z_depth)) if on
    )
    want_spec = config.use_reflection or config.use_refraction
    final = jax.lax.while_loop(cond, body, state0)
    zeros3 = jnp.zeros((n, 3), jnp.float32)
    stride = n + 1
    order = ("beauty",) + aovs
    if want_spec:
        order = order + ("reflection", "refraction")

    def get(f):
        if f not in order:
            return zeros3
        c0 = 3 * order.index(f)
        return jnp.stack(
            [final.acc[(c0 + k) * stride:(c0 + k) * stride + n]
             for k in range(3)], axis=-1)

    out = SampleBuffers(beauty=get("beauty"), albedo=get("albedo"),
                        normal=get("normal"), z_depth=get("z_depth"),
                        reflection=get("reflection"),
                        refraction=get("refraction"))
    if with_stats:
        return out, {"segments": final.segments[0, 0],
                     "steps": final.steps}
    return out
