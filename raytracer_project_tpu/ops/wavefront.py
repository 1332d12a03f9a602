"""Pooled-wavefront integrator: dead lanes respawn new samples immediately.

The chunked integrator (integrator.accumulate_samples) advances a fixed
(pixel x sample) wavefront in lock-step for all `max_depth` bounces: lanes
whose path terminated early (sky miss, absorption, Russian roulette) idle as
masked no-ops while the stragglers finish, so late bounce iterations run at
a few percent occupancy — most of the brute-force intersection work is
wasted on dead lanes.

This module implements the classic wavefront-pool design, TPU-style: a
fixed-size lane pool where every step (a) advances all live paths one
bounce and (b) *refills* lanes whose path just ended with the next
(pixel, sample) work item. Occupancy stays ~100%, so total intersection
work is proportional to the actual number of path segments
(~2-4 per sample) instead of samples x max_depth (reference default 10,
camera.hpp:30). Everything is static-shaped: respawn is a masked prefix-sum
assignment, accumulation is scatter-add (both measured sub-millisecond on
v5e for 262k lanes).

All per-lane vectors ride the loop as SoA component tuples (core/soa.py):
the round-3 xplane trace showed ~24 ms/step of [P, 3] <-> [3, P] layout
churn (transposes + 2.3%-dense lane tiles) at 262k lanes; component [P]
arrays have exactly one layout and every vector op is dense elementwise.

Per-sample radiance is bit-identical to integrator.render_sample up to
float reassociation: lane randomness is keyed on (base key, sample, pixel,
bounce) exactly as there, so pooling only changes the *order* in which
finished samples are added into each pixel's accumulator.

Reference parity notes: bounce-0 lanes reproduce the first-hit-reuse
structure of camera.hpp:454-527 (shared first hit feeding beauty + AOVs +
reflection/refraction split passes); later bounces reproduce the iterative
ray_color loop (camera.hpp:928-986) including the weak-ray cutoff and
Russian roulette constants.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng, soa
from ..core.constants import (
    RR_P_MAX,
    RR_P_MIN,
    RR_START_BOUNCE,
    T_MIN,
    WEAK_RAY_EPS,
)
from ..models import camera as camera_mod
from ..models import environment as env_mod
from ..models.scene import Scene
from . import intersect, shade, volumes as volumes_mod
from .integrator import RenderConfig, SampleBuffers

# Default lane-pool size: big enough to keep the MXU intersection batches
# wide, small enough that the respawn tail (< one pool of partially-idle
# steps) stays negligible for real sample counts.
POOL_LANES = 262_144



class _PoolState(NamedTuple):
    # Work scheduling.
    next_work: jax.Array   # i32 [] next unclaimed work index
    live: jax.Array        # bool[P]
    # Path identity.
    li: jax.Array          # i32[P] local pixel slot (row in the accumulators)
    pix: jax.Array         # i32[P] global pixel id (keys + camera)
    samp: jax.Array        # i32[P] absolute sample index
    bounce: jax.Array      # i32[P] 0 = camera segment
    is_spec: jax.Array     # bool[P] reflection/refraction split-pass path
    # Ray state: (x, y, z) component tuples of f32[P] (core/soa.py).
    origin: tuple
    direction: tuple
    throughput: tuple
    radiance: tuple
    # Spec-pass routing decided at the first hit (camera.hpp:492-517).
    attn0: tuple           # first-hit attenuation
    to_refl: jax.Array     # bool[P]
    to_refr: jax.Array     # bool[P]
    # Enabled accumulators only (sums), stored as THREE 1-D [n_pixels + 1]
    # channel arrays per buffer (keys "beauty.x" etc.) with one overflow
    # slot for masked scatter-adds; see make_pool. 1-D because XLA's layout
    # assignment gives a [n+1, 3] while-carry a transposed {0,1:T(4,128)}
    # layout whose scatter-add runs ~500x slower (measured 10.5 ms vs
    # 0.02 ms per step at 262k lanes on v5e); a 1-D carry has exactly one
    # possible layout, so the fast scatter emitter always applies.
    acc: dict
    # Measured work: path segments actually traced (sum of live lanes per
    # step; f32 — bit-exact to 2^24 per-step increments, ~1e-7 relative
    # beyond, fine for a throughput metric) and loop steps taken. This is
    # the *actual* count the reference's UI estimator approximates from
    # above (main.cpp:101-113).
    segments: jax.Array    # f32 []
    steps: jax.Array       # i32 []


def _spawn(scene: Scene, cam, seed, config: RenderConfig, pixel_ids,
           sample_offset, n_beauty, work_id, identity_pixels=False):
    """Decode work item -> fresh lane state (bounce 0, camera ray).

    Work layout: [0, n_beauty) are beauty paths in sample-major order
    (w = s * n + li); [n_beauty, 2 * n_beauty) are the reflection/refraction
    split-pass paths in the same order.
    """
    n = pixel_ids.shape[0]
    is_spec = work_id >= n_beauty
    w = jnp.where(is_spec, work_id - n_beauty, work_id)
    samp_rel = w // n
    li = w - samp_rel * n
    samp = sample_offset + samp_rel
    if identity_pixels:
        # Full-frame render: pixel_ids is arange(n), so the gather is the
        # identity (saves ~2 ms/step at 262k lanes).
        pix = li
    else:
        # f32 gather: XLA:TPU stages s32 gather tables through a scalar
        # SMEM loop (~200x slower); pixel ids are < 2^24 so f32 is exact.
        pix = pixel_ids.astype(jnp.float32)[li].astype(jnp.int32)

    # Camera draws always use ctx (bounce 0, beauty): the spec-pass path of
    # a (pixel, sample) re-traces the *same* camera ray as its beauty path
    # (camera.hpp:455,492), exactly like integrator.render_sample.
    lr0 = rng.LaneRng(seed, pix.astype(jnp.uint32), samp.astype(jnp.uint32),
                      jnp.uint32(0))
    o, d = camera_mod.generate_rays_soa(cam, lr0, pix, config.width,
                                        config.n_pixels)
    return li, pix, samp, is_spec, o, d


# Coherence-partition bucket count: 1 dead-lane bit + 3 direction-octant
# bits (major) + 1 Morton level of origin (3 bits, minor). More buckets
# partition finer but the [P, NB] counting-sort cumsum scales linearly.
_N_BUCKETS = 1 << 7


def _coherence_order(origin, direction, live):
    """Lane permutation grouping rays by direction octant (major) then a
    coarse origin Morton cell (minor), dead lanes last.

    origin/direction are SoA component tuples. Grouped pool blocks are
    directionally/spatially coherent, which is what makes the Pallas
    intersector's per-block chunk culling effective on secondary bounces
    (primary blocks are naturally coherent). Implemented as a single stable
    counting-sort pass over a small bucket key: a full argsort costs
    ~57 ms/step on v5e (XLA bitonic sort), the bucket partition runs in
    ~1 ms. Pure scheduling: lane randomness is (sample, pixel)-keyed, so
    reordering never changes any sample's value.
    """
    p = origin[0].shape[0]
    half = []
    for c in origin:
        lo = jnp.min(c)
        span = jnp.maximum(jnp.max(c) - lo, 1e-6)
        half.append((((c - lo) / span) > 0.5).astype(jnp.uint32))
    morton = (half[0] << 2) | (half[1] << 1) | half[2]
    octant = (
        ((direction[0] > 0).astype(jnp.uint32) << 2)
        | ((direction[1] > 0).astype(jnp.uint32) << 1)
        | (direction[2] > 0).astype(jnp.uint32)
    )
    bkey = (
        ((~live).astype(jnp.uint32) << 6) | (octant << 3) | morton
    ).astype(jnp.int32)  # [P] in [0, 128)

    # Counting sort in f32: counts are < 2^24 (exact in f32) and f32
    # cumsums/gathers stay on the VPU, where s32 ones get SMEM-serialized.
    onehot = (bkey[:, None] == jnp.arange(_N_BUCKETS, dtype=jnp.int32)[None, :])
    within = jnp.cumsum(onehot.astype(jnp.float32), axis=0)    # [P, NB]
    totals = within[-1]                                        # [NB]
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(totals)[:-1]]
    )
    rank = jnp.take_along_axis(within, bkey[:, None], axis=1)[:, 0] - 1.0
    dest = (base[bkey] + rank).astype(jnp.int32)
    # Invert: order[dest[i]] = i  (dest is a permutation).
    return jnp.zeros((p,), jnp.int32).at[dest].set(
        jnp.arange(p, dtype=jnp.int32)
    )


def _volumes_soa(volumes, o, d, hit, rec, lr):
    """Participating-media pass through the AoS implementation: pack the
    SoA record at this (cold, volumes-only) boundary and unpack the result.
    Scenes without volumes never reach this."""
    o_a, d_a = soa.pack(o), soa.pack(d)
    rec_a = intersect.HitRecord(
        t=rec.t, p=soa.pack(rec.p), normal=soa.pack(rec.normal),
        tangent=soa.pack(rec.tangent), bitangent=soa.pack(rec.bitangent),
        front_face=rec.front_face, u=rec.u, v=rec.v, mat=rec.mat,
        hit=rec.hit,
    )
    out = volumes_mod.apply_to_record(volumes, o_a, d_a, hit, rec_a, lr)
    return intersect.HitRecordSoa(
        t=out.t, p=soa.unpack(out.p), normal=soa.unpack(out.normal),
        tangent=soa.unpack(out.tangent),
        bitangent=soa.unpack(out.bitangent),
        front_face=out.front_face, u=out.u, v=out.v, mat=out.mat,
        hit=out.hit,
    )


def make_pool(scene: Scene, cam: camera_mod.Camera, env, key,
              config: RenderConfig, pixel_ids, sample_offset=0,
              pool_lanes: int | None = None):
    """Build the pooled-wavefront loop: returns (state0, cond, body).

    Exposed separately from render_pool so profiling harnesses can time a
    single `body` step under jit without running the full while_loop.
    """
    n = pixel_ids.shape[0]
    spp = config.samples_per_pixel
    aux = min(config.aux_samples, spp)
    want_spec = config.use_reflection or config.use_refraction
    n_beauty = n * spp
    total_work = n_beauty * (2 if want_spec else 1)
    p = pool_lanes or min(total_work, POOL_LANES)
    sample_offset = jnp.asarray(sample_offset, jnp.int32)
    seed = rng.seed_from_key(key)
    # Static identity check: render() passes arange(n_pixels) for full
    # frames, making the per-spawn pixel-id gather a no-op.
    import numpy as np
    identity_pixels = (
        isinstance(pixel_ids, np.ndarray) or not isinstance(pixel_ids, jax.Array)
    ) and n == config.n_pixels and bool(
        np.array_equal(np.asarray(pixel_ids), np.arange(n))
    )

    # Accumulators: only the config-enabled buffers ride the loop carry
    # (each unused carried buffer costs a [n,3] HBM<->VMEM copy pair per
    # step — measured 2x10.5 ms each at 800x450 on v5e), and each is
    # pre-padded with one overflow row so masked scatter-adds need no
    # per-step concatenate/slice copies.
    acc_fields = ["beauty"]
    if config.use_albedo:
        acc_fields.append("albedo")
    if config.use_normal:
        acc_fields.append("normal")
    if config.use_z_depth:
        acc_fields.append("z_depth")
    if want_spec:
        acc_fields += ["reflection", "refraction"]
    acc0 = {f"{f}.{c}": jnp.zeros((n + 1,), jnp.float32)
            for f in acc_fields for c in "xyz"}

    # --- initial fill: work items [0, p) ---
    w0 = jnp.arange(p, dtype=jnp.int32)
    li, pix, samp, is_spec, o, d = _spawn(
        scene, cam, seed, config, pixel_ids, sample_offset, n_beauty, w0,
        identity_pixels,
    )
    f = jnp.zeros((p,), bool)
    ones3 = lambda: tuple(jnp.ones((p,), jnp.float32) for _ in range(3))
    zeros3 = lambda: tuple(jnp.zeros((p,), jnp.float32) for _ in range(3))
    state = _PoolState(
        next_work=jnp.asarray(min(p, total_work), jnp.int32),
        live=w0 < total_work,
        li=li, pix=pix, samp=samp,
        bounce=jnp.zeros((p,), jnp.int32),
        is_spec=is_spec,
        origin=o, direction=d,
        throughput=ones3(),
        radiance=zeros3(),
        attn0=ones3(),
        to_refl=f, to_refr=f,
        acc=acc0,
        segments=jnp.zeros((), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
    )

    def scatter_add(acc, name, mask, slot, val):
        """acc[name.{xyz}][n+1] += val[c] where mask (masked lanes hit
        the overflow slot); val is an (x, y, z) component tuple."""
        tgt = jnp.where(mask, slot, n)
        for ci, c in enumerate("xyz"):
            acc[f"{name}.{c}"] = acc[f"{name}.{c}"].at[tgt].add(
                jnp.where(mask, val[ci], 0.0)
            )
        return acc

    def cond(s: _PoolState):
        return jnp.any(s.live)

    def body(s: _PoolState):
        at0 = s.bounce == 0
        # Per-lane stateless stream at this lane's (bounce, pass) context —
        # identical draws to integrator.render_sample/trace by construction.
        lr = rng.LaneRng(
            seed, s.pix.astype(jnp.uint32), s.samp.astype(jnp.uint32),
            (s.bounce.astype(jnp.uint32) << jnp.uint32(1))
            | s.is_spec.astype(jnp.uint32),
        )

        hit = intersect.intersect_soa(scene, s.origin, s.direction, T_MIN)
        rec = intersect.make_record_soa(scene, s.origin, s.direction, hit)
        if scene.volumes is not None:
            rec = _volumes_soa(scene.volumes, s.origin, s.direction, hit,
                               rec, lr)
        bg = env_mod.background_color_soa(env, s.direction, config.env_mode)
        sc = shade.scatter_soa(scene, rec, s.direction, lr)

        # --- radiance / path-state update (trace body semantics) ---
        # Spec paths skip first-hit emission: their trace starts *after* the
        # first scatter with throughput 1 (camera.hpp:494-498).
        emit_ok = ~(at0 & s.is_spec)
        miss = s.live & ~rec.hit
        radiance = tuple(
            s.radiance[k]
            + jnp.where(miss, s.throughput[k] * bg[k], 0.0)
            for k in range(3)
        )
        active = s.live & rec.hit
        emit_lanes = active & emit_ok
        radiance = tuple(
            radiance[k]
            + jnp.where(emit_lanes, s.throughput[k] * sc.emitted[k], 0.0)
            for k in range(3)
        )
        gain = active & sc.scattered & emit_ok
        throughput = soa.where(gain, soa.mul(s.throughput, sc.attenuation),
                               s.throughput)
        active = active & sc.scattered

        # Weak-ray cutoff + Russian roulette: late = trace-local bounce
        # (bounce - 1) strictly past RR_START_BOUNCE (camera.hpp:967-983);
        # never fires on the camera segment.
        late = (s.bounce - 1) > RR_START_BOUNCE
        weak = late & (soa.length(throughput) < WEAK_RAY_EPS)
        active = active & ~weak
        p_rr = jnp.clip(
            jnp.maximum(throughput[0],
                        jnp.maximum(throughput[1], throughput[2])),
            RR_P_MIN, RR_P_MAX,
        )
        u = rng.draw_uniform(lr, rng.STREAM_RR)
        active = active & ~(late & (u > p_rr))
        throughput = soa.where(late & active,
                               soa.scale(throughput, 1.0 / p_rr), throughput)

        # Depth exhausted: the continuation runs bounces 1..max_depth-1.
        active = active & (s.bounce + 1 < config.max_depth)

        # --- spec-pass routing flags, decided at the first hit ---
        # (compiled out entirely when neither specular AOV is enabled)
        to_refl, to_refr, attn0 = s.to_refl, s.to_refr, s.attn0
        if want_spec:
            spec0 = at0 & s.is_spec & s.live
            unit_d = soa.normalize(s.direction)
            refl_dir = soa.reflect(unit_d, soa.normalize(rec.normal))
            is_specular = soa.dot(soa.normalize(sc.direction), refl_dir) > 0.9
            entering = soa.dot(sc.direction, rec.normal) < 0.0
            spec_live = rec.hit & sc.scattered
            to_refl = jnp.where(
                spec0, spec_live & is_specular & config.use_reflection, s.to_refl
            )
            to_refr = jnp.where(
                spec0,
                spec_live & ~is_specular & entering & config.use_refraction,
                s.to_refr,
            )
            attn0 = soa.where(spec0, sc.attenuation, s.attn0)
            # Spec paths routed to neither buffer are dead work: kill now.
            active = active & ~(spec0 & ~(to_refl | to_refr))

        # --- AOV contributions from beauty camera segments ---
        acc = dict(s.acc)
        cam0 = at0 & ~s.is_spec & s.live
        is_aux = cam0 & (s.samp < aux)
        zero = jnp.zeros_like(rec.u)
        if config.use_albedo:
            alb = shade.get_albedo_soa(scene, rec)
            albedo = soa.where(rec.hit, alb, (zero, zero, zero))
            acc = scatter_add(acc, "albedo", is_aux, s.li, albedo)
        if config.use_normal:
            nc = camera_mod.view_space_normal_color_soa(cam, rec.normal)
            half = jnp.full_like(rec.u, 0.5)
            one = jnp.ones_like(rec.u)
            normal = soa.where(rec.hit, nc, (half, half, one))
            acc = scatter_add(acc, "normal", is_aux, s.li, normal)
        if config.use_z_depth:
            zval = 1.0 - jnp.clip(rec.t / config.z_depth_max_dist, 0.0, 1.0)
            zval = jnp.where(rec.hit, zval, 0.0)
            acc = scatter_add(acc, "z_depth", is_aux, s.li,
                              (zval, zval, zval))

        # --- finished paths -> accumulators ---
        done = s.live & ~active
        done_beauty = done & ~s.is_spec
        acc = scatter_add(acc, "beauty", done_beauty, s.li, radiance)
        if want_spec:
            # Firefly clamp on the continuation color, then modulate by the
            # stored first-hit attenuation (camera.hpp:499-509).
            luma = 0.2126 * soa.length(radiance)
            scale = jnp.where(luma > 2.0, 2.0 / jnp.maximum(luma, 1e-12), 1.0)
            contrib = soa.mul(attn0, soa.scale(radiance, scale))
            acc = scatter_add(acc, "reflection", done & to_refl, s.li, contrib)
            acc = scatter_add(acc, "refraction", done & to_refr, s.li, contrib)

        # --- respawn finished/idle lanes with fresh work ---
        free = ~s.live | done
        # f32 cumsum: s32 scans get SMEM-serialized on TPU; P < 2^24.
        rank = (jnp.cumsum(free.astype(jnp.float32)) - 1.0).astype(jnp.int32)
        new_w = s.next_work + rank
        can_spawn = free & (new_w < total_work)
        n_spawned = jnp.minimum(
            jnp.sum(free.astype(jnp.int32)),
            total_work - s.next_work,
        )
        sli, spix, ssamp, sspec, so, sd = _spawn(
            scene, cam, seed, config, pixel_ids, sample_offset, n_beauty,
            jnp.clip(new_w, 0, total_work - 1), identity_pixels,
        )
        sel = lambda fresh, old: jnp.where(can_spawn, fresh, old)
        sel3 = lambda fresh, old: soa.where(can_spawn, fresh, old)
        one3 = tuple(jnp.ones((p,), jnp.float32) for _ in range(3))
        zero3 = tuple(jnp.zeros((p,), jnp.float32) for _ in range(3))
        ns = _PoolState(
            next_work=s.next_work + n_spawned,
            live=(s.live & active) | can_spawn,
            li=sel(sli, s.li),
            pix=sel(spix, s.pix),
            samp=sel(ssamp, s.samp),
            bounce=jnp.where(can_spawn, 0, s.bounce + 1),
            is_spec=sel(sspec, s.is_spec),
            origin=sel3(so, soa.where(active, sc.origin, s.origin)),
            direction=sel3(sd, soa.where(active, sc.direction, s.direction)),
            throughput=sel3(one3, throughput),
            radiance=sel3(zero3, radiance),
            attn0=sel3(one3, attn0),
            to_refl=sel(f, to_refl),
            to_refr=sel(f, to_refr),
            acc=acc,
            segments=s.segments + jnp.sum(s.live.astype(jnp.float32)),
            steps=s.steps + 1,
        )
        if not config.sort_lanes:
            return ns
        # Re-sort lanes for block coherence (feeds the Pallas chunk culling).
        order = _coherence_order(ns.origin, ns.direction, ns.live)
        # 1-D (and non-f32) permutes get serialized through SMEM by XLA:TPU;
        # pack all scalar lane fields into one [P, 8] f32 matrix so the
        # whole permute is six fast 2-D vector gathers. Ids are < 2^24, so
        # the f32 round-trip is exact.
        f32 = jnp.float32
        packed = jnp.stack([
            ns.live.astype(f32), ns.li.astype(f32), ns.pix.astype(f32),
            ns.samp.astype(f32), ns.bounce.astype(f32),
            ns.is_spec.astype(f32), ns.to_refl.astype(f32),
            ns.to_refr.astype(f32),
        ], axis=-1)[order]
        vec_packed = jnp.stack(
            list(ns.origin) + list(ns.direction) + list(ns.throughput)
            + list(ns.radiance) + list(ns.attn0), axis=-1,
        )[order]
        vp = lambda k: (vec_packed[:, 3 * k], vec_packed[:, 3 * k + 1],
                        vec_packed[:, 3 * k + 2])
        i32 = lambda k: packed[:, k].astype(jnp.int32)
        return ns._replace(
            live=packed[:, 0] > 0.5, li=i32(1), pix=i32(2),
            samp=i32(3), bounce=i32(4),
            is_spec=packed[:, 5] > 0.5,
            origin=vp(0), direction=vp(1), throughput=vp(2),
            radiance=vp(3), attn0=vp(4),
            to_refl=packed[:, 6] > 0.5, to_refr=packed[:, 7] > 0.5,
        )

    return state, cond, body


def render_pool(scene: Scene, cam: camera_mod.Camera, env, key,
                config: RenderConfig, pixel_ids, sample_offset=0,
                pool_lanes: int | None = None, with_stats: bool = False,
                pixel_offset=0, n_pixels_local: int | None = None):
    """Pooled-wavefront accumulation: drop-in for accumulate_samples.

    Returns per-pixel *sums* over `config.samples_per_pixel` samples, same
    contract (and same per-sample values up to float reassociation) as
    integrator.accumulate_samples. Requires the non-differentiable path
    (uses while_loop + scatter-add).

    with_stats: also return {"segments", "steps"} — the measured number of
    path segments traced (the quantity the reference UI's
    W·H·spp·max_depth/Δt metric upper-bounds, main.cpp:101-113) and the
    number of pool steps taken.

    On TPU, configs the fused two-kernel step covers (beauty-only
    full-frame renders of brute-scan scenes — see
    fused_step.fused_supported) dispatch to ops/fused_step.py: identical
    per-sample values, ~an order of magnitude less XLA overhead per step.

    pixel_ids=None means "the identity full frame" statically — the only
    way a jitted caller (e.g. the progressive session) can assert identity
    at trace time, where any array argument is a tracer.

    RAYTRACER_TPU_NO_FUSED=1 (env, read at trace time) is the fused-path
    kill-switch: it forces the unfused pool even on TPU, so one bad fused
    kernel can never zero out the whole engine (the reference's analogous
    graceful-degrade: OIDN device -> CPU retry, camera.hpp:586-593).
    """
    import os

    import numpy as np

    from . import fused_step

    if pixel_ids is None:
        identity_pixels = True
    else:
        assert n_pixels_local is None, \
            "pixel window mode requires pixel_ids=None"
        n = pixel_ids.shape[0]
        identity_pixels = (
            isinstance(pixel_ids, np.ndarray)
            or not isinstance(pixel_ids, jax.Array)
        ) and n == config.n_pixels and bool(
            np.array_equal(np.asarray(pixel_ids), np.arange(n))
        )
    no_fused = bool(os.environ.get("RAYTRACER_TPU_NO_FUSED"))
    if (not no_fused and jax.default_backend() == "tpu"
            and identity_pixels):
        spp = config.samples_per_pixel
        chunk = fused_step.fused_spp_chunk(
            scene, config, env, n_pixels_local=n_pixels_local)
        fused_kw = dict(pixel_offset=pixel_offset,
                        n_pixels_local=n_pixels_local)
        if chunk >= spp:
            return fused_step.render_pool_fused(
                scene, cam, env, key, config, sample_offset, pool_lanes,
                with_stats=with_stats, **fused_kw,
            )
        if chunk > 0:
            # Sample-chunked fused accumulation: each chunk renders a spp
            # range below the fused work-id cap; lane RNG streams are
            # (pixel, sample)-keyed so the sum is bit-identical to one
            # oversized call (and to the unfused pool's sample set).
            import dataclasses

            out = None
            segments = jnp.zeros((), jnp.float32)
            steps = jnp.zeros((), jnp.int32)
            for off in range(0, spp, chunk):
                cfg_c = dataclasses.replace(
                    config, samples_per_pixel=min(chunk, spp - off))
                res = fused_step.render_pool_fused(
                    scene, cam, env, key, cfg_c, sample_offset + off,
                    pool_lanes, with_stats=with_stats, **fused_kw)
                if with_stats:
                    res, st = res
                    segments = segments + st["segments"]
                    steps = steps + st["steps"]
                out = res if out is None else jax.tree.map(
                    jnp.add, out, res)
            if with_stats:
                return out, {"segments": segments, "steps": steps}
            return out
    if pixel_ids is None:
        if n_pixels_local is None:
            pixel_ids = np.arange(config.n_pixels, dtype=np.int32)
        else:
            # Unfused window fallback: clamped identity slice — same
            # padding semantics as parallel.render._padded_pixel_ids
            # (trailing lanes re-render pixel n-1, dropped on unpad).
            pixel_ids = jnp.minimum(
                jnp.asarray(pixel_offset, jnp.int32)
                + jnp.arange(n_pixels_local, dtype=jnp.int32),
                config.n_pixels - 1,
            )

    state, cond, body = make_pool(
        scene, cam, env, key, config, pixel_ids, sample_offset, pool_lanes
    )
    final = jax.lax.while_loop(cond, body, state)
    n = pixel_ids.shape[0]
    zeros3 = jnp.zeros((n, 3), jnp.float32)
    get = lambda f: (
        jnp.stack([final.acc[f"{f}.{c}"][:n] for c in "xyz"], axis=-1)
        if f"{f}.x" in final.acc else zeros3
    )
    out = SampleBuffers(
        beauty=get("beauty"), albedo=get("albedo"), normal=get("normal"),
        z_depth=get("z_depth"), reflection=get("reflection"),
        refraction=get("refraction"),
    )
    if with_stats:
        return out, {"segments": final.segments, "steps": final.steps}
    return out
