"""Intersect kernel variants: precision / cull / unroll / sizes."""
import time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_project_tpu.models import camera as cam_mod, presets
from raytracer_project_tpu.ops import pallas_intersect as pi
from raytracer_project_tpu.ops.intersect import (
    RAY_FEATURE_DIM, ray_features, sphere_candidate_t_mm, triangle_candidate_t_mm)
from raytracer_project_tpu.models.geometry import PRIM_SPHERE, PRIM_TRIANGLE
from raytracer_project_tpu.core.constants import T_MAX, T_MIN
from raytracer_project_tpu.core import rng

scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
W, H = 800, 448
N = W * H
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
key = jax.random.PRNGKey(0)
# tiled primary rays
TH, TW = 16, 32
j, i = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
tile = (j // TH) * (W // TW) + (i // TW)
within = (j % TH) * TW + (i % TW)
order = np.argsort((tile * (TH * TW) + within).ravel(), kind="stable")
ids = jnp.asarray((j.ravel() * W + i.ravel())[order], jnp.int32)
pk = rng.per_lane_keys(key, ids)
kr, = rng.split_each(pk, 1)
o_t, d_t = jax.jit(cam_mod.generate_rays, static_argnums=3)(cam, kr, ids, W)
# incoherent bounce-ish rays: random origins near scene, random dirs
ko, kd = jax.random.split(jax.random.PRNGKey(7))
o_b = jax.random.uniform(ko, (N,3), minval=-8, maxval=8) * jnp.asarray([1,0.25,1]) + jnp.asarray([0,1,0])
d_b = rng.unit_vector(kd, (N,))
jax.block_until_ready((o_t, d_t, o_b, d_b))

def make_kernel(precision, cull, unroll, block_rays, chunk):
    def kern(tmin_ref, feats_ref, scoeff_ref, tcoeff_ref, sb_ref, tb_ref,
             t_ref, idx_ref, type_ref, *, n_spheres, n_tris):
        feats = feats_ref[:]
        b = feats.shape[0]
        a = feats[:, 12:13]
        tmin = jnp.full((b,), tmin_ref[0, 0])
        d = feats[:, 0:3]; o = feats[:, 3:6]
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
        best = (jnp.full((b,), T_MAX, jnp.float32), jnp.zeros((b,), jnp.int32),
                jnp.zeros((b,), jnp.int32))

        def chunk_body(ci_static, coeff_ref, bounds_ref, g, epilogue, n_rows, ptype, carry):
            ci = ci_static
            best_t, best_idx, best_type = carry
            def do_chunk(carry):
                best_t, best_idx, best_type = carry
                block = coeff_ref[:, :, pl.ds(ci * chunk, chunk)]
                block = block.reshape(RAY_FEATURE_DIM, g * chunk)
                out = jnp.dot(feats, block, preferred_element_type=jnp.float32,
                              precision=precision)
                groups = [out[:, k*chunk:(k+1)*chunk] for k in range(g)]
                t = epilogue(*groups, tmin, best_t)
                rows = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
                t = jnp.where(rows < n_rows, t, T_MAX)
                cmin = jnp.min(t, axis=1)
                carg = jnp.argmin(t, axis=1).astype(jnp.int32)
                better = cmin < best_t
                return (jnp.where(better, cmin, best_t),
                        jnp.where(better, ci * chunk + carg, best_idx),
                        jnp.where(better, ptype, best_type))
            if not cull:
                return do_chunk(carry)
            box_lo = jnp.stack([bounds_ref[ci,0], bounds_ref[ci,1], bounds_ref[ci,2]])
            box_hi = jnp.stack([bounds_ref[ci,3], bounds_ref[ci,4], bounds_ref[ci,5]])
            t0 = (box_lo[None,:] - o) * inv_d
            t1 = (box_hi[None,:] - o) * inv_d
            t_near = jnp.max(jnp.minimum(t0,t1), axis=1)
            t_far = jnp.min(jnp.maximum(t0,t1), axis=1)
            can_hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < carry[0])
            possible = jnp.any(can_hit) & (bounds_ref[ci,0] <= bounds_ref[ci,3])
            return jax.lax.cond(possible, do_chunk, lambda c: c, carry)

        def scan_table(coeff_ref, bounds_ref, g, epilogue, n_rows, ptype, carry):
            n_chunks = coeff_ref.shape[2] // chunk
            if unroll:
                for ci in range(n_chunks):
                    carry = chunk_body(ci, coeff_ref, bounds_ref, g, epilogue, n_rows, ptype, carry)
                return carry
            return jax.lax.fori_loop(
                0, n_chunks,
                lambda ci, c: chunk_body(ci, coeff_ref, bounds_ref, g, epilogue, n_rows, ptype, c),
                carry)

        if n_spheres:
            best = scan_table(scoeff_ref, sb_ref, 2,
                lambda h,c,lo,hi: sphere_candidate_t_mm(h,c,a,lo,hi),
                n_spheres, PRIM_SPHERE, best)
        if n_tris:
            best = scan_table(tcoeff_ref, tb_ref, 4, triangle_candidate_t_mm,
                n_tris, PRIM_TRIANGLE, best)
        t_ref[:] = best[0][:, None]
        idx_ref[:] = best[1][:, None]
        type_ref[:] = best[2][:, None]
    return kern

def build(precision, cull, unroll, block_rays=512, chunk=256):
    # repack bounds for chunk width if needed
    mm = scene.mm
    sb, tb = np.asarray(mm.sphere_bounds), np.asarray(mm.tri_bounds)
    if chunk != 256:
        from raytracer_project_tpu.ops.intersect import _chunk_bounds
        # recompute at finer granularity from prim tables
        import raytracer_project_tpu.ops.intersect as I
        sp, tr = scene.spheres, scene.triangles
        C32 = np.asarray(sp.center, np.float32); r32 = np.asarray(sp.radius, np.float32)
        live = (r32 > 0)[:, None]
        smin = np.where(live, C32 - r32[:,None], np.inf); smax = np.where(live, C32 + r32[:,None], -np.inf)
        v0f = np.asarray(tr.v0, np.float32); v1f = v0f + np.asarray(tr.e1, np.float32); v2f = v0f + np.asarray(tr.e2, np.float32)
        tmin_ = np.minimum(np.minimum(v0f,v1f),v2f); tmax_ = np.maximum(np.maximum(v0f,v1f),v2f)
        old_pad = I.MM_PAD
        try:
            I.MM_PAD = chunk
            ncs = mm.sphere_coeff.shape[2] // chunk
            nct = mm.tri_coeff.shape[2] // chunk
            sb = I._chunk_bounds(smin, smax, ncs)
            tb = I._chunk_bounds(tmin_, tmax_, nct)
        finally:
            I.MM_PAD = old_pad
    sbj, tbj = jnp.asarray(sb), jnp.asarray(tb)
    kern = functools.partial(make_kernel(precision, cull, unroll, block_rays, chunk),
                             n_spheres=scene.spheres.count, n_tris=scene.triangles.count)
    @jax.jit
    def run(o, d):
        feats = ray_features(o, d)
        n = feats.shape[0]
        n_pad = -(-n // block_rays) * block_rays
        if n_pad != n: feats = jnp.pad(feats, ((0, n_pad-n),(0,0)))
        grid = (n_pad // block_rays,)
        t, idx, pt = pl.pallas_call(
            kern, grid=grid,
            in_specs=[
                pl.BlockSpec((1,1), lambda i: (0,0), memory_space=pltpu.SMEM),
                pl.BlockSpec((block_rays, RAY_FEATURE_DIM), lambda i: (i,0), memory_space=pltpu.VMEM),
                pl.BlockSpec(scene.mm.sphere_coeff.shape, lambda i: (0,0,0), memory_space=pltpu.VMEM),
                pl.BlockSpec(scene.mm.tri_coeff.shape, lambda i: (0,0,0), memory_space=pltpu.VMEM),
                pl.BlockSpec(sbj.shape, lambda i: (0,0), memory_space=pltpu.SMEM),
                pl.BlockSpec(tbj.shape, lambda i: (0,0), memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((block_rays,1), lambda i: (i,0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rays,1), lambda i: (i,0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rays,1), lambda i: (i,0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad,1), jnp.float32),
                jax.ShapeDtypeStruct((n_pad,1), jnp.int32),
                jax.ShapeDtypeStruct((n_pad,1), jnp.int32),
            ),
        )(jnp.reshape(jnp.asarray(T_MIN, jnp.float32), (1,1)), feats,
          jnp.asarray(scene.mm.sphere_coeff), jnp.asarray(scene.mm.tri_coeff), sbj, tbj)
        return t[:n,0], idx[:n,0], pt[:n,0]
    return run

def bench(name, fn, o, d, reps=3):
    out = jax.block_until_ready(fn(o, d))
    t0 = time.perf_counter()
    for _ in range(reps): out = jax.block_until_ready(fn(o, d))
    print(f"{name:52s} {(time.perf_counter()-t0)/reps*1e3:9.2f} ms", flush=True)
    return out

P = jax.lax.Precision
ref = None
base = build(P.HIGHEST, True, False)
t_ref, i_ref, p_ref = bench("baseline HIGHEST cull fori [tiled]", base, o_t, d_t)
bench("baseline [bounce]", base, o_b, d_b)

for name, prec, cull, unroll in [
    ("HIGHEST nocull fori", P.HIGHEST, False, False),
    ("HIGHEST cull unroll", P.HIGHEST, True, True),
    ("HIGH cull fori", P.HIGH, True, False),
    ("DEFAULT cull fori", P.DEFAULT, True, False),
    ("HIGH cull unroll", P.HIGH, True, True),
]:
    f = build(prec, cull, unroll)
    t, i2, p2 = bench(f"{name} [tiled]", f, o_t, d_t)
    bench(f"{name} [bounce]", f, o_b, d_b)
    ht = (t < T_MAX); hr = (t_ref < T_MAX)
    flips = int(jnp.sum(ht != hr))
    idx_mis = int(jnp.sum((ht & hr) & ((i2 != i_ref) | (p2 != p_ref))))
    terr = float(jnp.max(jnp.where(ht & hr, jnp.abs(t - t_ref), 0.0)))
    print(f"    parity: hit flips {flips}, idx mismatch {idx_mis}, max|dt| {terr:.3e}")
