"""Union-cull kernel internals: what does each stage cost?"""
import time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from raytracer_project_tpu.models import camera as cam_mod, presets
from raytracer_project_tpu.ops.intersect import (
    RAY_FEATURE_DIM, ray_features, sphere_candidate_t_mm, triangle_candidate_t_mm)
from raytracer_project_tpu.ops.pallas_intersect import _coarsen_bounds
from raytracer_project_tpu.core import rng
from raytracer_project_tpu.core.constants import T_MAX, T_MIN

scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
W, H = 800, 448
N = W * H
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
ids = jnp.arange(N, dtype=jnp.int32)
lr = rng.lane_rng(jax.random.PRNGKey(0), ids)
o_t, d_t = jax.jit(cam_mod.generate_rays, static_argnums=3)(cam, lr, ids, W)
def _coarsen_to(fine, width):
    import raytracer_project_tpu.ops.intersect as I
    g = width // I.MM_FINE
    nc = fine.shape[0] // g
    r = jnp.asarray(fine).reshape(nc, g, 6)
    return jnp.concatenate([r[:, :, :3].min(1), r[:, :, 3:].max(1)], axis=1)

import os
B = int(os.environ.get('EB', 512)); CH = int(os.environ.get('ECH', 256))

def make(mode, cull=True):
    def kern(tmin_ref, feats_ref, scoeff_ref, tcoeff_ref, sb_ref, tb_ref,
             t_ref, idx_ref, type_ref, *, n_spheres, n_tris):
        feats = feats_ref[:]
        b = feats.shape[0]
        a = feats[:, 12:13]
        tmin = jnp.full((b,), tmin_ref[0, 0])
        d = feats[:, 0:3]; o = feats[:, 3:6]
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
        carry0 = (jnp.full((b,), T_MAX, jnp.float32), jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32))

        def scan(coeff_ref, bounds_ref, g, epi, n_rows, pt, carry):
            n_chunks = coeff_ref.shape[2] // CH
            def body(ci, carry):
                best_t, best_idx, best_type = carry
                def do(carry):
                    best_t, best_idx, best_type = carry
                    block = coeff_ref[:, :, pl.ds(ci*CH, CH)].reshape(RAY_FEATURE_DIM, g*CH)
                    out = jnp.dot(feats, block, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
                    if mode == "matmul":
                        s = jnp.sum(out, axis=1)
                        return (jnp.minimum(best_t, s), best_idx, best_type)
                    groups = [out[:, i*CH:(i+1)*CH] for i in range(g)]
                    t = epi(*groups, tmin, best_t)
                    rows = ci*CH + jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
                    t = jnp.where(rows < n_rows, t, T_MAX)
                    cmin = jnp.min(t, axis=1)
                    if mode == "noargmin":
                        better = cmin < best_t
                        return (jnp.where(better, cmin, best_t), best_idx, best_type)
                    if mode == "cmpargmin":
                        rowf = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1).astype(jnp.float32)
                        carg = jnp.min(jnp.where(t == cmin[:, None], rowf, 1e9), axis=1).astype(jnp.int32)
                    else:
                        carg = jnp.argmin(t, axis=1).astype(jnp.int32)
                    better = cmin < best_t
                    return (jnp.where(better, cmin, best_t),
                            jnp.where(better, ci*CH + carg, best_idx),
                            jnp.where(better, pt, best_type))
                if not cull:
                    return do(carry)
                box_lo = jnp.stack([bounds_ref[ci,0], bounds_ref[ci,1], bounds_ref[ci,2]])
                box_hi = jnp.stack([bounds_ref[ci,3], bounds_ref[ci,4], bounds_ref[ci,5]])
                t0 = (box_lo[None,:] - o) * inv_d; t1 = (box_hi[None,:] - o) * inv_d
                tn = jnp.max(jnp.minimum(t0,t1), axis=1); tf = jnp.min(jnp.maximum(t0,t1), axis=1)
                can = (tn <= tf) & (tf > 0.0) & (tn < carry[0])
                poss = jnp.any(can) & (bounds_ref[ci,0] <= bounds_ref[ci,3])
                return jax.lax.cond(poss, do, lambda c: c, carry)
            return jax.lax.fori_loop(0, n_chunks, body, carry)

        c = scan(scoeff_ref, sb_ref, 2, lambda h,cc,lo,hi: sphere_candidate_t_mm(h,cc,a,lo,hi),
                 scene.spheres.count, 0, carry0)
        c = scan(tcoeff_ref, tb_ref, 4, triangle_candidate_t_mm,
                 scene.triangles.count, 1, c)
        t_ref[:] = c[0][:, None]; idx_ref[:] = c[1][:, None]; type_ref[:] = c[2][:, None]

    kern2 = functools.partial(kern, n_spheres=scene.spheres.count, n_tris=scene.triangles.count)
    @jax.jit
    def run(o, d):
        feats = ray_features(o, d)
        n = feats.shape[0]
        npad = -(-n//B)*B
        if npad != n: feats = jnp.pad(feats, ((0, npad-n),(0,0)))
        t, i, p = pl.pallas_call(kern2, grid=(npad//B,),
            in_specs=[pl.BlockSpec((1,1), lambda i: (0,0), memory_space=pltpu.SMEM),
                      pl.BlockSpec((B, RAY_FEATURE_DIM), lambda i: (i,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec(scene.mm.sphere_coeff.shape, lambda i: (0,0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec(scene.mm.tri_coeff.shape, lambda i: (0,0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec(sb.shape, lambda i: (0,0), memory_space=pltpu.SMEM),
                      pl.BlockSpec(tb.shape, lambda i: (0,0), memory_space=pltpu.SMEM)],
            out_specs=(pl.BlockSpec((B,1), lambda i: (i,0), memory_space=pltpu.VMEM),)*3,
            out_shape=(jax.ShapeDtypeStruct((npad,1), jnp.float32),
                       jax.ShapeDtypeStruct((npad,1), jnp.int32),
                       jax.ShapeDtypeStruct((npad,1), jnp.int32)),
        )(jnp.reshape(jnp.asarray(T_MIN, jnp.float32),(1,1)), feats,
          jnp.asarray(scene.mm.sphere_coeff), jnp.asarray(scene.mm.tri_coeff), sb, tb)
        return t[:n,0], i[:n,0], p[:n,0]
    return run

def bench(name, fn, o, d, reps=3):
    out = jax.block_until_ready(fn(o, d))
    t0 = time.perf_counter()
    for _ in range(reps): out = jax.block_until_ready(fn(o, d))
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:9.2f} ms", flush=True)
    return out

sb = _coarsen_to(scene.mm.sphere_bounds, CH); tb = _coarsen_to(scene.mm.tri_bounds, CH)
import os
bench(f"full B={B} CH={CH}", make("full"), o_t, d_t)
bench(f"matmul+min B={B} CH={CH}", make("matmul"), o_t, d_t)
