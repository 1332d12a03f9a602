"""Ablate the closest-hit kernel's internal costs on device.

Variants: full | cheapepi (dots kept, epilogue ~free) | nodots
(epilogue on broadcast zeros — no MXU work) | nocull (conds removed).
Usage: python tools/probe_a1_ablate.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_project_tpu.core.constants import T_MAX
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import pallas_intersect as pi
from raytracer_project_tpu.ops.intersect import RAY_FEATURE_DIM

scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
P = 262144
o = tuple(jax.random.normal(jax.random.PRNGKey(k), (P,)) * 3
          for k in range(3))
d = tuple(jax.random.normal(jax.random.PRNGKey(3 + k), (P,))
          for k in range(3))

CHUNK = pi.CHUNK_PRIMS
B = pi.BLOCK_RAYS


def make_kernel(variant):
    from raytracer_project_tpu.ops.intersect import (
        box_candidate_t_mm, sphere_candidate_t_mm, triangle_candidate_t_mm)

    ns, nt = scene.spheres.count, scene.triangles.count
    nb = scene.boxes.count

    def kernel(tmin_ref, od_ref, scoeff_ref, tcoeff_ref, bcoeff_ref,
               sbounds_ref, tbounds_ref, bbounds_ref, t_ref, idx_ref,
               type_ref):
        ov = (od_ref[0, :], od_ref[1, :], od_ref[2, :])
        dv = (od_ref[3, :], od_ref[4, :], od_ref[5, :])
        feats = jnp.stack(pi.feats_rows_from_od(ov, dv), axis=0).T
        b = feats.shape[0]
        tmin = jnp.full((b,), tmin_ref[0, 0])
        a = feats[:, 12:13]
        dmat = feats[:, 0:3]
        omat = feats[:, 3:6]
        inv_d = 1.0 / jnp.where(jnp.abs(dmat) < 1e-30, 1e-30, dmat)
        best_t = jnp.full((b,), T_MAX, jnp.float32)

        def scan(coeff_ref, bounds_ref, g, epilogue, n_rows, carry):
            n_chunks = coeff_ref.shape[2] // CHUNK
            for ci in range(n_chunks):
                best_t = carry
                box_lo = jnp.stack([bounds_ref[ci, 0], bounds_ref[ci, 1],
                                    bounds_ref[ci, 2]])
                box_hi = jnp.stack([bounds_ref[ci, 3], bounds_ref[ci, 4],
                                    bounds_ref[ci, 5]])
                t0 = (box_lo[None, :] - omat) * inv_d
                t1 = (box_hi[None, :] - omat) * inv_d
                t_near = jnp.max(jnp.minimum(t0, t1), axis=1)
                t_far = jnp.min(jnp.maximum(t0, t1), axis=1)
                can_hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < best_t)
                nonempty = bounds_ref[ci, 0] <= bounds_ref[ci, 3]
                possible = jnp.any(can_hit) & nonempty

                def do_chunk(best_t):
                    if variant == "nodots":
                        out = jnp.zeros((b, g * CHUNK), jnp.float32)
                    else:
                        block = coeff_ref[:, :, pl.ds(ci * CHUNK, CHUNK)]
                        block = block.reshape(RAY_FEATURE_DIM, g * CHUNK)
                        out = jnp.dot(feats, block,
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.HIGHEST)
                    if variant == "cheapepi":
                        t = out[:, :CHUNK]
                    else:
                        groups = [out[:, i * CHUNK:(i + 1) * CHUNK]
                                  for i in range(g)]
                        t = epilogue(*groups, tmin, best_t)
                    cmin = jnp.min(t, axis=1)
                    return jnp.minimum(best_t, cmin)

                if variant == "nocull":
                    carry = do_chunk(best_t)
                else:
                    carry = jax.lax.cond(possible, do_chunk,
                                         lambda c: c, best_t)
            return carry

        best_t = scan(scoeff_ref, sbounds_ref, 2,
                      lambda h, c, tmn, tmx: sphere_candidate_t_mm(
                          h, c, a, tmn, tmx), ns, best_t)
        best_t = scan(tcoeff_ref, tbounds_ref, 4, triangle_candidate_t_mm,
                      nt, best_t)
        best_t = scan(bcoeff_ref, bbounds_ref, 6, box_candidate_t_mm,
                      nb, best_t)
        t_ref[:] = best_t[:, None]
        idx_ref[:] = jnp.zeros((b, 1), jnp.int32)
        type_ref[:] = jnp.zeros((b, 1), jnp.int32)

    return kernel


def run(variant):
    sb = pi._coarsen_bounds(scene.mm.sphere_bounds)
    tb = pi._coarsen_bounds(scene.mm.tri_bounds)
    bb = pi._coarsen_bounds(scene.mm.box_bounds)
    od6 = jnp.stack([*o, *d], axis=0)
    kernel = make_kernel(variant)
    lane2 = pl.BlockSpec((6, B), lambda i: (0, i), memory_space=pltpu.VMEM)
    fn = jax.jit(lambda od: pl.pallas_call(
        kernel, grid=(P // B,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM), lane2]
        + [pl.BlockSpec(x.shape, lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)
           for x in (scene.mm.sphere_coeff, scene.mm.tri_coeff,
                     scene.mm.box_coeff)]
        + [pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
           for x in (sb, tb, bb)],
        out_specs=tuple(pl.BlockSpec((B, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(3)),
        out_shape=(jax.ShapeDtypeStruct((P, 1), jnp.float32),
                   jax.ShapeDtypeStruct((P, 1), jnp.int32),
                   jax.ShapeDtypeStruct((P, 1), jnp.int32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.zeros((1, 1), jnp.float32), od, scene.mm.sphere_coeff,
      scene.mm.tri_coeff, scene.mm.box_coeff, sb, tb, bb))
    out = jax.block_until_ready(fn(od6))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(od6)
    jax.block_until_ready(out)
    print(f"{variant:10s} {(time.perf_counter() - t0) / 10 * 1e3:7.2f} ms",
          flush=True)


for v in ("full", "cheapepi", "nodots", "nocull"):
    try:
        run(v)
    except Exception as e:
        print(f"{v} ERR {str(e)[:150]}")
