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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import T_MAX
from ..models.geometry import PRIM_SPHERE, PRIM_TRIANGLE
from .intersect import (
    Hit,
    RAY_FEATURE_DIM,
    ray_features,
    sphere_candidate_t_mm,
    triangle_candidate_t_mm,
)

# Rays per grid program.
BLOCK_RAYS = 512
# Primitive columns per inner-loop chunk (multiple of MM_PAD's 256).
CHUNK_PRIMS = 256


def _closest_hit_kernel(tmin_ref, feats_ref, scoeff_ref, tcoeff_ref,
                        t_ref, idx_ref, type_ref,
                        *, n_spheres: int, n_tris: int):
    """One ray block vs the whole scene; scene tables live in VMEM."""
    feats = feats_ref[:]                      # [B, 16]
    b = feats.shape[0]
    a = feats[:, 12:13]                       # |d|^2 (ray_features col 12)
    tmin = jnp.full((b,), tmin_ref[0, 0])

    best_t = jnp.full((b,), T_MAX, jnp.float32)
    best_idx = jnp.zeros((b,), jnp.int32)
    best_type = jnp.zeros((b,), jnp.int32)

    def scan_table(coeff_ref, g, epilogue, n_rows, ptype, carry):
        n_chunks = coeff_ref.shape[2] // CHUNK_PRIMS

        def body(ci, carry):
            best_t, best_idx, best_type = carry
            # [16, G, CHUNK] -> [16, G*CHUNK]: contiguous minor-dim merge.
            block = coeff_ref[:, :, pl.ds(ci * CHUNK_PRIMS, CHUNK_PRIMS)]
            block = block.reshape(RAY_FEATURE_DIM, g * CHUNK_PRIMS)
            # HIGHEST: default TPU matmul precision is bf16 and flips hits
            # (see intersect._scan_chunks_mm); f32-emulated is near-free here
            # because the kernel is VMEM-resident.
            out = jnp.dot(feats, block, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            groups = [out[:, i * CHUNK_PRIMS:(i + 1) * CHUNK_PRIMS]
                      for i in range(g)]
            t = epilogue(*groups, tmin, best_t)
            # Mask padding rows past the true primitive count.
            rows = ci * CHUNK_PRIMS + jax.lax.broadcasted_iota(
                jnp.int32, (1, CHUNK_PRIMS), 1
            )
            t = jnp.where(rows < n_rows, t, T_MAX)
            cmin = jnp.min(t, axis=1)
            carg = jnp.argmin(t, axis=1).astype(jnp.int32)
            better = cmin < best_t
            best_t = jnp.where(better, cmin, best_t)
            best_idx = jnp.where(better, ci * CHUNK_PRIMS + carg, best_idx)
            best_type = jnp.where(better, ptype, best_type)
            return best_t, best_idx, best_type

        return jax.lax.fori_loop(0, n_chunks, body, carry)

    if n_spheres:
        best_t, best_idx, best_type = scan_table(
            scoeff_ref, 2,
            lambda h, c, lo, hi: sphere_candidate_t_mm(h, c, a, lo, hi),
            n_spheres, PRIM_SPHERE, (best_t, best_idx, best_type),
        )
    if n_tris:
        best_t, best_idx, best_type = scan_table(
            tcoeff_ref, 4, triangle_candidate_t_mm,
            n_tris, PRIM_TRIANGLE, (best_t, best_idx, best_type),
        )

    t_ref[:] = best_t[:, None]
    idx_ref[:] = best_idx[:, None]
    type_ref[:] = best_type[:, None]


@functools.partial(jax.jit, static_argnames=("n_spheres", "n_tris", "interpret"))
def _closest_hit_call(feats, scoeff, tcoeff, tmin, *, n_spheres, n_tris,
                      interpret=False):
    n = feats.shape[0]
    n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
    if n_pad != n:
        feats = jnp.pad(feats, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // BLOCK_RAYS,)

    kernel = functools.partial(
        _closest_hit_kernel, n_spheres=n_spheres, n_tris=n_tris
    )
    t, idx, ptype = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_RAYS, RAY_FEATURE_DIM), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(scoeff.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tcoeff.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(jnp.reshape(tmin, (1, 1)), feats, scoeff, tcoeff)
    return t[:n, 0], idx[:n, 0], ptype[:n, 0]


def intersect_brute_pallas(scene, o, d, tmin, *, interpret: bool = False) -> Hit:
    """Closest hit over all primitives; drop-in for intersect_brute_mm.

    tmin must be a scalar here (the integrator always passes T_MIN).
    """
    feats = ray_features(o, d)
    tmin = jnp.asarray(tmin, jnp.float32).reshape(())
    t, idx, ptype = _closest_hit_call(
        feats, scene.mm.sphere_coeff, scene.mm.tri_coeff, tmin,
        n_spheres=scene.spheres.count, n_tris=scene.triangles.count,
        interpret=interpret,
    )
    return Hit(t=t, prim_type=ptype, prim_idx=idx, hit=t < T_MAX)
