"""Bisect the decode kernel's pathological Mosaic compile.

Usage: python tools/probe_decode.py <variant>
  d0    one-hot rectab fetch only (windowed), write hit/t + first cols
  d1    d0 + sphere/tri/box record decoders + selects
  d2    d1 + material/texture one-hots + checker/base color
  d3    full _decode_kernel (called directly with dummy hit inputs)
  d3w4096  full kernel, D_BLOCK forced back to 4096
  d3u   full kernel with UNWINDOWED one-hots (window=1 << 30)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main(variant: str):
    from raytracer_project_tpu.models import environment as env_mod
    from raytracer_project_tpu.models import presets
    from raytracer_project_tpu.ops import fused_step
    from raytracer_project_tpu.ops.intersect import (
        _BOX_DEFAULT_ROW, _PACK_COLS, _SPHERE_DEFAULT_ROW, _TRI_DEFAULT_ROW,
        _box_record_soa, _sphere_record_soa, _triangle_record_soa,
        PRIM_BOX, PRIM_SPHERE, PRIM_TRIANGLE,
    )

    scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
    env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2),
                                   sun_intensity=6.0)
    tables = fused_step.build_tables(scene, env, env_mod.PHYSICAL_SUN)
    print(f"backend={jax.default_backend()} rectab={tables.rectab.shape} "
          f"mattab={tables.mattab.shape} texmeta={tables.texmeta.shape}",
          flush=True)

    D = 4096 if variant == "d3w4096" else fused_step.D_BLOCK
    p = 8192
    n_out = fused_step._RO_ROWS

    onehot = fused_step._onehot_rows
    if variant == "d3u":
        onehot = functools.partial(fused_step._onehot_rows, window=1 << 30)

    ns, nt = scene.spheres.count, scene.triangles.count
    nb = scene.boxes.count if scene.boxes is not None else 0

    def kernel(aparams_ref, ox, oy, oz, dx, dy, dz, t_ref, idx_ref,
               type_ref, rectab_ref, mattab_ref, texmeta_ref, *out_refs):
        from raytracer_project_tpu.core import vecmath
        from raytracer_project_tpu.core.constants import T_MAX
        from raytracer_project_tpu.models import materials as mat_mod
        from raytracer_project_tpu.models import textures as tex_mod

        best_t = t_ref[:]
        best_idx = idx_ref[:]
        best_type = type_ref[:]
        b = best_t.shape[0]
        hit = best_t < T_MAX
        t_safe = jnp.where(hit, best_t, 1.0)
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])

        is_tri = best_type == PRIM_TRIANGLE
        is_box = best_type == PRIM_BOX
        is_sph = best_type == PRIM_SPHERE
        base = jnp.where(is_tri, ns, jnp.where(is_box, ns + nt, 0))
        row_f = jnp.clip((best_idx + base).astype(jnp.float32), 0.0,
                         float(rectab_ref.shape[0] - 1))
        grow = onehot(row_f, rectab_ref)

        outs = [hit.astype(jnp.float32), best_t] + [grow[:, k % 28]
                                                    for k in range(n_out - 2)]
        if variant != "d0":
            def sel_cols(mask, default, ncols):
                zero = jnp.zeros((b,), jnp.float32)
                return tuple(
                    jnp.where(mask, grow[:, k], float(default[k]))
                    if k < ncols else zero
                    for k in range(_PACK_COLS)
                )
            sp = _sphere_record_soa(sel_cols(is_sph, _SPHERE_DEFAULT_ROW, 5),
                                    o, d, t_safe, acos_fn=vecmath.acos_poly,
                                    atan2_fn=vecmath.atan2_poly)
            tp = _triangle_record_soa(sel_cols(is_tri, _TRI_DEFAULT_ROW, 28),
                                      o, d, t_safe)

            def widen(parts):
                parts = list(parts)
                parts[4] = parts[4].astype(jnp.float32)
                return parts

            def sel(mask, a, bb):
                if isinstance(a, tuple):
                    return tuple(jnp.where(mask, y, x) for x, y in zip(a, bb))
                return jnp.where(mask, bb, a)

            sp, tp = widen(sp), widen(tp)
            parts = tuple(sel(is_tri, sp[i], tp[i]) for i in range(8))
            bp = widen(_box_record_soa(
                sel_cols(is_box, _BOX_DEFAULT_ROW, 13), o, d, t_safe))
            parts = tuple(sel(is_box, parts[i], bp[i]) for i in range(8))
            p3, normal, tangent, bitangent, front, u, v, mat = parts
            outs = ([hit.astype(jnp.float32), best_t, normal[0], normal[1],
                     normal[2], tangent[0], tangent[1], tangent[2],
                     bitangent[0], bitangent[1], bitangent[2],
                     front.astype(jnp.float32), u, v, mat]
                    + [grow[:, k % 28] for k in range(n_out - 15)])
        if variant in ("d2", "d3", "d3w4096", "d3u") and variant != "d0":
            mrow = onehot(
                jnp.clip(mat.astype(jnp.float32), 0.0,
                         float(mattab_ref.shape[0] - 1)), mattab_ref)
            tex_id = mrow[:, 5]
            tmeta = onehot(
                jnp.clip(tex_id, 0.0, float(texmeta_ref.shape[0] - 1)),
                texmeta_ref)
            outs = outs[:15] + [mrow[:, 0], mrow[:, 3], mrow[:, 4],
                                tmeta[:, 0], tmeta[:, 1], tmeta[:, 2],
                                tmeta[:, 3], tex_id, mrow[:, 6]][:n_out - 15]
            outs += [jnp.zeros((b,), jnp.float32)] * (n_out - len(outs))
        for ref, val in zip(out_refs, outs[:n_out]):
            ref[:] = val

    if variant in ("d3", "d3w4096", "d3u"):
        kernel = functools.partial(
            fused_step._decode_kernel,
            n_spheres=ns, n_tris=nt, n_boxes=nb, has_boxes=nb > 0,
            atlas_hw=(float(scene.textures.data.shape[1]),
                      float(scene.textures.data.shape[2])),
            env_hw=None,
        )
        if variant == "d3u":
            import raytracer_project_tpu.ops.fused_step as fs
            orig = fs._onehot_rows
            fs._onehot_rows = functools.partial(orig, window=1 << 30)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((D,), lambda i: (i,), memory_space=pltpu.VMEM)
    aparams = jnp.zeros((1, 8), jnp.float32)
    lanes_f = [jnp.ones((p,), jnp.float32) for _ in range(7)]
    idx = jnp.zeros((p,), jnp.int32)
    typ = jnp.zeros((p,), jnp.int32)

    fn = jax.jit(lambda ap, *a: pl.pallas_call(
        kernel,
        grid=(p // D,),
        in_specs=[pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [lane] * 9
        + [full(tables.rectab.shape), full(tables.mattab.shape),
           full(tables.texmeta.shape)],
        out_specs=tuple([lane] * n_out),
        out_shape=tuple(jax.ShapeDtypeStruct((p,), jnp.float32)
                        for _ in range(n_out)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ap, *a))

    t0 = time.perf_counter()
    lowered = fn.lower(aparams, *lanes_f, idx, typ,
                       tables.rectab, tables.mattab, tables.texmeta)
    compiled = lowered.compile()
    print(f"COMPILE OK variant={variant} D={D} "
          f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
