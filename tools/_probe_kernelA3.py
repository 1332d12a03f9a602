"""Bisect kernel A's decode cost: which stage burns the 15 ms?"""
import time, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
log = lambda *a: print(*a, flush=True)
jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones(8)))
log("[0] device alive")

from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, fused_step, intersect
from raytracer_project_tpu.core import vecmath
from raytracer_project_tpu.ops.pallas_intersect import _coarsen_bounds, scan_tables
from raytracer_project_tpu.ops.fused_step import (
    A_BLOCK, _RO_ROWS, _onehot_rows, build_tables)
from raytracer_project_tpu.ops.intersect import (
    _BOX_DEFAULT_ROW, _PACK_COLS, _SPHERE_DEFAULT_ROW, _TRI_DEFAULT_ROW,
    _box_record_soa, _sphere_record_soa, _triangle_record_soa,
    PRIM_BOX, PRIM_SPHERE, PRIM_TRIANGLE)

W, H, SPP = 800, 450, 32
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
cfg = integrator.RenderConfig(width=W, height=H, samples_per_pixel=SPP,
    max_depth=10, env_mode=env_mod.PHYSICAL_SUN,
    use_albedo=False, use_normal=False, use_z_depth=False, wavefront=True)
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2), sun_intensity=6.0)
key = jax.random.PRNGKey(0)
state0, _, _ = fused_step.make_pool_fused(scene, cam, env, key, cfg)
feats_in = intersect.ray_features_soa(state0.o, state0.d)
tables = build_tables(scene, env, cfg.env_mode)
mm = scene.mm
sb, tb, bb = (_coarsen_bounds(x) for x in
              (mm.sphere_bounds, mm.tri_bounds, mm.box_bounds))
P = feats_in.shape[1]

def make_kernel(mode):
    def kern(ap, fr, sc, tc, bc, sbr, tbr, bbr, rect, matt, texm, out_ref):
        f = fr[:].T
        b = f.shape[0]
        tmin = jnp.full((b,), ap[0, 0])
        bt, bi, bty = scan_tables(
            f, tmin, sc, tc, bc, sbr, tbr, bbr,
            n_spheres=scene.spheres.count, n_tris=scene.triangles.count,
            n_boxes=scene.boxes.count)
        hit = bt < 1e30
        t_safe = jnp.where(hit, bt, 1.0)
        d = (f[:, 0], f[:, 1], f[:, 2])
        o = (f[:, 3], f[:, 4], f[:, 5])
        is_tri = bty == PRIM_TRIANGLE
        is_box = bty == PRIM_BOX
        is_sph = bty == PRIM_SPHERE
        base = jnp.where(is_tri, scene.spheres.count,
                         jnp.where(is_box,
                                   scene.spheres.count + scene.triangles.count,
                                   0))
        row_f = jnp.clip((bi + base).astype(jnp.float32), 0.0,
                         float(rect.shape[0] - 1))
        grow = _onehot_rows(row_f, rect)
        def sel_cols(mask, default, ncols):
            zero = jnp.zeros((b,), jnp.float32)
            return tuple(
                jnp.where(mask, grow[:, k], float(default[k])) if k < ncols
                else zero for k in range(_PACK_COLS))
        acc = grow[:, 0]
        if mode in ("sph", "all3", "full"):
            sp = _sphere_record_soa(sel_cols(is_sph, _SPHERE_DEFAULT_ROW, 5),
                                    o, d, t_safe, acos_fn=vecmath.acos_poly,
                                    atan2_fn=vecmath.atan2_poly)
            acc = acc + sp[0][0] + sp[5] + sp[6]
        if mode in ("tri", "all3", "full"):
            tp = _triangle_record_soa(sel_cols(is_tri, _TRI_DEFAULT_ROW, 28),
                                      o, d, t_safe)
            acc = acc + tp[0][0] + tp[5] + tp[6]
        if mode in ("box", "all3", "full"):
            bp = _box_record_soa(sel_cols(is_box, _BOX_DEFAULT_ROW, 13),
                                 o, d, t_safe)
            acc = acc + bp[0][0] + bp[5] + bp[6]
        if mode == "full":
            m = _onehot_rows(jnp.clip(grow[:, 4], 0.0,
                                      float(matt.shape[0] - 1)), matt)
            t1 = _onehot_rows(jnp.clip(m[:, 5], 0.0,
                                       float(texm.shape[0] - 1)), texm)
            acc = acc + m[:, 0] + t1[:, 1]
        for k in range(_RO_ROWS):
            out_ref[k, :] = acc
    return kern

full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                  memory_space=pltpu.VMEM)
ap = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(1e-3)
for mode in ("none", "sph", "tri", "box", "all3"):
    try:
        f = pl.pallas_call(
            make_kernel(mode), grid=(P // A_BLOCK,),
            in_specs=[
                pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((16, A_BLOCK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                full(mm.sphere_coeff.shape), full(mm.tri_coeff.shape),
                full(mm.box_coeff.shape),
                pl.BlockSpec(sb.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(tb.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(bb.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
                full(tables.rectab.shape), full(tables.mattab.shape),
                full(tables.texmeta.shape),
            ],
            out_specs=pl.BlockSpec((_RO_ROWS, A_BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((_RO_ROWS, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )
        jf = jax.jit(lambda fr: f(ap, fr, mm.sphere_coeff, mm.tri_coeff,
                                  mm.box_coeff, sb, tb, bb, tables.rectab,
                                  tables.mattab, tables.texmeta))
        out = jax.block_until_ready(jf(feats_in))
        t0 = time.perf_counter()
        for _ in range(5):
            out = jf(feats_in)
        jax.block_until_ready(out)
        log(f"[{mode}] {(time.perf_counter()-t0)/5*1e3:.2f} ms")
    except Exception as e:
        log(f"[{mode}] FAIL {type(e).__name__} {str(e)[:150]}")
