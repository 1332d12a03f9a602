"""Kernel-A cost ablation: intersect-only vs +decode vs +onehots."""
import time, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = lambda *a: print(*a, flush=True)
jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones(8)))
log("[0] device alive")

from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, fused_step, intersect
from raytracer_project_tpu.ops.pallas_intersect import _coarsen_bounds, scan_tables
from raytracer_project_tpu.ops.fused_step import (
    A_BLOCK, _RO_ROWS, _onehot_rows, FusedTables, build_tables)

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
feats = intersect.ray_features_soa(state0.o, state0.d)
tables = build_tables(scene, env, cfg.env_mode)
mm = scene.mm
sb, tb, bb = (_coarsen_bounds(x) for x in
              (mm.sphere_bounds, mm.tri_bounds, mm.box_bounds))
P = feats.shape[1]

def timeit(name, f, *args, reps=5):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    log(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")

def make_kernel(mode):
    def kern(ap, fr, sc, tc, bc, sbr, tbr, bbr, rect, matt, texm, out_ref):
        f = fr[:].T
        bloc = f.shape[0]
        tmin = jnp.full((bloc,), ap[0, 0])
        bt, bi, bty = scan_tables(
            f, tmin, sc, tc, bc, sbr, tbr, bbr,
            n_spheres=scene.spheres.count, n_tris=scene.triangles.count,
            n_boxes=scene.boxes.count)
        if mode == "isect":
            out_ref[0, :] = bt
            out_ref[1, :] = bi.astype(jnp.float32)
            out_ref[2, :] = bty.astype(jnp.float32)
            for k in range(3, _RO_ROWS):
                out_ref[k, :] = bt
            return
        row = jnp.clip(bi.astype(jnp.float32), 0.0, float(rect.shape[0] - 1))
        g = _onehot_rows(row, rect)            # [B, 28] big one-hot
        if mode == "onehot1":
            for k in range(_RO_ROWS):
                out_ref[k, :] = g[:, min(k, 27)]
            return
        m = _onehot_rows(jnp.clip(g[:, 4], 0.0, float(matt.shape[0] - 1)), matt)
        t1 = _onehot_rows(jnp.clip(m[:, 5], 0.0, float(texm.shape[0] - 1)), texm)
        t2 = _onehot_rows(jnp.clip(m[:, 6], 0.0, float(texm.shape[0] - 1)), texm)
        acc = g[:, 0] + m[:, 0] + t1[:, 0] + t2[:, 0]
        for k in range(_RO_ROWS):
            out_ref[k, :] = acc
    return kern

full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                  memory_space=pltpu.VMEM)
def call(mode):
    kern = make_kernel(mode)
    return pl.pallas_call(
        kern, grid=(P // A_BLOCK,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((16, A_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )

ap = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(1e-3)
for mode in ("isect", "onehot1", "onehot4"):
    f = jax.jit(lambda fr, m=mode: call(m)(
        ap, fr, mm.sphere_coeff, mm.tri_coeff, mm.box_coeff, sb, tb, bb,
        tables.rectab, tables.mattab, tables.texmeta))
    timeit(f"A[{mode}]", f, feats)

# full production kernel A for comparison
fA = jax.jit(lambda fr: fused_step.trace_decode(scene, tables, fr, ap, None))
timeit("A[full]", fA, feats)
