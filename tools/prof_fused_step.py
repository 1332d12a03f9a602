"""Time the fused body and its stages on device at bench shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracer_project_tpu.models import camera as cam_mod
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.models import presets
from raytracer_project_tpu.ops import fused_step, integrator, intersect

W, H, SPP = 800, 450, 32
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
cfg = integrator.RenderConfig(
    width=W, height=H, samples_per_pixel=23, max_depth=10,
    env_mode=env_mod.PHYSICAL_SUN, use_albedo=False, use_normal=False,
    use_z_depth=False, wavefront=True)
cam = cam_mod.make_camera(image_width=W, image_height=H, vfov=30.0,
                          lookfrom=(12.0, 2.5, 6.0), lookat=(0.0, 1.0, 0.0))
env = env_mod.make_environment(sun_direction=(0.4, 0.7, 0.2),
                               sun_intensity=6.0)
key = jax.random.PRNGKey(0)

state0, cond, body = fused_step.make_pool_fused(scene, cam, env, key, cfg)
p = state0.o[0].shape[0]
print(f"lanes={p}", file=sys.stderr)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms",
          file=sys.stderr)
    return out


step = jax.jit(body)
s1 = jax.block_until_ready(step(state0))
s2 = jax.block_until_ready(step(s1))
timeit("full body step", step, s2)

tables = fused_step.build_tables(scene, env, cfg.env_mode)
env_hw = None

from raytracer_project_tpu.ops import pallas_intersect
a1_fn = jax.jit(lambda o, d: pallas_intersect.intersect_brute_pallas_od(
    scene, o, d, 1e-3))
timeit("A1 intersect (od)", a1_fn, s2.o, s2.d)

aparams = jnp.zeros((1, 8), jnp.float32)
a12_fn = jax.jit(lambda o, d: fused_step.trace_decode(
    scene, tables, o, d, aparams, env_hw))
rec = timeit("A1+A2 trace_decode", a12_fn, s2.o, s2.d)

trow = jnp.clip(rec[fused_step._RO_TEXROW], 0.0, None).astype(jnp.int32)
brow = jnp.clip(rec[fused_step._RO_BUMPROW], 0.0, None).astype(jnp.int32)


def seam(trow, brow):
    tex4 = tables.atlas_rows[trow]
    gb2 = tables.grad_rows[brow]
    return tex4, gb2


tex4, gb2 = timeit("seam row gathers", jax.jit(seam), trow, brow)

tex3 = (tex4[:, 0], tex4[:, 1], tex4[:, 2])
bump2 = (gb2[:, 0], gb2[:, 1])
zc = jnp.zeros((p,), jnp.float32)
env3 = (zc, zc, zc)
iscal = jnp.zeros((1, 4), jnp.int32)
fscal = jnp.zeros((1, 2), jnp.float32)
bparams = jnp.zeros((1, fused_step._BP_COLS), jnp.float32)
state_cols = (*s2.o, *s2.d, *s2.thr, *s2.rad, s2.live, s2.bounce,
              s2.samp, s2.li)
b_fn = jax.jit(lambda rec, t3, b2, e3, sc: fused_step.shade_advance(
    tables, iscal, fscal, bparams, rec, t3, b2, e3, sc,
    n_pixels=cfg.n_pixels, width=cfg.width,
    total_work=cfg.n_pixels * cfg.samples_per_pixel,
    max_depth=cfg.max_depth, env_mode=cfg.env_mode,
    spp=cfg.samples_per_pixel, aux=min(cfg.aux_samples, 23),
    z_max=cfg.z_depth_max_dist, aovs=(), want_spec=False))
out = timeit("B shade_advance", b_fn, rec, tex3, bump2, env3, state_cols)

cr, cg, cb, tgt = out[16], out[17], out[18], out[19]
stride = cfg.n_pixels + 1


def scat(acc, tgt, cr, cg, cb):
    idx = jnp.concatenate([tgt, tgt + stride, tgt + 2 * stride])
    val = jnp.concatenate([cr, cg, cb])
    return acc.at[idx].add(val)


acc0 = jnp.zeros((3 * stride,), jnp.float32)
timeit("scatter-add", jax.jit(scat), acc0, tgt, cr, cg, cb)
