"""A1 variant: ONE combined matmul over all primitive tables per block,
plus a matmul-precision sweep with hit-parity checks."""
import time, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
log = lambda *a: print(*a, flush=True)
jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones(8)))
log("[0] device alive")

from raytracer_project_tpu.models import camera as cam_mod, environment as env_mod, presets
from raytracer_project_tpu.ops import integrator, fused_step, intersect
from raytracer_project_tpu.ops import pallas_intersect as pi
from raytracer_project_tpu.ops.intersect import (
    sphere_candidate_t_mm, triangle_candidate_t_mm, box_candidate_t_mm,
    RAY_FEATURE_DIM)
from raytracer_project_tpu.core.constants import T_MAX
from raytracer_project_tpu.models.geometry import PRIM_BOX, PRIM_SPHERE, PRIM_TRIANGLE

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
mm = scene.mm
P = feats_in.shape[1]
B = 512

# Combined coefficient matrix [16, Ctot] with column layout
# [sph h | sph c | tri det | tri u | tri v | tri t | box dlx.. olz]
cs = mm.sphere_coeff.shape[2]
ct = mm.tri_coeff.shape[2]
cb = mm.box_coeff.shape[2]
comb = jnp.concatenate([
    mm.sphere_coeff.reshape(16, -1),
    mm.tri_coeff.reshape(16, -1),
    mm.box_coeff.reshape(16, -1)], axis=1)
CTOT = comb.shape[1]
log(f"[1] combined coeff {comb.shape} (cs={cs} ct={ct} cb={cb})")

def make_kernel(precision):
    def kern(feats_ref, comb_ref, t_ref, idx_ref, ty_ref):
        feats = feats_ref[:].T
        a = feats[:, 12:13]
        tmin = jnp.full((B,), 1e-3)
        big = jnp.full((B,), T_MAX, jnp.float32)
        out = jnp.dot(feats, comb_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=precision)
        o0 = 0
        sph_h = out[:, o0:o0 + cs]; o0 += cs
        sph_c = out[:, o0:o0 + cs]; o0 += cs
        td = out[:, o0:o0 + ct]; o0 += ct
        tu = out[:, o0:o0 + ct]; o0 += ct
        tv = out[:, o0:o0 + ct]; o0 += ct
        tt = out[:, o0:o0 + ct]; o0 += ct
        bx = [out[:, o0 + k * cb:o0 + (k + 1) * cb] for k in range(6)]
        ts = sphere_candidate_t_mm(sph_h, sph_c, a, tmin, big)
        ttri = triangle_candidate_t_mm(td, tu, tv, tt, tmin, big)
        tbox = box_candidate_t_mm(*bx, tmin, big)

        def best(t, n_rows, ptype, carry):
            bt, bi, bty = carry
            rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            t = jnp.where(rows < n_rows, t, T_MAX)
            cmin = jnp.min(t, axis=1)
            rowf = rows.astype(jnp.float32)
            carg = jnp.min(jnp.where(t == cmin[:, None], rowf,
                                     float(t.shape[1])), axis=1).astype(jnp.int32)
            better = cmin < bt
            return (jnp.where(better, cmin, bt),
                    jnp.where(better, carg, bi),
                    jnp.where(better, ptype, bty))
        carry = (big, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32))
        carry = best(ts, scene.spheres.count, PRIM_SPHERE, carry)
        carry = best(ttri, scene.triangles.count, PRIM_TRIANGLE, carry)
        carry = best(tbox, scene.boxes.count, PRIM_BOX, carry)
        bt, bi, bty = carry
        t_ref[:] = bt[:, None]
        idx_ref[:] = bi[:, None]
        ty_ref[:] = bty[:, None]
    return kern

col = pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
def call(precision):
    return pl.pallas_call(
        make_kernel(precision), grid=(P // B,),
        in_specs=[
            pl.BlockSpec((16, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(comb.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(col, col, col),
        out_shape=(jax.ShapeDtypeStruct((P, 1), jnp.float32),
                   jax.ShapeDtypeStruct((P, 1), jnp.int32),
                   jax.ShapeDtypeStruct((P, 1), jnp.int32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

ref = jax.jit(lambda fr: pi.intersect_brute_pallas_feats(scene, fr, 1e-3))
hit_ref = jax.block_until_ready(ref(feats_in))
t0 = time.perf_counter()
for _ in range(5):
    hit_ref = ref(feats_in)
jax.block_until_ready(hit_ref)
log(f"[base chunked HIGHEST] {(time.perf_counter()-t0)/5*1e3:.2f} ms")

for name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                   ("HIGH", "float32"),
                   ("DEFAULT", jax.lax.Precision.DEFAULT)):
    try:
        f = jax.jit(lambda fr, p=prec: call(p)(fr, comb))
        t, idx, ty = jax.block_until_ready(f(feats_in))
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(feats_in)
        jax.block_until_ready(out)
        t, idx, ty = out
        hits = t[:, 0] < T_MAX
        same_hit = bool(jnp.mean((hits == hit_ref.hit).astype(jnp.float32)) == 1.0)
        both = hits & hit_ref.hit
        dt_ok = bool(jnp.allclose(jnp.where(both, t[:, 0], 0),
                                  jnp.where(both, hit_ref.t, 0),
                                  rtol=2e-4, atol=2e-4))
        id_match = float(jnp.mean(((idx[:, 0] == hit_ref.prim_idx)
                                   & (ty[:, 0] == hit_ref.prim_type)
                                   | ~both).astype(jnp.float32)))
        log(f"[onedot {name}] {(time.perf_counter()-t0)/5*1e3:.2f} ms "
            f"hits_equal={same_hit} t_ok={dt_ok} id_match={id_match:.6f}")
    except Exception as e:
        log(f"[onedot {name}] FAIL {type(e).__name__} {str(e)[:160]}")
