"""Find what creates the ~25ms dispatch floor."""
import time, sys
import jax, jax.numpy as jnp

N = 360_000
d = jax.random.normal(jax.random.PRNGKey(0), (N, 3), jnp.float32)


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.3f} ms", flush=True)


from raytracer_project_tpu.core import vecmath
f_norm = jax.jit(vecmath.normalize)
bench("normalize (fresh process)", f_norm, d)

# load scene (big constants to device)
from raytracer_project_tpu.models import presets
scene = presets.showcase_scene(with_bvh=True, with_meshes=True)
scene = jax.device_put(scene)
jax.block_until_ready(scene.spheres.center)
bench("normalize (after scene load)", f_norm, d)

# run the pallas kernel once
from raytracer_project_tpu.ops import pallas_intersect
from raytracer_project_tpu.core.constants import T_MIN
o = jnp.zeros((N, 3), jnp.float32)
f_p = jax.jit(lambda o, d: pallas_intersect.intersect_brute_pallas(scene, o, d, T_MIN))
hit = f_p(o, d)
jax.block_until_ready(hit)
bench("normalize (after pallas run)", f_norm, d)
bench("pallas intersect", f_p, o, d)
bench("normalize again", f_norm, d)
