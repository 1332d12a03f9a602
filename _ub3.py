import time, jax, jax.numpy as jnp
N = 360_000
k = jax.random.PRNGKey(0)
def bench(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps): out = jax.block_until_ready(fn(*args))
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms")
def sky_only(u):
    a = u[..., 1:2]
    horizon = jnp.asarray([0.6,0.8,1.0]); zenith = jnp.asarray([0.2,0.5,1.0])
    return jnp.where(a > 0.0, (1.0-a)*horizon + a*zenith, horizon*0.1)
f = jax.jit(sky_only)
d1 = jax.random.normal(k, (N,3))
bench("d created early", f, d1)
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.core import vecmath
env = env_mod.make_environment(sun_direction=(0.4,0.7,0.2), sun_intensity=6.0)
d2 = jax.random.normal(jax.random.PRNGKey(1), (N,3))
bench("d created after imports", f, d2)
bench("d1 again", f, d1)
g = jax.jit(lambda u: env_mod.shade_sun_sky(env, u))
bench("shade_sun_sky(d1)", g, d1)
bench("shade_sun_sky(d2)", g, d2)
ud = jax.block_until_ready(vecmath.normalize(d1))
bench("sky_only(ud eager-normalized)", f, ud)
ud2 = jax.block_until_ready(jax.jit(vecmath.normalize)(d1))
bench("sky_only(ud jit-normalized)", f, ud2)
