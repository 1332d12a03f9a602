import time, jax, jax.numpy as jnp
from raytracer_project_tpu.models import environment as env_mod
from raytracer_project_tpu.core import vecmath

N = 360_000
key = jax.random.PRNGKey(0)
d = jax.random.normal(key, (N, 3))
env = env_mod.make_environment(sun_direction=(0.4,0.7,0.2), sun_intensity=6.0)

def bench(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps): out = jax.block_until_ready(fn(*args))
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms")
    return out

bench("full background_color", jax.jit(lambda d: env_mod.background_color(env, d, env_mod.PHYSICAL_SUN)), d)
bench("normalize only", jax.jit(lambda d: vecmath.normalize(d)), d)
ud = jax.block_until_ready(vecmath.normalize(d))
bench("shade_sun_sky on unit dirs", jax.jit(lambda u: env_mod.shade_sun_sky(env, u)), ud)
# bisect sun_sky internals
def sky_only(u):
    a = u[..., 1:2]
    horizon = jnp.asarray([0.6,0.8,1.0]); zenith = jnp.asarray([0.2,0.5,1.0])
    return jnp.where(a > 0.0, (1.0-a)*horizon + a*zenith, horizon*0.1)
bench("sky gradient only", jax.jit(sky_only), ud)
def disc_only(u):
    sun_dir = vecmath.normalize(env.sun_direction)
    sun_focus = vecmath.dot(u, sun_dir)
    threshold = 1.0 - env.sun_size * 0.001
    alpha = vecmath.smoothstep(threshold, threshold + 0.0002, sun_focus)
    disc_on = (sun_focus > threshold)
    return jnp.where(disc_on[..., None], alpha[..., None]*jnp.ones(3), 0.0)
bench("sun disc only", jax.jit(disc_only), ud)
