import time, jax, jax.numpy as jnp
N = 360_000
k = jax.random.PRNGKey(0)
d = jax.random.normal(k, (N,3))
def bench(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps): out = jax.block_until_ready(fn(*args))
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms")
def sky_only(u):
    a = u[..., 1:2]
    horizon = jnp.asarray([0.6,0.8,1.0]); zenith = jnp.asarray([0.2,0.5,1.0])
    return jnp.where(a > 0.0, (1.0-a)*horizon + a*zenith, horizon*0.1)
bench("sky gradient standalone", jax.jit(sky_only), d)
import raytracer_project_tpu
bench("sky gradient after import", jax.jit(sky_only), d)
