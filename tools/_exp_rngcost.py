"""Cost of the per-step threefry key plumbing at pool scale, in one jit."""
import time
import jax, jax.numpy as jnp
from raytracer_project_tpu.core import rng
from raytracer_project_tpu.ops import wavefront

P = 262_144
key = jax.random.PRNGKey(0)
samp = jnp.zeros((P,), jnp.int32)
pix = jnp.arange(P, dtype=jnp.int32)
bounce = jnp.ones((P,), jnp.int32)
is_spec = jnp.zeros((P,), bool)
at0 = bounce == 0

@jax.jit
def keys_step(samp, pix, bounce, is_spec):
    at0 = bounce == 0
    keys6 = wavefront._lane_keys(key, samp, pix)
    _, k_first, k_path, k_spec, k_spec_path, k_vol0 = keys6
    cont = wavefront._select_keys(is_spec[:, None], k_spec_path, k_path)
    bk = rng.fold_each(cont, jnp.maximum(bounce - 1, 0))
    k_sc_c, k_rr, k_vol_c = rng.split_each(bk, 3)
    k_scatter = wavefront._select_keys(
        at0[:, None], wavefront._select_keys(is_spec[:, None], k_spec, k_first), k_sc_c)
    k_vol = wavefront._select_keys(at0[:, None], k_vol0, k_vol_c)
    # consume like the body: a few uniforms and vectors
    u = rng.uniform_each(k_rr)
    v = rng.unit_vector_each(k_scatter)
    w = rng.uniform_each(k_vol)
    return u + w, v

def bench(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps): out = jax.block_until_ready(fn(*args))
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)

bench("per-step key plumbing + 3 draws", keys_step, samp, pix, bounce, is_spec)
