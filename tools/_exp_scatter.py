import time, jax, jax.numpy as jnp
P, NPIX = 262_144, 360_001
key = jax.random.PRNGKey(0)
tgt = jax.random.randint(key, (P,), 0, NPIX)
val = jax.random.normal(jax.random.PRNGKey(1), (P, 3))
def bench(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps): out = jax.block_until_ready(fn(*args))
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)

buf = jnp.zeros((NPIX, 3), jnp.float32)
bench("at[].add [P]->[NPIX,3]", jax.jit(lambda b,t,v: b.at[t].add(v)), buf, tgt, val)
bench("segment_sum", jax.jit(lambda t,v: jax.ops.segment_sum(v, t, num_segments=NPIX)), tgt, val)
# transposed: [3, NPIX] scatter cols
bufT = jnp.zeros((3, NPIX), jnp.float32)
bench("at[:,t].add transposed", jax.jit(lambda b,t,v: b.at[:, t].add(v.T)), bufT, tgt, val)
# three 1-D scatters
buf1 = jnp.zeros((NPIX,), jnp.float32)
def three(t, v):
    return tuple(jnp.zeros((NPIX,), jnp.float32).at[t].add(v[:, i]) for i in range(3))
bench("3x 1-D scatter-add", jax.jit(three), tgt, val)
# scatter into padded [NPIX, 8]
buf8 = jnp.zeros((NPIX, 8), jnp.float32)
val8 = jnp.pad(val, ((0,0),(0,5)))
bench("at[].add [P]->[NPIX,8]", jax.jit(lambda b,t,v: b.at[t].add(v)), buf8, tgt, val8)
