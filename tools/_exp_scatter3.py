import time, jax, jax.numpy as jnp
P, NPIX = 262_144, 360_001
key = jax.random.PRNGKey(0)
tgt0 = jax.random.randint(key, (P,), 0, NPIX)
mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.4, (P,))  # 40% real
tgt_collide = jnp.where(mask, tgt0, NPIX - 1)
val0 = jax.random.normal(jax.random.PRNGKey(1), (P, 3))
def bench(name, tgt):
    f = jax.jit(lambda b, t, v: b.at[:, t].add(v.T))
    buf = jnp.zeros((3, NPIX), jnp.float32)
    out = jax.block_until_ready(f(buf, tgt, val0))
    t0 = time.perf_counter()
    for _ in range(5): out = jax.block_until_ready(f(buf, tgt, val0))
    print(f"{name:36s} {(time.perf_counter()-t0)/5*1e3:9.3f} ms", flush=True)
bench("uniform random tgt", tgt0)
bench("60% collide on one slot", tgt_collide)
spread = jnp.where(mask, tgt0, NPIX - 1 - (jnp.arange(P) % 4096))
bench("60% spread over 4096 slots", spread)
