"""Micro-bench pool primitives: scatter-add, cumsum, argsort."""
import time
import jax, jax.numpy as jnp

P = 262_144
NPIX = 360_000
key = jax.random.PRNGKey(0)
vals = jax.random.normal(key, (P, 3), jnp.float32)
slots = jax.random.randint(jax.random.PRNGKey(1), (P,), 0, NPIX, jnp.int32)
mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.3, (P,))
keys32 = jax.random.randint(jax.random.PRNGKey(3), (P,), 0, 1 << 30, jnp.int32)


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.3f} ms", flush=True)


@jax.jit
def scatter_add(vals, slots, mask):
    acc = jnp.zeros((NPIX, 3), jnp.float32)
    contrib = jnp.where(mask[:, None], vals, 0.0)
    tgt = jnp.where(mask, slots, NPIX)  # drop masked into overflow row
    acc = jnp.zeros((NPIX + 1, 3), jnp.float32).at[tgt].add(contrib)
    return acc[:NPIX]


@jax.jit
def prefix(mask):
    return jnp.cumsum(mask.astype(jnp.int32))


@jax.jit
def argsort32(k):
    return jnp.argsort(k)


@jax.jit
def sort_gather(k, vals):
    order = jnp.argsort(k)
    return vals[order]


bench("scatter-add [262k]->[360k,3]", scatter_add, vals, slots, mask)
bench("cumsum mask [262k]", prefix, mask)
bench("argsort u32 [262k]", argsort32, keys32)
bench("argsort+gather", sort_gather, keys32, vals)
