import time
import jax, jax.numpy as jnp

P = 262_144
NB = 128
key = jax.random.PRNGKey(0)
bkey = jax.random.randint(key, (P,), 0, NB, jnp.int32)
state = [jax.random.normal(jax.random.PRNGKey(i), (P, 3), jnp.float32) for i in range(6)]
order0 = jax.random.permutation(jax.random.PRNGKey(9), P).astype(jnp.int32)


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)


@jax.jit
def onehot_cumsum(bkey):
    onehot = bkey[:, None] == jnp.arange(NB, dtype=jnp.int32)[None, :]
    return jnp.cumsum(onehot.astype(jnp.int32), axis=0)

@jax.jit
def full_partition(bkey):
    onehot = bkey[:, None] == jnp.arange(NB, dtype=jnp.int32)[None, :]
    within = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
    totals = within[-1]
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(totals)[:-1]])
    rank = jnp.take_along_axis(within, bkey[:, None], axis=1)[:, 0] - 1
    dest = base[bkey] + rank
    return jnp.zeros((P,), jnp.int32).at[dest].set(jnp.arange(P, dtype=jnp.int32))

@jax.jit
def blocked_partition(bkey):
    B = 512
    nblk = P // B
    onehot = (bkey[:, None] == jnp.arange(NB, dtype=jnp.int32)[None, :]).astype(jnp.int32)
    blk = onehot.reshape(nblk, B, NB)
    blk_tot = blk.sum(axis=1)                       # [nblk, NB]
    blk_pref = jnp.cumsum(blk_tot, axis=0) - blk_tot  # exclusive over blocks
    within_blk = jnp.cumsum(blk, axis=1)            # [nblk, B, NB] inclusive
    totals = blk_tot.sum(axis=0)
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(totals)[:-1]])
    within = (blk_pref[:, None, :] + within_blk).reshape(P, NB)
    rank = jnp.take_along_axis(within, bkey[:, None], axis=1)[:, 0] - 1
    dest = base[bkey] + rank
    return jnp.zeros((P,), jnp.int32).at[dest].set(jnp.arange(P, dtype=jnp.int32))

@jax.jit
def gathers(order, state):
    return [x[order] for x in state]

bench("onehot+cumsum [262k,128]", onehot_cumsum, bkey)
bench("full partition", full_partition, bkey)
bench("blocked partition", blocked_partition, bkey)
bench("6x gather [262k,3]", gathers, order0, state)

import numpy as np
a = np.asarray(full_partition(bkey))
b = np.asarray(blocked_partition(bkey))
print("partitions equal:", (a == b).all())
