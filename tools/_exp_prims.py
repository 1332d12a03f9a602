"""Primitive costs for binning: cumsum, scatter, gather at pair scale."""
import time, jax, jax.numpy as jnp
import numpy as np

N = 262_144
C = 26
PAIRS = 2_000_000
def bench(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps): out = jax.block_until_ready(fn(*args))
    print(f"{name:48s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)
    return out

k = jax.random.PRNGKey(0)
ok = jax.random.bernoulli(k, 0.27, (N, C))
f = jax.jit(lambda ok: jnp.cumsum(ok.astype(jnp.float32), axis=0))
bench("cumsum [N,26] axis0 f32", f, ok)
f2 = jax.jit(lambda ok: jnp.cumsum(ok.astype(jnp.float32).T.reshape(-1)))
bench("cumsum [26N] flat f32", f2, ok)
# scatter set: positions ~ sorted-ish
pos = jax.random.randint(jax.random.PRNGKey(1), (PAIRS,), 0, PAIRS+1)
val = jax.random.normal(jax.random.PRNGKey(2), (PAIRS,))
f3 = jax.jit(lambda p, v: jnp.zeros((PAIRS+1,), jnp.float32).at[p].set(v))
bench("scatter-set 2M f32 -> 2M", f3, pos, val)
# scatter from [N*C] masked to pair slots
posNC = jax.random.randint(jax.random.PRNGKey(3), (N*C,), 0, PAIRS+1)
valNC = jax.random.normal(jax.random.PRNGKey(4), (N*C,))
f4 = jax.jit(lambda p, v: jnp.zeros((PAIRS+1,), jnp.float32).at[p].set(v))
bench("scatter-set 6.8M f32 -> 2M", f4, posNC, valNC)
# scatter-min back: 2M pairs -> N rays
ray_of_pair = jax.random.randint(jax.random.PRNGKey(5), (PAIRS,), 0, N)
tvals = jax.random.uniform(jax.random.PRNGKey(6), (PAIRS,))
f5 = jax.jit(lambda r, t: jnp.full((N,), 1e30, jnp.float32).at[r].min(t))
bench("scatter-min 2M -> N", f5, ray_of_pair, tvals)
# gather feats for pairs
feats = jax.random.normal(jax.random.PRNGKey(7), (N, 16))
f6 = jax.jit(lambda f_, r: f_[r])
bench("gather [N,16] by 2M idx", f6, feats, ray_of_pair)
# in-row sort of 26 lanes (chunk-list compaction per ray)
vals26 = jnp.where(ok, jnp.arange(C)[None,:].astype(jnp.float32), 1e9)
f7 = jax.jit(lambda v: jnp.sort(v, axis=1))
bench("sort [N,26] along lanes", f7, vals26)
# cumsum [N] f32 flat
m = jax.random.bernoulli(jax.random.PRNGKey(8), 0.5, (N,))
f8 = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.float32)))
bench("cumsum [N] f32", f8, m)
# onehot-cumsum counting sort cost at 26 buckets
bkey = jax.random.randint(jax.random.PRNGKey(9), (N,), 0, C)
def csort(bkey):
    onehot = (bkey[:, None] == jnp.arange(C, dtype=jnp.int32)[None, :])
    within = jnp.cumsum(onehot.astype(jnp.float32), axis=0)
    totals = within[-1]
    base = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(totals)[:-1]])
    rank = jnp.take_along_axis(within, bkey[:, None], axis=1)[:, 0] - 1.0
    dest = (base[bkey] + rank).astype(jnp.int32)
    return jnp.zeros((N,), jnp.int32).at[dest].set(jnp.arange(N, dtype=jnp.int32))
bench("counting sort 26 buckets [N]", jax.jit(csort), bkey)
