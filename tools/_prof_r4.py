"""Round-4 microbench: cost of each pool-body component at bench shapes."""
import time
import jax, jax.numpy as jnp

P = 262_144
N = 360_000  # 800*450

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
li = jax.random.randint(ks[0], (P,), 0, N, dtype=jnp.int32)
val = jax.random.uniform(ks[1], (P,))
val3 = tuple(jax.random.uniform(ks[2], (P,)) for _ in range(3))
mask = jax.random.uniform(ks[3], (P,)) < 0.4
free = jax.random.uniform(ks[4], (P,)) < 0.4
idx_prim = jax.random.randint(ks[5], (P,), 0, 1454, dtype=jnp.int32)
table = jax.random.uniform(ks[6], (1454, 28))
acc = {c: jnp.zeros((N + 1,), jnp.float32) for c in "xyz"}


def bench(name, fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms")
    return out


# 1. masked scatter-add x3 channels (current accumulation)
@jax.jit
def scat3(acc, mask, li, val3):
    tgt = jnp.where(mask, li, N)
    return {c: acc[c].at[tgt].add(jnp.where(mask, val3[i], 0.0))
            for i, c in enumerate("xyz")}
bench("scatter-add 3x [262k]->[360k]", scat3, acc, mask, li, val3)

# 1b. one channel only
@jax.jit
def scat1(acc, mask, li, v):
    tgt = jnp.where(mask, li, N)
    return acc["x"].at[tgt].add(jnp.where(mask, v, 0.0))
bench("scatter-add 1x [262k]->[360k]", scat1, acc, mask, li, val)

# 1c. small scatter (16k updates)
li16 = li[:16384]
v16 = val[:16384]
m16 = mask[:16384]
@jax.jit
def scat_small(acc, m, li, v):
    tgt = jnp.where(m, li, N)
    return {c: acc[c].at[tgt].add(jnp.where(m, v, 0.0)) for c in "xyz"}
bench("scatter-add 3x [16k]->[360k]", scat_small, acc, m16, li16, v16)

# 2. f32 cumsum over [P]
@jax.jit
def cums(f):
    return jnp.cumsum(f.astype(jnp.float32))
bench("cumsum f32 [262k]", cums, free)

# 3. small-table gather [P] rows from [1454, 28]
@jax.jit
def gath(table, idx):
    return table[idx]
bench("gather [262k, 28] from [1454, 28]", gath, table, idx_prim)

# 3b. f32-index trick gather 1-D
big = jax.random.uniform(ks[7], (N,))
@jax.jit
def gath1d(big, li):
    return big.astype(jnp.float32)[li]
bench("gather 1-D [262k] from [360k] f32", gath1d, big, li)

# 4. searchsorted compaction: find indices of first 16384 done lanes
@jax.jit
def compact(mask, li, val3):
    c = jnp.cumsum(mask.astype(jnp.float32))
    sel = jnp.searchsorted(c, jnp.arange(1, 16385, dtype=jnp.float32))
    sel = jnp.minimum(sel, P - 1).astype(jnp.int32)
    ok = jnp.arange(16384) < c[-1]
    cli = jnp.where(ok, li.astype(jnp.float32)[sel].astype(jnp.int32), N)
    return cli, tuple(jnp.where(ok, v[sel], 0.0) for v in val3)
bench("compact 16k of [262k] (cumsum+ss+gath)", compact, mask, li, val3)

# 5. elementwise soup: ~30 vector ops on [P] components
@jax.jit
def soup(a, b, c):
    x, y, z = a, b, c
    for _ in range(10):
        x = x * y + z
        y = jnp.maximum(y * 0.5 + x, z)
        z = jnp.where(x > y, z + x, z - y)
    return x, y, z
bench("30 elementwise ops on 3x[262k]", soup, *val3)

# 6. while-loop carry overhead: trivial body with same-size carry as pool
state = {
    **{f"v{i}": jnp.zeros((P,), jnp.float32) for i in range(15)},
    **{f"i{i}": jnp.zeros((P,), jnp.int32) for i in range(5)},
    **{f"b{i}": jnp.zeros((P,), bool) for i in range(4)},
    **{f"a{c}": jnp.zeros((N + 1,), jnp.float32) for c in "xyz"},
    "n": jnp.zeros((), jnp.int32),
}
@jax.jit
def carry_loop(state):
    def body(s):
        s = dict(s)
        s["n"] = s["n"] + 1
        s["v0"] = s["v0"] + 1.0
        return s
    return jax.lax.while_loop(lambda s: s["n"] < 10, body, state)
out = jax.block_until_ready(carry_loop(state))
t0 = time.perf_counter()
out = jax.block_until_ready(carry_loop(state))
print(f"{'while_loop 10 iters, pool-size carry':42s} {(time.perf_counter()-t0)/10*1e3:8.3f} ms/iter")
