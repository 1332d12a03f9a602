"""Design probes: u32 op costs, RNG variants, gather/scatter variants."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

P = 262_144
k = jax.random.PRNGKey(0)
u = jax.random.randint(k, (P,), 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
f = jax.random.normal(k, (P,))


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms")


bench("u32 mul x1", jax.jit(lambda x: x * jnp.uint32(1664525)), u)
bench("u32 add x1", jax.jit(lambda x: x + jnp.uint32(12345)), u)
bench("u32 xor+shift x1", jax.jit(lambda x: x ^ (x >> 16)), u)
def mix4(x):
    a = x + ((x << 13) | (x >> 19))
    b = x + ((x << 7) | (x >> 25))
    c = x ^ ((x << 17) | (x >> 15))
    d = x + ((x << 5) | (x >> 27))
    return a ^ (b + (c ^ d))
bench("u32 mulhi-free mix (add/xor/rot) x4", jax.jit(mix4), u)

# current PCG4D draw for comparison
from raytracer_project_tpu.core import rng as rng_mod
seed = rng_mod.seed_from_key(k)
pix = jnp.arange(P, dtype=jnp.uint32)
samp = jnp.zeros((P,), jnp.uint32)
bounce = jnp.zeros((P,), jnp.uint32)
def pcg_draw(pix, samp, bounce):
    lr = rng_mod.LaneRng(seed, pix, samp, bounce)
    return rng_mod.draw_uniform(lr, rng_mod.STREAM_RR)
bench("PCG4D one draw", jax.jit(pcg_draw), pix, samp, bounce)

# threefry-style: jax.random.fold_in/uniform per lane is not lane-wise;
# instead try 2x u32 mul replaced by f32 arithmetic hash
def f32_hash_draw(pix, samp, bounce):
    # map counters into f32 and mix with sin-free polynomial hashing
    x = pix.astype(jnp.float32) * 0.1031 + samp.astype(jnp.float32) * 0.11369
    y = bounce.astype(jnp.float32) * 0.13787 + x
    h = jnp.modf(x * y * 95.4307 + x * 7.5301)[0]
    return jnp.abs(h)
bench("f32 poly hash draw (quality?)", jax.jit(f32_hash_draw),
      pix, samp, bounce)

# gather from SMALL table (1454 rows, 28 cols) at 262k indices
tbl = jax.random.normal(k, (1454, 28))
idx = jnp.asarray(np.random.randint(0, 1454, P), jnp.int32)
bench("gather [1454,28] @262k i32", jax.jit(lambda t, i: t[i]), tbl, idx)
idxf = idx.astype(jnp.float32)
bench("gather [1454,28] @262k f32idx", jax.jit(
    lambda t, i: t[i.astype(jnp.int32)]), tbl, idxf)
# one-hot matmul gather: [P,1454] x [1454,28] on MXU
def onehot_gather(t, i):
    oh = (i[:, None] == jnp.arange(t.shape[0], dtype=jnp.int32)[None, :])
    return oh.astype(jnp.bfloat16) @ t.astype(jnp.bfloat16)
bench("one-hot-matmul gather bf16", jax.jit(onehot_gather), tbl, idx)

# scatter variants: 360k-slot accumulator
n = 360_000
idx2 = jnp.asarray(np.random.randint(0, n, P), jnp.int32)
v3 = jax.random.normal(k, (P, 3))
acc1 = jnp.zeros((n + 1,), jnp.float32)
acc3 = jnp.zeros((n + 1, 3), jnp.float32)
acc8 = jnp.zeros((n + 1, 8), jnp.float32)
bench("scatter-add 1-D x3 channels", jax.jit(
    lambda a, i, v: tuple(a.at[i].add(v[:, c]) for c in range(3))),
    acc1, idx2, v3)
bench("scatter-add [n,3] window", jax.jit(
    lambda a, i, v: a.at[i].add(v)), acc3, idx2, v3)
v8 = jnp.pad(v3, ((0, 0), (0, 5)))
bench("scatter-add [n,8] window", jax.jit(
    lambda a, i, v: a.at[i].add(v)), acc8, idx2, v8)
