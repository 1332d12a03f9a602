"""Micro-bench: row gather vs one-hot matmul fetch on TPU."""
import time
import jax, jax.numpy as jnp
import numpy as np

N = 360_000
C = 6400
F = 28

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (C, F), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, C, jnp.int32)


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.2f} ms")


@jax.jit
def f_gather(table, idx):
    return table[idx]


CHUNK = 256


@jax.jit
def f_onehot(table, idx):
    n_chunks = C // CHUNK
    tchunks = table.reshape(n_chunks, CHUNK, F)

    def body(acc, args):
        tc, ci = args
        cols = ci * CHUNK + jnp.arange(CHUNK, dtype=jnp.int32)
        oh = (idx[:, None] == cols[None, :]).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            oh, tc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), None

    acc = jnp.zeros((N, F), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, (tchunks, jnp.arange(n_chunks, dtype=jnp.int32)))
    return acc


@jax.jit
def f_onehot_single(table, idx):
    oh = (idx[:, None] == jnp.arange(C, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    return jax.lax.dot_general(oh, table, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# small-table gather (materials, 35 rows)
tab_s = jax.random.normal(key, (35, 8), jnp.float32)
idx_s = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, 35, jnp.int32)


@jax.jit
def f_gather_small(t, i):
    return t[i]


@jax.jit
def f_onehot_small(t, i):
    oh = (i[:, None] == jnp.arange(35, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    return jax.lax.dot_general(oh, t, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# texture atlas gather [K, AH, AW, 3]
atlas = jax.random.normal(key, (8, 512, 512, 3), jnp.float32)
tid = jax.random.randint(jax.random.PRNGKey(3), (N,), 0, 8, jnp.int32)
ij = jax.random.randint(jax.random.PRNGKey(4), (N, 2), 0, 512, jnp.int32)


@jax.jit
def f_atlas(a, tid, ij):
    return a[tid, ij[:, 0], ij[:, 1]]


bench("gather [6400,28] x 360k", f_gather, table, idx)
bench("onehot-mm chunked", f_onehot, table, idx)
bench("onehot-mm single", f_onehot_single, table, idx)
bench("gather small [35,8]", f_gather_small, tab_s, idx_s)
bench("onehot-mm small", f_onehot_small, tab_s, idx_s)
bench("atlas gather [8,512,512,3]", f_atlas, atlas, tid, ij)

# verify equality
print("equal:", bool(jnp.all(f_gather(table, idx) == f_onehot(table, idx))))
