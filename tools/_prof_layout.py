"""Micro-bench: [N,3] vs [3,N] vector math layouts on TPU."""
import time
import jax, jax.numpy as jnp

N = 360_000
key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (N, 3), jnp.float32)
b = jax.random.normal(jax.random.PRNGKey(1), (N, 3), jnp.float32)
aT = a.T.copy()
bT = b.T.copy()
s = jax.random.normal(jax.random.PRNGKey(2), (N,), jnp.float32)


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.3f} ms")


@jax.jit
def dot_n3(a, b):
    return jnp.sum(a * b, axis=-1)

@jax.jit
def dot_3n(a, b):
    return jnp.sum(a * b, axis=0)

@jax.jit
def normalize_n3(a):
    return a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))

@jax.jit
def normalize_3n(a):
    return a / jnp.sqrt(jnp.sum(a * a, axis=0, keepdims=True))

@jax.jit
def cross_n3(a, b):
    return jnp.cross(a, b)

@jax.jit
def cross_3n(a, b):
    ax, ay, az = a[0], a[1], a[2]
    bx, by, bz = b[0], b[1], b[2]
    return jnp.stack([ay*bz-az*by, az*bx-ax*bz, ax*by-ay*bx])

@jax.jit
def chain_n3(a, b, s):
    # ~typical shading arithmetic: few dots, selects, normalize
    d = jnp.sum(a * b, axis=-1)
    r = a - 2.0 * d[:, None] * b
    m = d > 0.0
    r = jnp.where(m[:, None], r, a)
    return r / jnp.sqrt(jnp.maximum(jnp.sum(r * r, axis=-1, keepdims=True), 1e-12))

@jax.jit
def chain_3n(a, b, s):
    d = jnp.sum(a * b, axis=0)
    r = a - 2.0 * d[None, :] * b
    m = d > 0.0
    r = jnp.where(m[None, :], r, a)
    return r / jnp.sqrt(jnp.maximum(jnp.sum(r * r, axis=0, keepdims=True), 1e-12))

@jax.jit
def trans_n(s):
    return jnp.arccos(jnp.clip(s, -1, 1)) + jnp.arctan2(s, 1.0 + s * s)

bench("dot [N,3]", dot_n3, a, b)
bench("dot [3,N]", dot_3n, aT, bT)
bench("normalize [N,3]", normalize_n3, a)
bench("normalize [3,N]", normalize_3n, aT)
bench("cross [N,3]", cross_n3, a, b)
bench("cross [3,N]", cross_3n, aT, bT)
bench("chain [N,3]", chain_n3, a, b, s)
bench("chain [3,N]", chain_3n, aT, bT, s)
bench("arccos+atan2 [N]", trans_n, s)
