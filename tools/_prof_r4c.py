"""Synthetic pool-body testbed: reproduce the composed-graph slowdown.

Compares the same mix of ops (elementwise chains + gathers + cumsum +
masked scatter-adds, pool-sized carry in/out) with 1-D [P] lane state vs
2-D [P//128, 128] lane state.
"""
import time
import jax, jax.numpy as jnp

P = 262_144
N = 360_001
R = P // 128

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
table = jax.random.uniform(ks[0], (1454,))
mtable = jax.random.uniform(ks[1], (34,))


def mk_state(shape):
    s = {}
    for i in range(15):
        s[f"v{i}"] = jax.random.uniform(jax.random.PRNGKey(i), shape)
    for i in range(5):
        s[f"i{i}"] = jax.random.randint(jax.random.PRNGKey(50 + i), shape, 0,
                                        1400, dtype=jnp.int32)
    for i in range(3):
        s[f"b{i}"] = jax.random.uniform(jax.random.PRNGKey(80 + i), shape) < 0.5
    for c in "xyz":
        s[f"a{c}"] = jnp.zeros((N,), jnp.float32)
    s["n"] = jnp.zeros((), jnp.int32)
    return s


def body(s, flat):
    """~150 mixed ops, shaped like one pool step."""
    v = [s[f"v{i}"] for i in range(15)]
    idx = s["i0"]
    # "intersect-ish" elementwise chain
    for k in range(10):
        v[k % 15] = v[k % 15] * v[(k + 3) % 15] + v[(k + 7) % 15]
    # record decode: 28 gathers from small table + selects
    g = [table[(idx + k) % 1454] for k in range(28)]
    mask = s["b0"]
    g = [jnp.where(mask, gk, 0.5) for gk in g]
    # decode math
    acc0 = v[0]
    for k in range(28):
        acc0 = acc0 * 0.99 + g[k]
    # material fetch: 8 gathers from tiny table
    m = [mtable[(s["i1"] + k) % 34] for k in range(8)]
    for k in range(8):
        acc0 = acc0 + m[k]
    # shade-ish chain (~60 ops)
    a, b, c = v[1], v[2], v[3]
    for k in range(20):
        a = a * b + c
        b = jnp.maximum(b * 0.5 + a, c)
        c = jnp.where(a > b, c + a, c - b)
    # RR / masks
    done = (a > b) & s["b1"]
    live = s["b2"] | done
    # respawn: cumsum + rank
    if flat:
        rank = (jnp.cumsum(done.astype(jnp.float32)) - 1.0).astype(jnp.int32)
    else:
        f = done.astype(jnp.float32)
        row = jnp.cumsum(f, axis=1)
        base = jnp.cumsum(jnp.sum(f, axis=1))
        rank = (row + (base - jnp.sum(f, axis=1))[:, None] - 1.0).astype(jnp.int32)
    neww = s["n"] + rank
    # accumulate: 3 masked scatter-adds
    li = (s["i2"].reshape(-1) * 7) % (N - 1)
    tgt = jnp.where(done.reshape(-1), li, N - 1)
    acc = {}
    for j, ch in enumerate("xyz"):
        acc[f"a{ch}"] = s[f"a{ch}"].at[tgt].add(
            jnp.where(done.reshape(-1), v[j].reshape(-1), 0.0))
    out = dict(s)
    out.update(acc)
    for i in range(15):
        out[f"v{i}"] = v[i] if i > 2 else (a, b, c)[i]
    out["v14"] = acc0
    out["i3"] = jnp.where(done, neww, s["i3"])
    out["b2"] = live
    out["n"] = s["n"] + 1
    return out


def bench(name, fn, s0, reps=5):
    s = jax.block_until_ready(fn(s0))
    s = jax.block_until_ready(fn(s))
    t0 = time.perf_counter()
    for _ in range(reps):
        s = fn(s)
    jax.block_until_ready(s)
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")


s1d = mk_state((P,))
s2d = mk_state((R, 128))
bench("mini-body 1-D [262144]", jax.jit(lambda s: body(s, True)), s1d)
bench("mini-body 2-D [2048,128]", jax.jit(lambda s: body(s, False)), s2d)
