"""Layout pathology check: [P,3] vs [3,P] vs SoA [P] component arrays."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

P = 262_144
k = jax.random.PRNGKey(0)
a3 = jax.random.normal(k, (P, 3))
b3 = jax.random.normal(k, (P, 3))
a3t = jnp.asarray(a3.T)
b3t = jnp.asarray(b3.T)
ax, ay, az = (jnp.asarray(a3[:, i]) for i in range(3))
bx, by, bz = (jnp.asarray(b3[:, i]) for i in range(3))
u = jax.random.randint(k, (P,), 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms")


# fma + dot along the vector axis, materializing the result
bench("[P,3]: fma + dot(-1)", jax.jit(
    lambda a, b: jnp.sum((a * b + a) * b, axis=-1)), a3, b3)
bench("[3,P]: fma + dot(0)", jax.jit(
    lambda a, b: jnp.sum((a * b + a) * b, axis=0)), a3t, b3t)
bench("SoA: fma + dot", jax.jit(
    lambda ax, ay, az, bx, by, bz:
    (ax * bx + ax) * bx + (ay * by + ay) * by + (az * bz + az) * bz),
    ax, ay, az, bx, by, bz)

# cross product
bench("[P,3]: cross", jax.jit(lambda a, b: jnp.cross(a, b)), a3, b3)
bench("SoA: cross", jax.jit(
    lambda ax, ay, az, bx, by, bz:
    (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)),
    ax, ay, az, bx, by, bz)

# normalize (rsqrt + broadcast mult)
bench("[P,3]: normalize", jax.jit(
    lambda a: a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True))), a3)
bench("SoA: normalize", jax.jit(
    lambda ax, ay, az: tuple(
        c * jax.lax.rsqrt(ax * ax + ay * ay + az * az)
        for c in (ax, ay, az))), ax, ay, az)

# 1-D cumsum vs 2-D blocked-matmul cumsum
bench("cumsum [P] f32", jax.jit(jnp.cumsum), ax)


def cumsum_mm(x):
    n = x.shape[0]
    r = x.reshape(n // 128, 128)
    tri = jnp.tril(jnp.ones((128, 128), jnp.float32))          # [i>=j]
    within = r @ tri.T                                          # row cumsum
    sums = within[:, -1]
    m = n // 128
    s2 = sums.reshape(m // 128, 128)
    w2 = s2 @ tri.T
    rowtot = w2[:, -1]
    off2 = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                            jnp.cumsum(rowtot)[:-1]])
    blockoff = (w2 - s2 + off2[:, None]).reshape(m)
    return (within + blockoff[:, None]).reshape(n)


xc = jnp.abs(ax)
r_ref = jnp.cumsum(xc)
r_mm = cumsum_mm(xc)
print("cumsum_mm max err:", float(jnp.max(jnp.abs(r_ref - r_mm))))
bench("cumsum matmul-blocked", jax.jit(cumsum_mm), xc)

# PCG4D-ish hash chain on [P] uint32
def hash_u32(x):
    for _ in range(4):
        x = x * jnp.uint32(1664525) + jnp.uint32(1013904223)
        x = x ^ (x >> 16)
    return x
bench("uint32 hash chain [P]", jax.jit(hash_u32), u)
bench("uint32 hash chain [P/128,128]", jax.jit(hash_u32),
      u.reshape(P // 128, 128))

# gather: [P] f32 indices into [N,3] table vs [N] SoA
import numpy as np
idx = jnp.asarray(np.random.randint(0, 360000, P), jnp.int32)
tblN3 = jax.random.normal(k, (360001, 3))
tblN = jnp.asarray(tblN3[:, 0])
bench("gather [N,3] by i32 idx", jax.jit(lambda t, i: t[i]), tblN3, idx)
bench("gather [N] f32 via f32 idx", jax.jit(
    lambda t, i: t[i.astype(jnp.float32).astype(jnp.int32)]), tblN, idx)

# scatter-add 1-D
acc = jnp.zeros((360001,), jnp.float32)
bench("scatter-add [P]->[360k]", jax.jit(
    lambda a, i, v: a.at[i].add(v)), acc, idx, ax)
