import time, jax, jax.numpy as jnp
P, NPIX = 262_144, 360_001
key = jax.random.PRNGKey(0)
tgt0 = jax.random.randint(key, (P,), 0, NPIX)
val0 = jax.random.normal(jax.random.PRNGKey(1), (P, 3))

@jax.jit
def loop(buf, tgt, val):
    def body(i, carry):
        buf, tgt, val = carry
        # evolve tgt/val cheaply so the scatter can't be hoisted
        tgt = (tgt * 1103515245 + 12345) % NPIX
        val = val * 0.999 + 0.001
        buf = buf.at[:, tgt].add(val.T)
        return (buf, tgt, val)
    return jax.lax.fori_loop(0, 20, body, (buf, tgt, val))

buf = jnp.zeros((3, NPIX), jnp.float32)
out = jax.block_until_ready(loop(buf, tgt0, val0))
t0 = time.perf_counter()
out = jax.block_until_ready(loop(buf, tgt0, val0))
dt = (time.perf_counter() - t0) / 20
print(f"scatter-add in fori_loop: {dt*1e3:.3f} ms/iter")
