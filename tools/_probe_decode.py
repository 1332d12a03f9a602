"""Is in-kernel elementwise math on [512] 1-D values 8x slower than
(4,128) 2-D? Same op chain, both shapes."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
log = lambda *a: print(*a, flush=True)
jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones(8)))
log("[0] device alive")

P = 262144
NOPS = 200

def chain(x, y, z):
    for k in range(NOPS):
        x = x * y + z
        y = jnp.maximum(y * 0.5 + x, z)
        z = jnp.where(x > y, z + x, z - y)
    return x + y + z

def probe(name, B, nd):
    def kern(a_ref, b_ref, c_ref, o_ref):
        a, bb, c = a_ref[:], b_ref[:], c_ref[:]
        if nd == 2:
            a = jnp.reshape(a, (B // 128, 128))
            bb = jnp.reshape(bb, (B // 128, 128))
            c = jnp.reshape(c, (B // 128, 128))
        r = chain(a, bb, c)
        if nd == 2:
            r = jnp.reshape(r, (B,))
        o_ref[:] = r
    lane = pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM)
    f = pl.pallas_call(kern, grid=(P // B,), in_specs=[lane] * 3,
                       out_specs=lane,
                       out_shape=jax.ShapeDtypeStruct((P,), jnp.float32))
    x = jnp.linspace(0, 1, P)
    jf = jax.jit(lambda a: f(a, a * 0.5, a * 0.25))
    out = jax.block_until_ready(jf(x))
    t0 = time.perf_counter()
    for _ in range(5):
        out = jf(x)
    jax.block_until_ready(out)
    log(f"[{name}] {(time.perf_counter()-t0)/5*1e3:.3f} ms")

for name, B, nd in (("B1024_1d", 1024, 1), ("B1024_2d", 1024, 2),
                    ("B4096_1d", 4096, 1), ("B4096_2d", 4096, 2)):
    try:
        probe(name, B, nd)
    except Exception as e:
        log(f"[{name}] FAIL {type(e).__name__} {str(e)[:120]}")
