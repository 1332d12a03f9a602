"""Correct 2-step take_along_axis gather: full-row fetch + lane select."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
log = lambda *a: print(*a, flush=True)
jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones(8)))
log("[0] device alive")

P = 262144
TBL = 524288
R = TBL // 128
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (P,), 0, TBL, dtype=jnp.int32)
tbl = jax.random.uniform(jax.random.PRNGKey(1), (TBL,))
tbl2 = tbl.reshape(R, 128)

for B in (1024, 4096):
    def kern(idx_ref, tbl_ref, o_ref):
        g = idx_ref[:]
        row = g // 128
        lane = g - row * 128
        t = tbl_ref[:]
        # out1[e, j] = t[row[e], j]  (each element's full 128-wide row)
        out1 = jnp.take_along_axis(
            t, jnp.broadcast_to(row[:, None], (B, 128)), axis=0)
        # value[e] = out1[e, lane[e]]
        val = jnp.take_along_axis(out1, lane[:, None], axis=1)
        o_ref[:] = val[:, 0]
    try:
        f = pl.pallas_call(
            kern, grid=(P // B,),
            in_specs=[pl.BlockSpec((B,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P,), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110*1024*1024),
        )
        jf = jax.jit(lambda ix: f(ix, tbl2))
        out = jax.block_until_ready(jf(idx))
        t0 = time.perf_counter()
        for _ in range(5):
            out = jf(idx)
        jax.block_until_ready(out)
        ok = bool(jnp.allclose(out[:4096], tbl[idx[:4096]]))
        log(f"[twostep B={B}] {(time.perf_counter()-t0)/5*1e3:.3f} ms correct={ok}")
    except Exception as e:
        log(f"[twostep B={B}] FAIL {type(e).__name__} {str(e)[:180]}")
