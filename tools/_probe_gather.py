"""Can Mosaic lower per-lane gathers in-kernel? Several formulations."""
import time, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
log = lambda *a: print(*a, flush=True)
jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones(8)))
log("[0] device alive")

P = 262144
B = 4096
TBL = 524288
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (P,), 0, TBL, dtype=jnp.int32)
tbl = jax.random.uniform(jax.random.PRNGKey(1), (TBL,))

def probe(name, kernel, extra_specs, extra_args, out_shape=None):
    try:
        f = pl.pallas_call(
            kernel, grid=(P // B,),
            in_specs=[pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM)]
                     + extra_specs,
            out_specs=pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
            out_shape=out_shape or jax.ShapeDtypeStruct((P,), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96*1024*1024),
        )
        jf = jax.jit(lambda ix, *a: f(ix, *a))
        out = jax.block_until_ready(jf(idx, *extra_args))
        t0 = time.perf_counter()
        for _ in range(5):
            out = jf(idx, *extra_args)
        jax.block_until_ready(out)
        ok = bool(jnp.allclose(out[:64], tbl[idx[:64]]))
        log(f"[{name}] OK {(time.perf_counter()-t0)/5*1e3:.3f} ms  correct={ok}")
    except Exception as e:
        log(f"[{name}] FAIL {type(e).__name__} {str(e)[:160]}")

# (a) jnp.take from full-VMEM table ref
def k_take(idx_ref, tbl_ref, o_ref):
    o_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)
probe("take_vmem", k_take,
      [pl.BlockSpec((TBL,), lambda i: (0,), memory_space=pltpu.VMEM)], [tbl])

# (b) plain indexing tbl[idx]
def k_index(idx_ref, tbl_ref, o_ref):
    o_ref[:] = tbl_ref[:][idx_ref[:]]
probe("index_vmem", k_index,
      [pl.BlockSpec((TBL,), lambda i: (0,), memory_space=pltpu.VMEM)], [tbl])
