"""Kernel experiments: precision, cull on/off, gather support."""
import time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 1) per-lane gather support test
def gather_kernel(tab_ref, idx_ref, out_ref):
    idx = idx_ref[:]                    # [B] int32
    out_ref[:] = tab_ref[idx]           # per-lane row gather?

def try_gather():
    tab = jnp.arange(4096*8, dtype=jnp.float32).reshape(4096, 8)
    idx = jnp.asarray(np.random.randint(0, 4096, (512,)), jnp.int32)
    try:
        out = pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((512, 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        ref = tab[idx]
        print("gather2d: OK, correct:", bool(jnp.allclose(out, ref)))
    except Exception as e:
        print("gather2d: FAIL:", str(e)[:300])

def gather1d_kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = tab_ref[idx_ref[:]]

def try_gather1d():
    tab = jnp.arange(4096, dtype=jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 4096, (512,)), jnp.int32)
    try:
        out = pl.pallas_call(
            gather1d_kernel,
            out_shape=jax.ShapeDtypeStruct((512,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        ref = tab[idx]
        print("gather1d: OK, correct:", bool(jnp.allclose(out, ref)))
    except Exception as e:
        print("gather1d: FAIL:", str(e)[:300])

try_gather()
try_gather1d()
