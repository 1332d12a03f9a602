"""Gather on loaded values via jnp.take / take_along_axis inside kernel."""
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def mk(kfn, outshape, *ins):
    return pl.pallas_call(
        kfn, out_shape=outshape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ins],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*ins)

tab2 = jnp.arange(4096*128, dtype=jnp.float32).reshape(4096, 128)
idx = jnp.asarray(np.random.randint(0, 4096, (512,)), jnp.int32)

def k_take(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)
try:
    out = mk(k_take, jax.ShapeDtypeStruct((512, 128), jnp.float32), tab2, idx)
    print("take rows [4096,128]: OK, correct:", bool(jnp.allclose(out, tab2[idx])))
except Exception as e:
    print("take rows: FAIL:", str(e)[:200])

# take along lanes (within-row gather)
tab3 = jnp.arange(512*128, dtype=jnp.float32).reshape(512, 128)
lidx = jnp.asarray(np.random.randint(0, 128, (512, 128)), jnp.int32)
def k_tal(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
try:
    out = mk(k_tal, jax.ShapeDtypeStruct((512, 128), jnp.float32), tab3, lidx)
    print("take_along lanes: OK, correct:", bool(jnp.allclose(out, jnp.take_along_axis(tab3, lidx, axis=1))))
except Exception as e:
    print("take_along lanes: FAIL:", str(e)[:200])

# take along sublanes (axis 0)
sidx = jnp.asarray(np.random.randint(0, 512, (512, 128)), jnp.int32)
def k_tas(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
try:
    out = mk(k_tas, jax.ShapeDtypeStruct((512, 128), jnp.float32), tab3, sidx)
    print("take_along sublanes: OK, correct:", bool(jnp.allclose(out, jnp.take_along_axis(tab3, sidx, axis=0))))
except Exception as e:
    print("take_along sublanes: FAIL:", str(e)[:200])
