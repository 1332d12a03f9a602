"""Minimal one-hot decode compile probe.

Usage: python tools/probe_onehot.py D_BLOCK WINDOW N_ROWS N_OUT [P]
e.g.   python tools/probe_onehot.py 2048 512 1536 24
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main(D, window, n_rows, n_out, p=8192):
    cols = 28

    def kernel(t_ref, idx_ref, table_ref, *out_refs):
        idx_i = idx_ref[:].astype(jnp.int32)
        b = idx_i.shape[0]
        if n_rows <= window:
            rows = jax.lax.broadcasted_iota(jnp.int32, (b, n_rows), 1)
            onehot = (rows == idx_i[:, None]).astype(jnp.float32)
            grow = jnp.dot(onehot, table_ref[:],
                           preferred_element_type=jnp.float32)
        else:
            grow = jnp.zeros((b, cols), jnp.float32)
            for w0 in range(0, n_rows, window):
                wlen = min(window, n_rows - w0)
                rows = jax.lax.broadcasted_iota(jnp.int32, (b, wlen), 1)
                onehot = (rows == (idx_i - w0)[:, None]).astype(jnp.float32)
                grow = grow + jnp.dot(onehot, table_ref[w0:w0 + wlen, :],
                                      preferred_element_type=jnp.float32)
        for k, ref in enumerate(out_refs):
            ref[:] = grow[:, k % cols] + t_ref[:]

    full = pl.BlockSpec((n_rows, cols), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((D,), lambda i: (i,), memory_space=pltpu.VMEM)
    t = jnp.ones((p,), jnp.float32)
    idx = jnp.zeros((p,), jnp.float32)
    table = jnp.ones((n_rows, cols), jnp.float32)
    fn = jax.jit(lambda *a: pl.pallas_call(
        kernel, grid=(p // D,),
        in_specs=[lane, lane, full],
        out_specs=tuple([lane] * n_out),
        out_shape=tuple(jax.ShapeDtypeStruct((p,), jnp.float32)
                        for _ in range(n_out)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*a))
    t0 = time.perf_counter()
    fn.lower(t, idx, table).compile()
    print(f"COMPILE OK D={D} window={window} n_rows={n_rows} n_out={n_out} "
          f"p={p} {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main(*[int(x) for x in sys.argv[1:]])
