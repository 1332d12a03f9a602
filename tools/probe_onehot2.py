"""One-hot decode layout experiments.

Usage: python tools/probe_onehot2.py MODE N_OUT [D] [N_ROWS]
modes:
  plain    n_out flat outputs, values = t + k (no column extraction)
  col      n_out flat outputs from grow[:, k]  (current kernel's shape)
  colmat   ONE [n_out, D] output, rows from grow[:, k]
  tdot     ONE [n_out, D] output = dot(table_T_slice, onehot_T) directly
  tdotflat n_out flat outputs, rows sliced from the transposed dot
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main(mode, n_out, D=2048, n_rows=1536, p=8192):
    cols = 28
    window = 512

    def onehot_grow(idx_i, table_ref):
        b = idx_i.shape[0]
        grow = jnp.zeros((b, cols), jnp.float32)
        for w0 in range(0, n_rows, window):
            wlen = min(window, n_rows - w0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (b, wlen), 1)
            oh = (rows == (idx_i - w0)[:, None]).astype(jnp.float32)
            grow = grow + jnp.dot(oh, table_ref[w0:w0 + wlen, :],
                                  preferred_element_type=jnp.float32)
        return grow

    def onehot_grow_t(idx_i, tableT_ref):
        # tableT_ref: [cols, n_rows]; result [cols, B]
        b = idx_i.shape[0]
        growT = jnp.zeros((cols, b), jnp.float32)
        for w0 in range(0, n_rows, window):
            wlen = min(window, n_rows - w0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (wlen, b), 0)
            ohT = (rows == idx_i[None, :] - w0).astype(jnp.float32)
            growT = growT + jnp.dot(tableT_ref[:, w0:w0 + wlen], ohT,
                                    preferred_element_type=jnp.float32)
        return growT

    if mode in ("plain", "col", "tdotflat"):
        def kernel(t_ref, idx_ref, table_ref, *out_refs):
            idx_i = idx_ref[:].astype(jnp.int32)
            if mode == "plain":
                for k, ref in enumerate(out_refs):
                    ref[:] = t_ref[:] + float(k)
            elif mode == "col":
                grow = onehot_grow(idx_i, table_ref)
                for k, ref in enumerate(out_refs):
                    ref[:] = grow[:, k % cols] + t_ref[:]
            else:
                growT = onehot_grow_t(idx_i, table_ref)
                for k, ref in enumerate(out_refs):
                    ref[:] = growT[k % cols, :] + t_ref[:]
        out_specs = tuple(
            [pl.BlockSpec((D,), lambda i: (i,), memory_space=pltpu.VMEM)]
            * n_out)
        out_shape = tuple(jax.ShapeDtypeStruct((p,), jnp.float32)
                          for _ in range(n_out))
    else:
        def kernel(t_ref, idx_ref, table_ref, out_ref):
            idx_i = idx_ref[:].astype(jnp.int32)
            if mode == "colmat":
                grow = onehot_grow(idx_i, table_ref)
                for k in range(n_out):
                    out_ref[k, :] = grow[:, k % cols] + t_ref[:]
            else:  # tdot
                growT = onehot_grow_t(idx_i, table_ref)
                for k in range(n_out):
                    out_ref[k, :] = growT[k % cols, :] + t_ref[:]
        out_specs = pl.BlockSpec((n_out, D), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_out, p), jnp.float32)

    table_shape = ((cols, n_rows) if mode in ("tdot", "tdotflat")
                   else (n_rows, cols))
    full = pl.BlockSpec(table_shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((D,), lambda i: (i,), memory_space=pltpu.VMEM)
    t = jnp.ones((p,), jnp.float32)
    idx = jnp.zeros((p,), jnp.float32)
    table = jnp.ones(table_shape, jnp.float32)
    fn = jax.jit(lambda *a: pl.pallas_call(
        kernel, grid=(p // D,),
        in_specs=[lane, lane, full],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*a))
    t0 = time.perf_counter()
    fn.lower(t, idx, table).compile()
    print(f"COMPILE OK mode={mode} n_out={n_out} D={D} n_rows={n_rows} "
          f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], *[int(x) for x in sys.argv[2:]])
