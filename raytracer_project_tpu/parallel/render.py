"""Multi-chip rendering: pixel-tile sharding over a jax device mesh.

TPU-native replacement for the reference's row-block std::thread fan-out
(/root/reference/camera.hpp:556-573): the image's pixel axis is sharded over
a 1-D `tiles` mesh axis with `jax.shard_map`; the scene/BVH/materials are
replicated into every chip's HBM (the scenes are small — the reference
likewise shares the scene across threads, §SURVEY 5.8).

Because all randomness is keyed on (base_key, global pixel id, sample)
(see core/rng.py), an N-device render is bit-identical to the 1-device
render — the shard-invariance property the test suite asserts.

Multi-host: the same shard_map runs under `jax.distributed.initialize()`
with a (host, chip) mesh; tiles ride ICI within a slice and only the final
gather for preview/export crosses to host 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import integrator

TILE_AXIS = "tiles"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D device mesh over the pixel-tile axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=(TILE_AXIS,))


def _padded_pixel_ids(n_pixels: int, n_shards: int) -> jnp.ndarray:
    """Global pixel ids padded to a multiple of the shard count.

    Padding lanes re-render pixel (n-1); their results are dropped on
    unpad. Wasted lanes <= n_shards - 1.
    """
    padded = -(-n_pixels // n_shards) * n_shards
    ids = jnp.minimum(jnp.arange(padded, dtype=jnp.int32), n_pixels - 1)
    return ids


def render_sharded(scene, cam, env, key, config: integrator.RenderConfig,
                   mesh: Mesh) -> dict:
    """Full render with pixels sharded across `mesh`; returns [H, W, 3]
    buffer dict identical to integrator.render()."""
    n_shards = mesh.devices.size
    n = config.n_pixels
    ids = _padded_pixel_ids(n, n_shards)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(TILE_AXIS)),
        out_specs=P(TILE_AXIS),
        # The integrator creates fresh while_loop carries (zeros/ones) that
        # the varying-manual-axes analysis flags against varying bodies;
        # functionally every lane is independent, so skip the check.
        check_vma=False,
    )
    def shard_fn(scene_, cam_, env_, key_, ids_local):
        return integrator.accumulate_samples(
            scene_, cam_, env_, key_, config, ids_local
        )

    acc = shard_fn(scene, cam, env, key, ids)
    acc = jax.tree.map(lambda x: x[:n], acc)
    return integrator.finalize_buffers(acc, config)


def render_sharded_jit(config: integrator.RenderConfig, mesh: Mesh):
    """jit-compiled sharded renderer closed over static config + mesh."""
    fn = functools.partial(render_sharded, config=config, mesh=mesh)
    return jax.jit(fn)
