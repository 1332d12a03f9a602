"""Counter-based RNG sampling primitives.

The reference uses one process-wide Mersenne-Twister shared (racily) across
all render threads (/root/reference/common.hpp:29-34). The TPU-native design
replaces it with JAX threefry counter-based keys derived from
(frame, pixel, sample, bounce) so every sample is deterministic,
shard-invariant, and replayable — required for golden-image tests, gradient
checks, and N-device == 1-device invariance.

Distributions match the reference's samplers in law (not in draw order):
 - unit sphere vectors  (vec3.hpp:184-191, rejection)  -> gaussian-normalize
 - unit disk points     (vec3.hpp:174-181, rejection)  -> polar warp
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def per_lane_keys(base_key: jax.Array, lane_ids: jax.Array) -> jax.Array:
    """Derive one key per lane by folding in a *global* lane id.

    This is the shard-invariance keystone: a pixel's randomness depends only
    on (base_key, pixel_id), never on batch position, so a sharded render is
    bit-identical to a single-device render.
    """
    return jax.vmap(lambda i: jax.random.fold_in(base_key, i))(lane_ids)


def fold_each(keys: jax.Array, data) -> jax.Array:
    """fold_in applied per-lane; `data` is a scalar or [n] array."""
    if jnp.ndim(data) == 0:
        return jax.vmap(lambda k: jax.random.fold_in(k, data))(keys)
    return jax.vmap(jax.random.fold_in)(keys, data)


def split_each(keys: jax.Array, num: int) -> tuple[jax.Array, ...]:
    """Per-lane key split: [n,2] -> num arrays of [n,2]."""
    out = jax.vmap(lambda k: jax.random.split(k, num))(keys)
    return tuple(out[:, i] for i in range(num))


def uniform_each(keys: jax.Array, lo=0.0, hi=1.0) -> jax.Array:
    """One uniform scalar per lane; [n]."""
    return jax.vmap(
        lambda k: jax.random.uniform(k, (), minval=lo, maxval=hi,
                                     dtype=jnp.float32)
    )(keys)


def unit_vector_each(keys: jax.Array) -> jax.Array:
    """One uniform unit sphere vector per lane; [n, 3]."""
    g = jax.vmap(lambda k: jax.random.normal(k, (3,), dtype=jnp.float32))(keys)
    norm = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
    return g / jnp.maximum(norm, 1e-12)


def in_unit_disk_each(keys: jax.Array) -> jax.Array:
    """One uniform unit-disk point per lane; [n, 3] (z = 0)."""
    u = jax.vmap(lambda k: jax.random.uniform(k, (2,), dtype=jnp.float32))(keys)
    r = jnp.sqrt(u[:, 0])
    theta = 2.0 * jnp.pi * u[:, 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta),
                      jnp.zeros_like(r)], axis=-1)


def square_jitter_each(keys: jax.Array) -> jax.Array:
    """One [-0.5, 0.5]^2 jitter per lane; [n, 2] (camera.hpp:817-819)."""
    return jax.vmap(
        lambda k: jax.random.uniform(k, (2,), minval=-0.5, maxval=0.5,
                                     dtype=jnp.float32)
    )(keys)


def uniform(key, shape=(), lo=0.0, hi=1.0):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi, dtype=jnp.float32)


def unit_vector(key, shape=()):
    """Uniform direction on the unit sphere; shape [..., 3].

    Matches the law of the reference's rejection sampler (vec3.hpp:184-191)
    via normalized gaussians — branchless and TPU-friendly.
    """
    g = jax.random.normal(key, tuple(shape) + (3,), dtype=jnp.float32)
    norm = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
    return g / jnp.maximum(norm, 1e-12)


def in_unit_disk(key, shape=()):
    """Uniform point in the unit disk (z=0); shape [..., 3].

    Same law as the reference's rejection sampler (vec3.hpp:174-181)
    via the polar square-root warp.
    """
    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(uniform(k1, shape))
    theta = uniform(k2, shape, 0.0, 2.0 * jnp.pi)
    zeros = jnp.zeros_like(r)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), zeros], axis=-1)


def square_jitter(key, shape=()):
    """Sub-pixel jitter in [-0.5, 0.5]^2 (camera.hpp:817-819); shape [..., 2]."""
    return jax.random.uniform(
        key, tuple(shape) + (2,), minval=-0.5, maxval=0.5, dtype=jnp.float32
    )
