"""Batched 3-vector math on trailing-dim-3 arrays.

TPU-native equivalent of the reference's scalar `vec3` class
(/root/reference/vec3.hpp). Instead of a vec3 object graph we operate on
jnp arrays of shape [..., 3] so every op is a fused VPU-wide map under XLA.
All functions are pure and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

# Guard used by the reference's unit_vector (vec3.hpp:165-171).
_UNIT_EPS = 1e-8


def dot(u, v, keepdims: bool = False):
    """Batched dot product over the trailing axis (vec3.hpp:154-156)."""
    return jnp.sum(u * v, axis=-1, keepdims=keepdims)


def cross(u, v):
    """Batched cross product (vec3.hpp:158-162)."""
    return jnp.cross(u, v)


def length_squared(v, keepdims: bool = False):
    return jnp.sum(v * v, axis=-1, keepdims=keepdims)


def length(v, keepdims: bool = False):
    return jnp.sqrt(length_squared(v, keepdims=keepdims))


def normalize(v):
    """Safe unit vector: returns 0 for (near-)zero input (vec3.hpp:165-171)."""
    len_ = length(v, keepdims=True)
    return jnp.where(len_ < _UNIT_EPS, 0.0, v / jnp.maximum(len_, _UNIT_EPS))


def near_zero(v):
    """True where all components are tiny (vec3.hpp near_zero, RTiOW semantics)."""
    return jnp.all(jnp.abs(v) < 1e-8, axis=-1)


def reflect(v, n):
    """Mirror reflection about normal n (vec3.hpp:204-206)."""
    return v - 2.0 * dot(v, n, keepdims=True) * n


def refract(uv, n, etai_over_etat):
    """Snell refraction; `uv` must be unit length (vec3.hpp:209-214).

    etai_over_etat broadcasts against the batch ([...] or [..., 1]).
    """
    if jnp.ndim(etai_over_etat) and etai_over_etat.shape[-1:] != (1,):
        etai_over_etat = etai_over_etat[..., None]
    cos_theta = jnp.minimum(dot(-uv, n, keepdims=True), 1.0)
    r_out_perp = etai_over_etat * (uv + cos_theta * n)
    r_out_parallel = -jnp.sqrt(
        jnp.abs(1.0 - length_squared(r_out_perp, keepdims=True))
    ) * n
    return r_out_perp + r_out_parallel


def luminance(c):
    """Rec.709 luminance (vec3.hpp:106-108)."""
    return c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722


def direction_from_spherical(elevation_deg, azimuth_deg):
    """Spherical (degrees) -> unit direction, y-up (common.hpp:94-103)."""
    phi = jnp.deg2rad(azimuth_deg)
    theta = jnp.deg2rad(90.0 - elevation_deg)
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi)], axis=-1
    )


def smoothstep(edge0, edge1, x):
    """Hermite smoothstep (common.hpp:87-91)."""
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)
