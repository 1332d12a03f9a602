"""Differentiable rendering & inverse-rendering (SURVEY §7 / stage S7).

The scene, camera, and environment are pytrees of jnp leaves, and the whole
forward renderer is pure JAX — so `jax.grad` of any image loss w.r.t. any
leaf (material albedo, emission, sun direction, HDR texels, sphere centers,
camera frame) is available directly. This package adds the ergonomics:
dotted-path parameter selection, loss builders, and an optax fit loop.

Gradient semantics (the "detached sampling" estimator): discrete choices —
closest-hit selection, BVH branch decisions, Russian-roulette kills,
dielectric reflect-vs-refract draws — are piecewise-constant in the
parameters, so their derivative contribution (visibility/silhouette terms)
is ignored; gradients flow through the *continuous* shading, geometry-at-
fixed-visibility, and environment math. This matches BASELINE.json's
allowance and is the standard first-order differentiable-path-tracing
setup.
"""

from .inverse import (
    RenderState,
    apply_params,
    extract_params,
    fit,
    image_loss,
    render_beauty,
    tree_get,
    tree_set,
)

__all__ = [
    "RenderState",
    "apply_params",
    "extract_params",
    "fit",
    "image_loss",
    "render_beauty",
    "tree_get",
    "tree_set",
]
