"""Image-quality metrics: PSNR and SSIM, pure JAX.

Used to quantify the denoiser against high-spp references (the evidence
backing the reference's OIDN sample-reduction claim,
/root/reference/README.md:556-561) and for golden-image regression
checks. Both operate on linear-RGB [H, W, 3] float arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def psnr(img, ref, *, peak: float | None = None) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB.

    peak defaults to the reference image's max (HDR-friendly); pass 1.0
    for tone-mapped [0, 1] images.
    """
    img = jnp.asarray(img, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    if peak is None:
        peak = jnp.maximum(jnp.max(ref), 1e-8)
    mse = jnp.mean((img - ref) ** 2)
    return 10.0 * jnp.log10(peak * peak / jnp.maximum(mse, 1e-20))


def _box_filter(x, radius: int):
    """Mean filter with clamp-to-edge padding; x is [H, W, C]."""
    k = 2 * radius + 1
    pad = [(radius, radius), (radius, radius), (0, 0)]
    xp = jnp.pad(x, pad, mode="edge")
    # Separable running mean via cumulative sums.
    out = xp
    for axis in (0, 1):
        c = jnp.cumsum(out, axis=axis)
        zero = jnp.zeros_like(jnp.take(c, jnp.arange(1), axis=axis))
        c = jnp.concatenate([zero, c], axis=axis)
        hi = jnp.take(c, jnp.arange(k, c.shape[axis]), axis=axis)
        lo = jnp.take(c, jnp.arange(0, c.shape[axis] - k), axis=axis)
        out = (hi - lo) / k
    return out


def ssim(img, ref, *, peak: float | None = None, radius: int = 3,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean structural similarity (Wang et al. 2004), box window.

    Returns a scalar in [-1, 1]; 1.0 = identical.
    """
    x = jnp.asarray(img, jnp.float32)
    y = jnp.asarray(ref, jnp.float32)
    if peak is None:
        peak = jnp.maximum(jnp.max(y), 1e-8)
    c1 = (k1 * peak) ** 2
    c2 = (k2 * peak) ** 2
    mu_x = _box_filter(x, radius)
    mu_y = _box_filter(y, radius)
    xx = _box_filter(x * x, radius) - mu_x * mu_x
    yy = _box_filter(y * y, radius) - mu_y * mu_y
    xy = _box_filter(x * y, radius) - mu_x * mu_y
    num = (2.0 * mu_x * mu_y + c1) * (2.0 * xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (xx + yy + c2)
    return jnp.mean(num / den)
