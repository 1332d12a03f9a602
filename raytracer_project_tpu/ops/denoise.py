"""AI-denoise stage: edge-avoiding à-trous wavelet filter (+ hooks for a
learned model).

Replaces the reference's Intel OIDN integration
(/root/reference/camera.hpp:581-699). The input contract is OIDN's
(camera.hpp:640-648): noisy beauty + albedo + normal guide buffers. The
classical à-trous filter (Dammertz et al. 2010) runs fully on-device and is
differentiable; `denoise()` dispatches to a learned JAX model when one is
provided (SURVEY §7 decision 6 ships the classical fallback first).

NaN scrubbing before filtering mirrors camera.hpp:601-606.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import colorspace, vecmath


def _shift(img, dy: int, dx: int):
    """Clamp-to-edge shifted view of [H, W, C]."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


# 5-tap B3-spline kernel of the à-trous scheme.
_KERNEL_1D = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def atrous_denoise(beauty, albedo=None, normal=None, *, iterations: int = 3,
                   sigma_color: float = 0.35, sigma_albedo: float = 0.25,
                   sigma_normal: float = 0.35):
    """Edge-avoiding à-trous wavelet denoise of [H, W, 3] beauty.

    albedo/normal guides (the OIDN auxiliary buffers, camera.hpp:640-648)
    stop the blur at material and geometric edges; either may be None.
    """
    c = colorspace.scrub_non_finite(beauty)
    guides = []
    if albedo is not None:
        guides.append((colorspace.scrub_non_finite(albedo), sigma_albedo))
    if normal is not None:
        guides.append((colorspace.scrub_non_finite(normal), sigma_normal))

    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(c)
        wacc = jnp.zeros(c.shape[:2], c.dtype)
        for iy, wy in enumerate(_KERNEL_1D):
            for ix, wx in enumerate(_KERNEL_1D):
                dy = (iy - 2) * step
                dx = (ix - 2) * step
                w = wy * wx

                c_s = _shift(c, dy, dx)
                # Range weight on color distance.
                dist2 = jnp.sum((c - c_s) ** 2, axis=-1)
                wt = w * jnp.exp(-dist2 / (sigma_color ** 2))
                # Guide weights.
                for g, sg in guides:
                    g_s = _shift(g, dy, dx)
                    gd2 = jnp.sum((g - g_s) ** 2, axis=-1)
                    wt = wt * jnp.exp(-gd2 / (sg ** 2))

                acc = acc + c_s * wt[..., None]
                wacc = wacc + wt
        c = acc / jnp.maximum(wacc, 1e-12)[..., None]
    return c


def denoise(beauty, albedo=None, normal=None, model=None, **kwargs):
    """Denoise dispatch: learned model if provided, else à-trous.

    `model` is any callable (beauty, albedo, normal) -> denoised — the
    learned-denoiser hook (e.g. models/denoiser_unet.py)."""
    if model is not None:
        return model(beauty, albedo, normal)
    return atrous_denoise(beauty, albedo, normal, **kwargs)
