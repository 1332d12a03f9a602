"""raytracer_project_tpu — a TPU-native differentiable Monte Carlo path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference C++20 engine "Zenith" (jarek1992/raytracer_project): progressive
wavefront path tracing, BVH acceleration, four PBR material families with
textures and bump mapping, three environment-lighting modes, volumetric
media, AOV render passes, a differentiable HDR post-process chain, and
pixel-sharded multi-chip scaling over a jax device mesh.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt out: RAYTRACER_TPU_NO_CACHE=1).

    Full-render programs are large; caching compiles across processes takes
    repeat startup from minutes to seconds."""
    if _os.environ.get("RAYTRACER_TPU_NO_CACHE"):
        return
    import jax

    cache_dir = _os.environ.get(
        "RAYTRACER_TPU_CACHE_DIR", _os.path.expanduser("~/.cache/raytracer_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags: run uncached
        pass


_enable_compilation_cache()
