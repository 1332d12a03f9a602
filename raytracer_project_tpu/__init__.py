"""raytracer_project_tpu — a TPU-native differentiable Monte Carlo path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference C++20 engine "Zenith" (jarek1992/raytracer_project): progressive
wavefront path tracing, BVH acceleration, four PBR material families with
textures and bump mapping, three environment-lighting modes, volumetric
media, AOV render passes, a differentiable HDR post-process chain, and
pixel-sharded multi-chip scaling over a jax device mesh.
"""

__version__ = "0.1.0"
