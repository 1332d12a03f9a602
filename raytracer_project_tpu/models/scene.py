"""Scene container + builder: the differentiable scene pytree.

Replaces the reference's mutable shared_ptr world (hittable_list.hpp,
scene_management.hpp) with an immutable pytree of SoA arrays. Because the
scene is a pytree of jnp leaves, it IS the parameter vector for inverse
rendering — gradients w.r.t. sphere centers, material albedos, sun
direction, etc. fall out of jax.grad directly.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax

from .environment import Environment, make_environment
from .geometry import GeometryBuilder, SphereTable, TriangleTable
from .materials import MaterialLibrary, MaterialTable
from .textures import TextureBank, TextureBankBuilder


class Scene(NamedTuple):
    """Frozen device-ready scene (a pytree)."""

    spheres: SphereTable
    triangles: TriangleTable
    materials: MaterialTable
    textures: TextureBank
    bvh: Any = None  # accel.FlatBVH once built (ops/bvh.py); None = brute force

    @property
    def primitive_count(self) -> int:
        return self.spheres.count + self.triangles.count


class SceneBuilder:
    """Host-side scene assembly mirroring scene_management.hpp workflows.

    Usage:
        b = SceneBuilder()
        red = b.materials.lambertian("red", (0.8, 0.1, 0.1))
        b.geometry.add_sphere((0, 1, 0), 1.0, red)
        scene = b.build()
    """

    def __init__(self):
        self.geometry = GeometryBuilder()
        self.materials = MaterialLibrary()
        self.textures = TextureBankBuilder()

    def build(self, with_bvh: bool = False) -> Scene:
        spheres, triangles = self.geometry.pack()
        scene = Scene(
            spheres=spheres,
            triangles=triangles,
            materials=self.materials.pack(),
            textures=self.textures.pack(),
            bvh=None,
        )
        if with_bvh:
            from ..ops import bvh as bvh_mod

            scene = scene._replace(bvh=bvh_mod.build_bvh(scene))
        return scene
