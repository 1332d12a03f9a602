from . import camera, environment, geometry, materials, scene, textures

__all__ = ["camera", "environment", "geometry", "materials", "scene", "textures"]
