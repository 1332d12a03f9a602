from . import colorspace, constants, rng, vecmath

__all__ = ["colorspace", "constants", "rng", "vecmath"]
