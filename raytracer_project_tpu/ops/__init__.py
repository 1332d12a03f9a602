from . import integrator, intersect, shade

__all__ = ["integrator", "intersect", "shade"]
