from . import benchmark, timing

__all__ = ["benchmark", "timing"]
