from . import reference_format

__all__ = ["reference_format"]
