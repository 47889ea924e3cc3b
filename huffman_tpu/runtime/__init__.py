"""Native host runtime (C++ via ctypes)."""

from . import native  # noqa: F401
