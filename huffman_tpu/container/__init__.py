"""Container formats: reference interop, native HTPU blocks, HTPX sharded
archives, HTPS streams.

``detect(blob)`` is the single source of truth for container-kind dispatch:
returns "htpu", "htpx", "htps", or "reference" (the reference format has no
magic field — it is the fallback).
"""

from . import reference_format

__all__ = ["reference_format", "detect"]


def detect(blob: bytes) -> str:
    from ..constants import NATIVE_MAGIC
    from .sharded import MAGIC as HTPX_MAGIC
    from .streaming import MAGIC as HTPS_MAGIC

    if len(blob) >= 4:
        magic = int.from_bytes(blob[0:4], "little")
        if magic == NATIVE_MAGIC:
            return "htpu"
        if magic == HTPX_MAGIC:
            return "htpx"
        if magic == HTPS_MAGIC:
            return "htps"
    return "reference"
