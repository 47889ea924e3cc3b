from ..utils.jaxcfg import configure_compilation_cache

# Opt-in persistent compile cache (HTPU_COMPILE_CACHE=<dir>) must attach
# before the first jit in any compute module below.
configure_compilation_cache()

from . import decode, encode, histogram, tables  # noqa: E402

# Pallas modules load eagerly too: several jitted pipelines import them
# lazily in their bodies, and a module's FIRST import during tracing
# would turn any module-level array constant into a leaked tracer.
from . import (  # noqa: E402
    pallas_decode,
    pallas_encode,
    pallas_gather,
    pallas_hist,
)

__all__ = [
    "decode", "encode", "histogram", "tables",
    "pallas_decode", "pallas_encode", "pallas_gather", "pallas_hist",
]
