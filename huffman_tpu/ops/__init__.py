from ..utils.jaxcfg import configure_compilation_cache

# Opt-in persistent compile cache (HTPU_COMPILE_CACHE=<dir>) must attach
# before the first jit in any compute module below.
configure_compilation_cache()

from . import decode, encode, histogram, tables  # noqa: E402

__all__ = ["decode", "encode", "histogram", "tables"]
