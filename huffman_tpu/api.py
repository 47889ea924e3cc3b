"""High-level compress/decompress API.

Two container formats:

* ``compress_reference`` / ``decompress_reference`` — the reference-exact
  ``.compressed`` single-stream container for interop with the CUDA
  reference's ``extract``/``archive`` binaries.
* ``compress`` / ``decompress`` — the native block container, designed for
  parallel TPU decode and multi-chip scale-out.

Each call picks the best available backend: TPU (JAX pipeline), native C++
host runtime, or pure NumPy, in that order of preference, overridable via
``backend=``.
"""

from __future__ import annotations

from .container import reference_format


def compress_reference(data: bytes, backend: str | None = None) -> bytes:
    """Compress to the reference ``.compressed`` container format."""
    if backend in (None, "native"):
        try:
            from .runtime import native

            if native.available():
                return native.compress_reference(data)
        except ImportError:
            pass
    return reference_format.compress(data)


def decompress_reference(blob: bytes, backend: str | None = None) -> bytes:
    """Decompress a reference ``.compressed`` container."""
    if backend in (None, "native"):
        try:
            from .runtime import native

            if native.available():
                return native.decompress_reference(blob)
        except ImportError:
            pass
    return reference_format.decompress(blob)


def compress(data: bytes, backend: str | None = None, **kwargs) -> bytes:
    """Compress to the native block container (TPU-parallel decode)."""
    from .container import block_format

    return block_format.compress(data, backend=backend, **kwargs)


def decompress(blob: bytes, backend: str | None = None, **kwargs) -> bytes:
    """Decompress a native block container."""
    from .container import block_format

    return block_format.decompress(blob, backend=backend, **kwargs)
