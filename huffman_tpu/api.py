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
    if backend == "jax":
        return reference_format.compress(data, device_payload=True)
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


def compress(
    data: bytes,
    backend: str | None = None,
    n_shards: int | None = None,
    **kwargs,
) -> bytes:
    """Compress to the native block container (TPU-parallel decode).
    ``n_shards`` > 1 produces a sharded HTPX archive (scale-out unit)."""
    if n_shards and n_shards > 1:
        from .container import sharded

        return sharded.compress(data, n_shards=n_shards, backend=backend, **kwargs)
    from .container import block_format

    return block_format.compress(data, backend=backend, **kwargs)


def decompress(blob: bytes, backend: str | None = None, **kwargs) -> bytes:
    """Decompress a native container (HTPU block, HTPX sharded archive, or
    HTPS stream — detected by magic)."""
    from .container import sharded, streaming

    if len(blob) >= 4:
        magic = int.from_bytes(blob[0:4], "little")
        if magic == sharded.MAGIC:
            return sharded.decompress(blob, backend=backend)
        if magic == streaming.MAGIC:
            return streaming.decompress_bytes(blob, backend=backend)
    from .container import block_format

    return block_format.decompress(blob, backend=backend, **kwargs)
