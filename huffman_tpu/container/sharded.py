"""Sharded archive ("HTPX"): the scale-out container.

The reference is a single-process, single-GPU tool; the north star requires
data-parallel scale-out over chips and hosts (SURVEY.md §2 parallelism
accounting). This format makes the unit of distribution explicit: the input
splits into pair-aligned byte shards, each shard compresses to an inner
HTPU container (independently decodable -> embarrassingly parallel across
processes), and a thin outer index stitches them together.

    offset  size  field
    0       4     magic "HTPX"
    4       1     version (1)
    5       1     codebook mode (0 = per-shard, 1 = global)
    6       2     reserved
    8       4     shard count (u32)
    12      8     original size (u64)
    [global mode only]
    .       4     codebook blob size (u32)
    .       .     codebook: u32[32] counts-per-length ++ u16[n] symbols
    then    8*n   inner container byte lengths (u64[n])
    ...           inner HTPU containers, back to back

Codebook modes:
* per-shard — each shard builds its own codebook; zero coordination
  (pure DP, the multi-host default when hosts stream disjoint data).
* global — ONE codebook from the full-corpus histogram, stored once at the
  archive level (inner containers set the external-codebook flag and carry
  no table); on a mesh the histogram is psum'd over ICI/DCN
  (parallel/pipeline.distributed_histogram) so every shard encodes with
  identical tables. Better ratio on homogeneous data, and the decode tables
  upload to the device once for the whole archive.

Multi-host usage: `jax.distributed.initialize()`; each process compresses
its local shards with the (optionally psum-built) codebook and process 0
concatenates — shard lengths are the only cross-host metadata
(an all-gather of one u64 per shard).
"""

from __future__ import annotations

import numpy as np

from . import block_format
from .reference_format import bytes_to_symbols, histogram_host

MAGIC = 0x48545058  # "HTPX"
_HDR = 20


def _shard_ranges(n: int, n_shards: int) -> list[tuple[int, int]]:
    """Pair-aligned contiguous byte ranges covering [0, n)."""
    per = (n // n_shards + 1) & ~1  # even split, pair-aligned
    out = []
    start = 0
    for _ in range(n_shards):
        end = min(start + per, n)
        out.append((start, end))
        start = end
    out[-1] = (out[-1][0], n)
    return out


def compress(
    data: bytes,
    n_shards: int = 1,
    codebook_mode: str = "global",
    mesh=None,
    backend: str | None = None,
    **kwargs,
) -> bytes:
    """Compress to a sharded HTPX archive.

    ``mesh`` (optional jax Mesh): with codebook_mode="global", the corpus
    histogram is computed with a psum over the mesh instead of on the host
    — the distributed path; shards themselves always encode independently.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    ranges = _shard_ranges(len(data), n_shards)

    codebook = None
    mode_flag = 0
    if codebook_mode == "global":
        mode_flag = 1
        symbols, _, _ = bytes_to_symbols(data)
        if mesh is not None:
            import jax.numpy as jnp

            from ..parallel.pipeline import distributed_histogram

            hist = np.asarray(
                distributed_histogram(mesh, jnp.asarray(symbols.astype(np.int32)))
            ).astype(np.int64)
        else:
            hist = histogram_host(symbols)
        # The last shard may own an odd tail byte; it is stored raw and
        # never histogrammed, so the global histogram is exact. Build with
        # the container's single-sourced constructor so the archive-level
        # codebook honors the same depth limit (decode-kernel cost is
        # linear in depth) and matches what a device-side build would emit.
        from ..constants import DEFAULT_MAX_CODE_LEN

        codebook = block_format._host_codebook(
            hist, kwargs.get("max_code_len", DEFAULT_MAX_CODE_LEN)
        )
    elif codebook_mode != "per-shard":
        raise ValueError(f"unknown codebook_mode {codebook_mode!r}")

    inners = [
        block_format.compress(
            data[a:b], backend=backend, codebook=codebook,
            embed_codebook=codebook is None, **kwargs
        )
        for a, b in ranges
    ]

    out = bytearray(_HDR)
    out[0:4] = int(MAGIC).to_bytes(4, "little")
    out[4] = 1
    out[5] = mode_flag
    out[8:12] = len(inners).to_bytes(4, "little")
    out[12:20] = len(data).to_bytes(8, "little")
    if codebook is not None:
        cb_blob = block_format._codebook_to_header(codebook)
        out += len(cb_blob).to_bytes(4, "little")
        out += cb_blob
    for blob in inners:
        out += len(blob).to_bytes(8, "little")
    for blob in inners:
        out += blob
    return bytes(out)


def decompress(blob: bytes, backend: str | None = None) -> bytes:
    if len(blob) < _HDR or int.from_bytes(blob[0:4], "little") != MAGIC:
        raise ValueError("not an HTPX archive")
    if blob[4] != 1:
        raise ValueError(f"unsupported HTPX version {blob[4]}")
    n_shards = int.from_bytes(blob[8:12], "little")
    original = int.from_bytes(blob[12:20], "little")
    off = _HDR
    codebook = None
    if blob[5] == 1:  # global mode: one codebook for every shard
        if off + 4 > len(blob):
            raise ValueError("truncated HTPX codebook")
        cb_size = int.from_bytes(blob[off : off + 4], "little")
        off += 4
        if off + cb_size > len(blob):
            raise ValueError("truncated HTPX codebook")
        codebook = block_format.codebook_from_blob(blob[off : off + cb_size])
        off += cb_size
    sizes = []
    for _ in range(n_shards):
        if off + 8 > len(blob):
            raise ValueError("truncated HTPX index")
        sizes.append(int.from_bytes(blob[off : off + 8], "little"))
        off += 8
    parts = []
    for s in sizes:
        if off + s > len(blob):
            raise ValueError("truncated HTPX shard")
        parts.append(
            block_format.decompress(
                blob[off : off + s], backend=backend, codebook=codebook
            )
        )
        off += s
    out = b"".join(parts)
    if len(out) != original:
        raise ValueError("HTPX size mismatch after decompression")
    return out
