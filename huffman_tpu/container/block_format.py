"""Native block container ("HTPU"): the TPU-first archive format.

The reference's container is one continuous bitstream, which forces its
decoder to walk the payload serially (Decompressor.cu:259-291). The native
format instead encodes fixed-size *symbol blocks* independently (SURVEY.md
§7 architecture decision) and ships, by default, the **group-interleaved**
payload (version 2) consumed by the Pallas lane-parallel decoder
(ops/pallas_decode.py): the per-block bitstreams of each 1024-block group
are merged into one sequential word stream in decoder-consumption order.
A version-1 payload (independent word-aligned per-block slabs + per-block
bit table, decoded by the XLA lane decoder in ops/decode.py) remains
supported for cross-validation and as a simpler interchange profile.

Common layout (little-endian, byte-aligned):

    offset  size  field
    0       4     magic "HTPU" (u32 = 0x48545055)
    4       1     version (1 = block slabs, 2 = interleaved groups)
    5       1     flags (bit0: odd input length)
    6       1     raw last byte (if odd, else 0)
    7       1     max code length
    8       8     original size in bytes (u64)
    16      4     symbols per block (u32)
    20      4     number of blocks (u32)
    24      4     unique symbol count (u32)
    28      4     CRC32 of the original data (u32)  -- integrity, absent
                  from the reference format entirely
    32      128   count of codes per length 1..32 (u32[32])
    160     2n    symbols in canonical order (u16[n])

version 1 tail:
    u32[num_blocks] per-block payload bit lengths
    payload: per-block streams zero-padded to 4-byte boundaries,
    big-endian u32 words

version 2 tail:
    u32 ngroups
    u32[ngroups] per-group word counts
    payload: per-group interleaved streams, little-endian u32 word values
"""

from __future__ import annotations

import functools
import zlib

import numpy as np

from ..codebook import Codebook
from ..constants import (
    DEFAULT_BLOCK_SYMBOLS,
    DEFAULT_MAX_CODE_LEN,
    MAX_CODE_LEN,
    MAX_SYMBOLS,
    NATIVE_MAGIC,
)
from .reference_format import bytes_to_symbols, histogram_host, symbols_to_bytes

_HEADER_BYTES = 32
_COUNTS_BYTES = 4 * MAX_CODE_LEN

def _bucket_words(w: int) -> int:
    """Round slab width up to a coarse bucket to bound jit recompiles.
    Quarter-octave steps (2^k x {1, 1.25, 1.5, 1.75}): pow2 buckets wasted
    up to ~2x of stream buffer and its D2H through the ~50 MB/s tunnel;
    four classes per octave keeps the waste under 25% at the same
    recompile order of magnitude."""
    w = max(w, 8)
    p = 8
    while p * 2 < w:
        p <<= 1
    for m in (4, 5, 6, 7, 8):
        if w <= p * m // 4:
            return p * m // 4
    return p * 2


def _codebook_to_header(cb: Codebook) -> bytes:
    lens_in_order = cb.lengths[cb.sym_order]
    counts = np.bincount(lens_in_order, minlength=MAX_CODE_LEN + 1)[1:].astype("<u4")
    return counts.tobytes() + cb.sym_order.astype("<u2").tobytes()


def codebook_from_blob(cb_blob: bytes) -> Codebook:
    """Parse a standalone counts++symbols codebook blob (the layout
    _codebook_to_header writes; used by sharded archives)."""
    counts = np.frombuffer(cb_blob[:_COUNTS_BYTES], dtype="<u4")
    n = int(counts.sum())
    syms = np.frombuffer(cb_blob[_COUNTS_BYTES : _COUNTS_BYTES + 2 * n], dtype="<u2")
    if syms.size != n:
        raise ValueError("truncated codebook blob")
    lengths = np.zeros(MAX_SYMBOLS, dtype=np.uint8)
    lengths[syms] = np.repeat(
        np.arange(1, MAX_CODE_LEN + 1, dtype=np.uint8), counts.astype(np.int64)
    )
    return Codebook.from_lengths(lengths)


def _codebook_from_header(blob: bytes, n_unique: int) -> tuple[Codebook, int]:
    counts = np.frombuffer(blob[_HEADER_BYTES : _HEADER_BYTES + _COUNTS_BYTES], dtype="<u4")
    off = _HEADER_BYTES + _COUNTS_BYTES
    syms = np.frombuffer(blob[off : off + 2 * n_unique], dtype="<u2")
    off += 2 * n_unique
    if int(counts.sum()) != n_unique:
        raise ValueError("corrupt codebook: counts do not sum to n_unique")
    lengths = np.zeros(MAX_SYMBOLS, dtype=np.uint8)
    lengths[syms] = np.repeat(
        np.arange(1, MAX_CODE_LEN + 1, dtype=np.uint8), counts.astype(np.int64)
    )
    return Codebook.from_lengths(lengths), off


def _build_header(
    version, data, is_odd, last_byte, cb, B, nblocks, embed_codebook=True
) -> bytearray:
    header = bytearray(_HEADER_BYTES)
    header[0:4] = int(NATIVE_MAGIC).to_bytes(4, "little")
    header[4] = version
    # flags: bit0 odd input, bit1 codebook stored externally (sharded
    # archives pay the symbol table once at the archive level)
    header[5] = (1 if is_odd else 0) | (0 if embed_codebook else 2)
    header[6] = last_byte
    header[7] = cb.max_len
    header[8:16] = len(data).to_bytes(8, "little")
    header[16:20] = B.to_bytes(4, "little")
    header[20:24] = nblocks.to_bytes(4, "little")
    header[24:28] = cb.n_unique.to_bytes(4, "little")
    header[28:32] = (zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return header


def _use_device() -> bool:
    try:
        import jax

        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


# Below this many symbols the host runtime wins even against a warm device
# (one group or less of lanes; and a cold process pays tens of seconds of
# XLA/Mosaic compilation that a 100 KB file never amortizes). backend="jax"
# forces the device path regardless.
DEVICE_MIN_PAIRS = 1 << 21


# --------------------------------------------------------------------------
# shared encode front half: per-lane packed slabs
# --------------------------------------------------------------------------

def _encode_slab(symbols, codebook, nblocks, B, backend):
    """Pack every block's codewords into an (nblocks, W) word slab plus
    per-block bit counts and the per-position length table."""
    if backend in ("numpy", "native") or (
        backend is None
        and (not _use_device() or symbols.size < DEVICE_MIN_PAIRS)
    ):
        return _encode_slab_numpy(symbols, codebook, nblocks, B)
    return _encode_slab_jax(symbols, codebook, nblocks, B)


def _encode_slab_numpy(symbols, codebook, nblocks, B):
    try:
        from ..runtime import native

        if native.available():
            return native.encode_blocks(symbols, codebook, nblocks, B, _bucket_words)
    except ImportError:
        pass
    from ..bitio import pack_codes_blocked

    padded = np.zeros(nblocks * B, dtype=np.uint16)
    padded[: symbols.size] = symbols
    codes, lens = codebook.encode_symbols_host(padded)
    lens[symbols.size :] = 0
    codes = codes.reshape(nblocks, B)
    lens = lens.reshape(nblocks, B)
    block_bits = lens.sum(axis=1, dtype=np.int64)
    W = _bucket_words(int((block_bits.max(initial=1) + 31) // 32))
    slab, _ = pack_codes_blocked(codes, lens, W)
    return slab, block_bits, lens.astype(np.int32)


def _displacement_tables(codebook):
    """Cached row-displacement (disp, table) for the Pallas encode gather;
    None when the codebook exceeds 26-bit codes or does not pack."""
    cached = codebook.__dict__.get("_disp_tables", False)
    if cached is not False:
        return cached
    result = None
    if codebook.max_len <= 26 and codebook.n_unique:
        from ..ops.pallas_gather import build_displacement_table

        packed = (codebook.lengths.astype(np.uint32) << 26) | codebook.codes.astype(
            np.uint32
        )
        r = build_displacement_table(packed, codebook.lengths > 0)
        if r is not None:
            import jax.numpy as jnp

            result = (jnp.asarray(r[0]), jnp.asarray(r[1]))
    codebook.__dict__["_disp_tables"] = result
    return result


def _gather_device(symbols, codebook, n_lanes, B):
    """Shared device front half: upload padded symbols, gather (codes,
    lens) with the Pallas displacement-table kernel (~15x XLA's gather;
    ops/pallas_gather.py) when the codebook packs, else the packed
    single-gather XLA path. Returns (codes, lens, valid) device arrays of
    shape (n_lanes, B)."""
    import jax.numpy as jnp

    from ..ops import encode as enc
    from ..ops.tables import device_tables

    t = device_tables(codebook)
    padded = np.zeros(n_lanes * B, dtype=np.int32)
    padded[: symbols.size] = symbols
    sym_dev = jnp.asarray(padded).reshape(n_lanes, B)
    valid = (
        jnp.arange(n_lanes * B, dtype=jnp.int32).reshape(n_lanes, B)
        < symbols.size
    )
    # Mosaic path only on a real device: the interpreter would crawl
    # through the gather tree (kernel correctness is pinned by its own
    # interpret tests + scripts/chip_check.py).
    disp_tables = _displacement_tables(codebook) if _use_device() else None
    if disp_tables is not None:
        from ..ops.pallas_gather import gather_table_pallas

        packed = gather_table_pallas(sym_dev, *disp_tables)
        codes = packed & jnp.uint32((1 << 26) - 1)
        lens = (packed >> 26).astype(jnp.int32)
        codes = jnp.where(valid, codes, 0)
        lens = jnp.where(valid, lens, 0)
    elif t.enc_packed is not None:
        codes, lens = enc.gather_codes_packed(sym_dev, t.enc_packed, valid)
    else:
        codes, lens = enc.gather_codes(sym_dev, t.enc_codes, t.enc_lens, valid)
    return codes, lens, valid


def _encode_slab_jax(symbols, codebook, nblocks, B):
    from ..ops import encode as enc
    from ..constants import GROUP_LANES

    codes, lens, _ = _gather_device(symbols, codebook, nblocks, B)
    offsets, block_bits = enc.block_offsets(lens)
    block_bits_np = np.asarray(block_bits).astype(np.int64)
    W = _bucket_words(int((block_bits_np.max(initial=1) + 31) // 32))
    if nblocks % GROUP_LANES == 0:
        # Pallas lane packer: ~2x the XLA scatter formulation on TPU.
        from ..ops.pallas_encode import pack_blocks_pallas

        slab = pack_blocks_pallas(codes, lens, W, interpret=not _use_device())
    else:
        slab = enc.pack_blocks(codes, lens, offsets, W)
    return np.asarray(slab), block_bits_np, np.asarray(lens)


_front_cache: dict = {}


def _encode_front_jit(
    sym_dev, n_pairs, min_len, n_real, tables, n_lanes, B, use_disp, interpret
):
    """Phase 1 in ONE program: gather + protocol lengths + per-group word
    counts. Split out so the tunnel pays one dispatch, not one per jnp op
    (~60 ms each here — eager chains dominated the container's wall time).
    The jitted callable is cached per (arity, flags) so repeat compresses
    reuse XLA's own shape-keyed cache underneath."""
    import jax
    import jax.numpy as jnp

    key = (len(tables), use_disp, interpret)
    front = _front_cache.get(key)
    if front is None:

        @functools.partial(jax.jit, static_argnames=("n_lanes", "B"))
        def front(bytes_dev, n_pairs, min_len, n_real, tables, *, n_lanes, B):
            from ..constants import GROUP_LANES
            from ..ops.histogram import bytes_to_symbols_device

            # Bytes -> byte-pair symbols on device: the host ships half the
            # bytes through the tunnel (measured ~57 MB/s up on this setup
            # — the transfer, not the kernels, bounds container wall time).
            sym_dev = bytes_to_symbols_device(bytes_dev).reshape(n_lanes, B)
            valid = (
                jnp.arange(n_lanes * B, dtype=jnp.int32).reshape(n_lanes, B)
                < n_pairs
            )
            if use_disp:
                from ..ops.pallas_gather import gather_table_pallas

                disp, table = tables
                packed = gather_table_pallas(
                    sym_dev, disp, table, interpret=interpret
                )
                codes = jnp.where(valid, packed & jnp.uint32((1 << 26) - 1), 0)
                lens = jnp.where(valid, (packed >> 26).astype(jnp.int32), 0)
            elif len(tables) == 1 and not interpret:
                # Dense dual packed-16 Pallas gather: the exact tier for
                # alphabets the displacement pack rejects.
                from ..ops.pallas_gather import gather_packed32_dense

                packed = gather_packed32_dense(sym_dev, tables[0])
                codes = jnp.where(valid, packed & jnp.uint32((1 << 26) - 1), 0)
                lens = jnp.where(valid, (packed >> 26).astype(jnp.int32), 0)
            else:
                from ..ops import encode as enc

                if len(tables) == 1:
                    codes, lens = enc.gather_codes_packed(
                        sym_dev, tables[0], valid
                    )
                else:
                    codes, lens = enc.gather_codes(sym_dev, *tables, valid)
            eff = jnp.where(valid, lens, min_len).astype(jnp.int32)
            lane = jnp.arange(n_lanes, dtype=jnp.int32)
            bits = jnp.where(lane < n_real, jnp.sum(eff, axis=1), 0)
            gwords = jnp.sum((bits >> 5).reshape(-1, GROUP_LANES), axis=1)
            return codes, eff, gwords

        _front_cache[key] = front

    return front(
        sym_dev, n_pairs, min_len, n_real, tables, n_lanes=n_lanes, B=B
    )


def _encode_streams_jax(symbols, codebook, n_lanes, B, n_real):
    """Device encode straight to interleaved streams (gather -> Pallas
    pack -> staging->stream; no slab). Exactly two device programs and two
    D2H transfers: the tiny per-group word counts (to size the stream
    buffer statically) and the trimmed payload."""
    import jax.numpy as jnp

    from ..ops.pallas_encode import pack_streams_pallas
    from ..ops.tables import device_tables

    interpret = not _use_device()
    disp_tables = _displacement_tables(codebook) if not interpret else None
    if disp_tables is not None:
        tables = disp_tables
        use_disp = True
    else:
        t = device_tables(codebook)
        tables = (t.enc_packed,) if t.enc_packed is not None else (
            t.enc_codes, t.enc_lens
        )
        use_disp = False

    padded = np.zeros(n_lanes * B * 2, dtype=np.uint8)
    raw = np.ascontiguousarray(symbols, dtype="<u2").view(np.uint8)
    padded[: raw.size] = raw
    bytes_dev = jnp.asarray(padded)
    present = codebook.lengths[codebook.lengths > 0]
    min_len = int(present.min()) if present.size else 1

    codes, eff, gwords = _encode_front_jit(
        bytes_dev, jnp.asarray(symbols.size, jnp.int32),
        jnp.asarray(min_len, jnp.int32), jnp.asarray(n_real, jnp.int32),
        tables, n_lanes, B, use_disp, interpret,
    )
    cap = _bucket_words(max(int(np.asarray(gwords).max(initial=1)), 128))

    streams, counts = pack_streams_pallas(
        codes, eff, jnp.asarray(n_real, jnp.int32), words_cap=cap,
        interpret=interpret,
    )
    counts = np.asarray(counts)
    streams = np.asarray(streams)
    return [streams[g, : counts[g]] for g in range(streams.shape[0])]


# --------------------------------------------------------------------------
# compress
# --------------------------------------------------------------------------

def compress(
    data: bytes,
    backend: str | None = None,
    block_symbols: int = DEFAULT_BLOCK_SYMBOLS,
    codebook: Codebook | None = None,
    mode: str = "interleaved",
    embed_codebook: bool = True,
    max_code_len: int | None = DEFAULT_MAX_CODE_LEN,
) -> bytes:
    """``max_code_len`` trades a fraction of a percent of ratio for a
    shorter decode-kernel length search (its cost is linear in codebook
    depth). With a limit set (the default), the codebook is the optimal
    length-limited package-merge code — the SAME construction the fused
    device encoder runs on-chip, so host- and device-built containers are
    byte-identical (scripts/chip_check.py sweeps this). Pass None for the
    unlimited two-queue Huffman code."""
    if len(data) > (1 << 32):
        # int32 device paths (histograms, offsets) bound a single HTPU
        # container; the scale-out formats have no such limit.
        raise ValueError(
            "input exceeds 4 GiB: use the HTPS streaming container "
            "(api.compress via CLI --stream-mb) or an HTPX sharded archive"
        )
    symbols, is_odd, last_byte = bytes_to_symbols(data)
    n_pairs = symbols.size
    # The TPU decoder emits packed 16-bit symbol pairs, so blocks must hold
    # an even symbol count; round odd requests up rather than writing a
    # container the flagship path can't read.
    B = block_symbols + (block_symbols & 1)
    nblocks = (n_pairs + B - 1) // B

    if codebook is None and not embed_codebook:
        raise ValueError("embed_codebook=False requires an explicit codebook")
    if (
        codebook is None
        and mode == "interleaved"
        and nblocks > 0
        and max_code_len is not None
        and 16 <= max_code_len <= 26  # >= 16: feasible for ANY byte-pair
        # alphabet (the device program can't data-check feasibility; the
        # host path raises a clean error for tighter limits)
        and n_pairs < (1 << 30)
        and _use_device()
        and (
            backend == "jax"
            or (backend is None and n_pairs >= DEVICE_MIN_PAIRS)
        )
    ):
        # The FLAGSHIP whole-pipeline device encode (ops/fused.py):
        # histogram -> tiered package-merge codebook -> rank-select gather
        # -> Pallas stream pack, one program; the host sees only the
        # lengths vector (for the header) and the trimmed payload.
        out, codebook = _compress_v2_fused(
            data, symbols, is_odd, last_byte, B, nblocks, max_code_len
        )
    else:
        out, codebook = _compress_host_codebook(
            data, symbols, is_odd, last_byte, codebook, B, nblocks,
            backend, mode, embed_codebook, max_code_len,
        )
    if len(out) >= _HEADER_BYTES + len(data):
        # Incompressible input: stored mode (flags bit2) — header + raw
        # bytes. The reference inflates such inputs by ~10% (SURVEY.md §6,
        # the bundled JPEG); we cap the overhead at the 32-byte header.
        header = _build_header(1, data, False, 0, codebook, B, 0)
        header[5] |= 4
        return bytes(header) + data
    return out


def _host_codebook(freqs, max_code_len):
    """Container codebook from host-side frequencies: optimal
    length-limited package-merge at ``max_code_len`` via the pure-NumPy
    twin (codebook.package_merge_lengths — bit-identical to the fused
    device encoder's on-chip construction, so host- and device-built
    containers match byte for byte; no jit or JAX dependency on this
    path). ``max_code_len=None`` selects the unlimited two-queue code."""
    if max_code_len is not None:
        from ..codebook import package_merge_lengths

        return Codebook.from_lengths(package_merge_lengths(freqs, max_code_len))
    return Codebook.from_frequencies(freqs)


def _compress_host_codebook(data, symbols, is_odd, last_byte, codebook, B,
                            nblocks, backend, mode, embed_codebook,
                            max_code_len):
    """Container encode with a host-built (or caller-supplied) codebook;
    the payload may still pack on device (`_encode_streams_jax`). Returns
    ``(container_bytes, codebook)``."""
    if codebook is None:
        codebook = _host_codebook(histogram_host(symbols), max_code_len)

    if mode == "interleaved":
        out = _compress_v2(
            data, symbols, is_odd, last_byte, codebook, B, nblocks, backend,
            embed_codebook,
        )
    elif mode == "blocks":
        out = _compress_v1(
            data, symbols, is_odd, last_byte, codebook, B, nblocks, backend,
            embed_codebook,
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return out, codebook


def _compress_v1(data, symbols, is_odd, last_byte, cb, B, nblocks, backend,
                 embed_codebook=True):
    slab, block_bits, _ = (
        _encode_slab(symbols, cb, nblocks, B, backend)
        if nblocks
        else (np.zeros((0, 1), np.uint32), np.zeros(0, np.int64), None)
    )
    out = bytearray(
        _build_header(1, data, is_odd, last_byte, cb, B, nblocks, embed_codebook)
    )
    if embed_codebook:
        out += _codebook_to_header(cb)
    out += block_bits[:nblocks].astype("<u4").tobytes()
    if nblocks:
        word_counts = (block_bits[:nblocks] + 31) // 32
        W = slab.shape[1]
        keep = np.repeat(np.arange(nblocks, dtype=np.int64), word_counts) * W
        within = np.concatenate([np.arange(c, dtype=np.int64) for c in word_counts])
        out += slab.reshape(-1)[keep + within].astype(">u4").tobytes()
    return bytes(out)


def _compress_v2(data, symbols, is_odd, last_byte, cb, B, nblocks, backend,
                 embed_codebook=True):
    from . import interleave as il
    from ..constants import GROUP_LANES

    out = bytearray(
        _build_header(2, data, is_odd, last_byte, cb, B, nblocks, embed_codebook)
    )
    if embed_codebook:
        out += _codebook_to_header(cb)

    if nblocks == 0:
        out += (0).to_bytes(4, "little")
        return bytes(out)

    n_lanes = (nblocks + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    use_dev = backend == "jax" or (
        backend is None and _use_device() and symbols.size >= DEVICE_MIN_PAIRS
    )
    if use_dev:
        streams = _encode_streams_jax(symbols, cb, n_lanes, B, nblocks)
    else:
        slab, block_bits, lens = _encode_slab(symbols, cb, n_lanes, B, backend)
        present = cb.lengths[cb.lengths > 0]
        min_len = int(present.min()) if present.size else 1
        eff = il.effective_lengths(lens, symbols.size, min_len, n_lanes, B)
        streams = il.build_streams(slab, eff, nblocks)

    return _emit_streams(out, streams, nblocks)


def _emit_streams(out: bytearray, streams, nblocks: int) -> bytes:
    """Append the v2 payload tail (ngroups, per-group word counts, stream
    words), stripping pad-lane preload zeros: each stream's first
    2*GROUP_LANES words are w0[lane 0..1023], w1[lane 0..1023]; only the
    first n_real of each half carry data. The parser reinserts the
    zeros."""
    from ..constants import GROUP_LANES

    stripped = []
    for g, s in enumerate(streams):
        n_real = max(0, min(GROUP_LANES, nblocks - g * GROUP_LANES))
        stripped.append(
            np.concatenate(
                [s[:n_real], s[GROUP_LANES : GROUP_LANES + n_real], s[2 * GROUP_LANES :]]
            )
        )
    out += len(stripped).to_bytes(4, "little")
    counts = np.array([s.size for s in stripped], dtype="<u4")
    out += counts.tobytes()
    for s in stripped:
        out += s.astype("<u4").tobytes()
    return bytes(out)


def _compress_v2_fused(data, symbols, is_odd, last_byte, B, nblocks,
                       max_code_len, interpret=None, alphabet_cap=None):
    """Interleaved container via the whole-pipeline fused device encoder
    (ops/fused.py): the histogram, the tiered package-merge codebook, the
    rank-select symbol gather, and the Pallas stream pack run as ONE
    device program on the raw bytes; the host receives the lengths vector
    (to serialize the codebook header — 128 KiB) and the trimmed payload.
    Matches the reference's all-on-accelerator encode (Compressor.cu:
    365-585) without its 10+ host/device crossings, and byte-identical to
    the host path because both sides build the same cap-invariant
    package-merge code. Returns ``(container_bytes, codebook)``.

    ``interpret``/``alphabet_cap`` exist for CPU tests (the auto path
    resolves interpret from the visible device)."""
    import jax.numpy as jnp

    from ..constants import GROUP_LANES
    from ..ops.fused import encode_device_bytes

    if interpret is None:
        interpret = not _use_device()
    n_lanes = (nblocks + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    padded = np.zeros(n_lanes * B * 2, dtype=np.uint8)
    raw = np.frombuffer(data, np.uint8)[: symbols.size * 2]
    padded[: raw.size] = raw
    r = encode_device_bytes(
        jnp.asarray(padded), jnp.asarray(symbols.size, jnp.int32), B,
        max_len=max_code_len, interpret=interpret, alphabet_cap=alphabet_cap,
    )
    counts = np.asarray(r["counts"])
    if not bool(r["ok"]):
        # Unreachable with the default full-alphabet top tier; an explicit
        # alphabet_cap (tests) may overflow — never emit garbage bytes.
        raise ValueError("fused encode overflowed its alphabet cap")
    lengths = np.asarray(r["lengths"]).astype(np.uint8)
    cb = Codebook.from_lengths(lengths)
    # One sliced D2H: the stream buffer is worst-case sized on device, but
    # only max(counts) words per group ever cross the ~50 MB/s link.
    wmax = int(counts.max(initial=1))
    streams_np = np.asarray(r["streams"][:, :wmax])
    streams = [streams_np[g, : counts[g]] for g in range(counts.size)]

    out = bytearray(
        _build_header(2, data, is_odd, last_byte, cb, B, nblocks, True)
    )
    out += _codebook_to_header(cb)
    return _emit_streams(out, streams, nblocks), cb


# --------------------------------------------------------------------------
# parse + decompress
# --------------------------------------------------------------------------

class ParsedContainer:
    """Parsed native container header + payload views (host side)."""

    def __init__(self, blob: bytes, codebook: Codebook | None = None):
        if len(blob) < _HEADER_BYTES or int.from_bytes(blob[0:4], "little") != NATIVE_MAGIC:
            raise ValueError("not an HTPU container")
        self.version = blob[4]
        if self.version not in (1, 2):
            raise ValueError(f"unsupported container version {blob[4]}")
        self.is_odd = bool(blob[5] & 1)
        self.external_codebook = bool(blob[5] & 2)
        self.stored = bool(blob[5] & 4)
        self.last_byte = blob[6]
        self.max_len = blob[7]
        self.original_size = int.from_bytes(blob[8:16], "little")
        self.block_symbols = int.from_bytes(blob[16:20], "little")
        self.num_blocks = int.from_bytes(blob[20:24], "little")
        self.n_unique = int.from_bytes(blob[24:28], "little")
        self.crc32 = int.from_bytes(blob[28:32], "little")
        if self.stored:
            self.codebook = None
            self.payload = blob[_HEADER_BYTES:]
            return
        # Structural sanity before any size-driven allocation (a corrupt
        # count field must raise, not MemoryError).
        if self.block_symbols == 0 or self.block_symbols > (1 << 24):
            raise ValueError("corrupt container: bad block_symbols")
        n_pairs = (self.original_size - (1 if self.is_odd else 0)) // 2
        expect_blocks = (n_pairs + self.block_symbols - 1) // self.block_symbols
        if self.num_blocks != expect_blocks:
            raise ValueError("corrupt container: block count mismatch")
        if self.n_unique > MAX_SYMBOLS:
            raise ValueError("corrupt container: bad unique count")
        if self.external_codebook:
            if codebook is None:
                raise ValueError(
                    "container stores its codebook externally; pass codebook="
                )
            self.codebook, off = codebook, _HEADER_BYTES
        else:
            self.codebook, off = _codebook_from_header(blob, self.n_unique)

        if self.version == 1:
            self.block_bits = np.frombuffer(
                blob[off : off + 4 * self.num_blocks][
                    : (len(blob) - off) & ~3
                ], dtype="<u4"
            ).astype(np.int64)
            off += 4 * self.num_blocks
            if self.block_bits.size != self.num_blocks:
                raise ValueError("truncated container: block bit table")
            if self.num_blocks and self.block_bits.size and (
                self.block_bits.max() > 32 * self.block_symbols
            ):
                raise ValueError("corrupt container: block bits exceed block size")
            self.payload = blob[off:]
        else:
            self.ngroups = int.from_bytes(blob[off : off + 4], "little")
            off += 4
            from ..constants import GROUP_LANES as _GL

            if self.ngroups != (self.num_blocks + _GL - 1) // _GL:
                raise ValueError("corrupt container: group count mismatch")
            self.group_words = np.frombuffer(
                blob[off : off + 4 * self.ngroups][
                    : (len(blob) - off) & ~3
                ], dtype="<u4"
            ).astype(np.int64)
            off += 4 * self.ngroups
            if self.group_words.size != self.ngroups:
                raise ValueError("truncated container: group table")
            if self.ngroups and self.group_words.size and (
                self.group_words.max() > (len(blob) + 3) // 4
            ):
                raise ValueError("corrupt container: group words exceed payload")
            total = int(self.group_words.sum())
            raw = blob[off : off + 4 * total]
            if len(raw) != 4 * total:
                raise ValueError("truncated container payload")
            words = np.frombuffer(raw, dtype="<u4")
            parts = np.split(words, np.cumsum(self.group_words)[:-1])
            # Reinsert the pad-lane preload zeros stripped by the writer.
            from ..constants import GROUP_LANES

            self.streams = []
            for g, s in enumerate(parts):
                n_real = max(0, min(GROUP_LANES, self.num_blocks - g * GROUP_LANES))
                w0 = np.zeros(GROUP_LANES, dtype=np.uint32)
                w1 = np.zeros(GROUP_LANES, dtype=np.uint32)
                w0[:n_real] = s[:n_real]
                w1[:n_real] = s[n_real : 2 * n_real]
                self.streams.append(
                    np.concatenate([w0, w1, s[2 * n_real :].astype(np.uint32)])
                )

    def slab(self, words_per_block: int | None = None) -> np.ndarray:
        """v1: re-slab the tightly packed payload into (nblocks, W) rows."""
        word_counts = (self.block_bits + 31) // 32
        W = words_per_block or _bucket_words(int(word_counts.max(initial=1)))
        words = np.frombuffer(
            self.payload[: int(word_counts.sum()) * 4], dtype=">u4"
        ).astype(np.uint32)
        slab = np.zeros((self.num_blocks, W), dtype=np.uint32)
        dst = np.repeat(np.arange(self.num_blocks, dtype=np.int64), word_counts) * W
        within = np.concatenate(
            [np.arange(c, dtype=np.int64) for c in word_counts]
        ) if self.num_blocks else np.zeros(0, dtype=np.int64)
        slab.reshape(-1)[dst + within] = words
        return slab


def decompress(
    blob: bytes,
    backend: str | None = None,
    verify_crc: bool = True,
    codebook: Codebook | None = None,
) -> bytes:
    c = ParsedContainer(blob, codebook=codebook)
    if c.stored:
        data = bytes(c.payload[: c.original_size])
        if len(data) != c.original_size:
            raise ValueError("truncated stored container")
        if verify_crc and (zlib.crc32(data) & 0xFFFFFFFF) != c.crc32:
            raise ValueError("CRC mismatch: corrupt container")
        return data
    n_pairs = (c.original_size - (1 if c.is_odd else 0)) // 2
    if n_pairs == 0:
        data = symbols_to_bytes(np.zeros(0, np.uint16), c.is_odd, c.last_byte)
    else:
        if c.version == 1:
            symbols = _decode_v1(c, backend)
        else:
            symbols = _decode_v2(c, backend)
        data = symbols_to_bytes(
            symbols[:n_pairs].astype(np.uint16), c.is_odd, c.last_byte
        )
    if verify_crc and (zlib.crc32(data) & 0xFFFFFFFF) != c.crc32:
        raise ValueError("CRC mismatch: corrupt container or decode bug")
    return data


def _small(c: ParsedContainer) -> bool:
    return c.original_size // 2 < DEVICE_MIN_PAIRS


def _decode_v1(c: ParsedContainer, backend) -> np.ndarray:
    slab = c.slab()
    if backend in ("numpy", "native") or (
        backend is None and (not _use_device() or _small(c))
    ):
        out = np.zeros((c.num_blocks, c.block_symbols), dtype=np.uint16)
        total = (c.original_size - (1 if c.is_odd else 0)) // 2
        for b in range(c.num_blocks):
            n = min(c.block_symbols, total - b * c.block_symbols)
            out[b, :n] = c.codebook.decode_stream_host(slab[b], 0, n)
        return out.reshape(-1)

    import jax.numpy as jnp

    from ..ops import decode as dec
    from ..ops.tables import device_tables

    t = device_tables(c.codebook)
    out = dec.decode_blocks(
        jnp.asarray(slab), t.lj_limit, t.base, t.sym_order, c.block_symbols, t.max_len
    )
    return np.asarray(out).reshape(-1)


_postpack_cache: dict = {}


def _postpack_v2(out, ngroups_p: int, ngroups: int, B: int, packed: bool):
    """Device symbols -> block-major packed u16 pairs (as uint32 words),
    still on device; one cached jit per shape class. ``packed`` input is
    the kernel's native (g, B/2, 8, 128) pair words (already the final
    16-bit stream — just reorder); unpacked input is (g*B, 8, 128) i32."""
    import jax
    import jax.numpy as jnp

    fn = _postpack_cache.get(packed)
    if fn is None:

        @functools.partial(
            jax.jit, static_argnames=("ngroups_p", "ngroups", "B")
        )
        def fn(out, *, ngroups_p, ngroups, B):
            if packed:
                a = out.reshape(ngroups_p, B // 2, 8, 128)[:ngroups]
                return jax.lax.bitcast_convert_type(
                    a.transpose(0, 2, 3, 1), jnp.uint32
                ).reshape(-1)
            a = out.reshape(ngroups_p, B, 8, 128)[:ngroups]
            flat = a.transpose(0, 2, 3, 1).reshape(-1)
            pair = flat.reshape(-1, 2).astype(jnp.uint32)
            return pair[:, 0] | (pair[:, 1] << 16)

        _postpack_cache[packed] = fn
    return fn(out, ngroups_p=ngroups_p, ngroups=ngroups, B=B)


def _decode_v2(c: ParsedContainer, backend) -> np.ndarray:
    from . import interleave as il
    from ..constants import GROUP_LANES

    B = c.block_symbols
    if backend in ("numpy", "native") or (
        backend is None and (not _use_device() or _small(c))
    ):
        def one(g_s):
            g, s = g_s
            n_real = max(0, min(GROUP_LANES, c.num_blocks - g * GROUP_LANES))
            return il.decode_interleaved(s, c.codebook, B, n_real)

        if len(c.streams) > 1:
            # Groups decode independently; the native decoder releases the
            # GIL inside ctypes, so a thread pool scales on real hosts.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor() as ex:
                outs = list(ex.map(one, enumerate(c.streams)))
        else:
            outs = [one((0, c.streams[0]))] if c.streams else []
        # (ngroups, B, GROUP_LANES) -> lane-major symbol order
        arr = np.stack(outs)  # (g, t, lane)
        return arr.transpose(0, 2, 1).reshape(-1)

    import jax.numpy as jnp

    from ..ops import pallas_decode as pd
    from ..ops.pallas_decode import build_symtab

    cb = c.codebook
    stacked, _ = il.pad_streams(list(c.streams))
    rows_per = stacked.shape[0] // c.ngroups
    # The chain-interleave width is mode-dependent (rank mode hides one
    # more chain; pallas_decode.default_multi). Resolve it here because
    # the group-count padding below must match the kernel's width — and
    # pad on the host: decode_groups would otherwise copy the whole
    # device-resident payload inside jit just to append empty groups.
    symtab, sym_rows, translate = build_symtab(cb.sym_order)
    multi = pd.default_multi(bool(translate), int(cb.sym_order.size))
    ngroups_p = -(-c.ngroups // multi) * multi
    if ngroups_p != c.ngroups:
        stacked = np.vstack(
            [stacked, np.zeros(((ngroups_p - c.ngroups) * rows_per, 128), stacked.dtype)]
        )
    meta = np.zeros((ngroups_p, 4), dtype=np.int32)
    for g in range(c.ngroups):
        meta[g, 0] = max(0, min(GROUP_LANES, c.num_blocks - g * GROUP_LANES))

    out = pd.decode_groups(
        jnp.asarray(stacked),
        jnp.asarray(cb.lj_limit),
        jnp.asarray((cb.base & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray(symtab),
        jnp.asarray(meta),
        B,
        rows_per,
        sym_rows,
        max_len=max(cb.max_len, 1),
        translate=bool(translate),
        multi=multi,  # must match the host-side group padding above
        min_len=(
            int(cb.lengths[cb.lengths > 0].min()) if cb.n_unique else 1
        ),
        # Mosaic only runs on TPU; an explicit jax backend on CPU (tests)
        # exercises the kernel through the interpreter.
        interpret=not _use_device(),
        # Alphabets past the in-kernel tier translate rank -> symbol with an
        # XLA gather inside the same program — the whole decode stays on
        # device at any alphabet size (VERDICT r1 #3).
        sym_order_dev=(
            jnp.asarray(cb.sym_order.astype(np.int32))
            if (not translate and cb.n_unique)
            else None
        ),
        # Output stays in the kernel's packed pair form: the words ARE the
        # final 16-bit stream, skipping the unpack/repack shuffle (33 MB
        # of traffic per 16 MiB decoded). Rank-tier alphabets translate
        # the packed rank pairs in-program (gather_u16_pairs_pallas, r4)
        # so they keep the packed layout too.
        packed_out=bool(translate) or bool(cb.n_unique),
    )
    # (g*B+t, s, l) -> block-major + 16-bit pair packing ON DEVICE: the
    # tunnel moves D2H at ~50 MB/s, so shipping the decoded symbols as
    # packed u16 pairs (16.5 MB) instead of int32 (33 MB) halves the
    # largest wall-time term, and the layout transpose rides the device.
    packed = _postpack_v2(
        out, ngroups_p, c.ngroups, B, bool(translate) or bool(cb.n_unique)
    )
    return np.asarray(packed).view("<u2")
