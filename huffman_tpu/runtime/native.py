"""ctypes bindings for the native C++ host runtime (native/htpu_native.cpp).

The reference's host side is C++ (container writer Compressor.cu:634-700,
sequential decoder Decompressor.cu, two-queue builder
baseline/Compressor.cu:118-164); this module exposes the framework's native
equivalents to Python. pybind11 is not available in this environment, so
the library has a plain C ABI and is loaded with ctypes.

The shared object is built by ``make native`` (top-level Makefile) into
``build/libhtpu_native.so``; if missing and a compiler is present it is
built lazily on first use.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..constants import MAX_CODE_LEN, MAX_SYMBOLS

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "htpu_native.cpp"
_LIB = _REPO / "build" / "libhtpu_native.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_ERRORS = {
    -1: "bad arguments",
    -2: "truncated input",
    -3: "bad code length/codeword",
    -4: "output buffer overflow",
    -5: "decode protocol invariant broken",
}


class NativeError(RuntimeError):
    def __init__(self, fn: str, code: int):
        super().__init__(f"{fn}: {_ERRORS.get(code, f'error {code}')}")
        self.code = code


def _build() -> bool:
    _LIB.parent.mkdir(exist_ok=True)
    try:
        subprocess.run(
            [
                "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-Wall",
                str(_SRC), "-o", str(_LIB),
            ],
            check=True,
            capture_output=True,
            timeout=180,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def _find_wheel_lib() -> Path | None:
    """Shared object compiled into an installed wheel (setup.py builds
    huffman_tpu/_libhtpu_native.*.so; loaded via ctypes, never imported)."""
    pkg = Path(__file__).resolve().parents[1]
    for cand in sorted(pkg.glob("_libhtpu_native*.so")):
        return cand
    return None


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        lib_path = _LIB
        if _SRC.exists():
            # Source checkout: (re)build when the C++ source is newer.
            stale = (
                _LIB.exists() and _SRC.stat().st_mtime > _LIB.stat().st_mtime
            )
            if not _LIB.exists() or stale:
                if not _build():
                    # On a failed rebuild of a stale lib, refuse to silently
                    # use the old binary — twins must stay bit-identical
                    # with Python.
                    return None
        elif not _LIB.exists():
            # Installed wheel: use the extension built by setup.py.
            wheel_lib = _find_wheel_lib()
            if wheel_lib is None:
                return None
            lib_path = wheel_lib
        try:
            lib = ctypes.CDLL(str(lib_path))
        except OSError:
            return None

        i64 = ctypes.c_int64
        p8 = ctypes.POINTER(ctypes.c_uint8)
        p16 = ctypes.POINTER(ctypes.c_uint16)
        p32 = ctypes.POINTER(ctypes.c_uint32)
        pi32 = ctypes.POINTER(ctypes.c_int32)
        pi64 = ctypes.POINTER(ctypes.c_int64)

        lib.htpu_code_lengths.argtypes = [pi64, p8]
        lib.htpu_code_lengths.restype = ctypes.c_int
        lib.htpu_ref_compress_bound.argtypes = [i64]
        lib.htpu_ref_compress_bound.restype = i64
        lib.htpu_ref_compress.argtypes = [p8, i64, p8, i64, pi64]
        lib.htpu_ref_compress.restype = ctypes.c_int
        lib.htpu_ref_original_size.argtypes = [p8, i64]
        lib.htpu_ref_original_size.restype = i64
        lib.htpu_ref_decompress.argtypes = [p8, i64, p8, i64, pi64]
        lib.htpu_ref_decompress.restype = ctypes.c_int
        lib.htpu_interleave_build.argtypes = [
            p32, i64, i64, pi32, i64, i64, p32, i64, pi64,
        ]
        lib.htpu_interleave_build.restype = ctypes.c_int
        lib.htpu_block_bits.argtypes = [p16, i64, i64, i64, p8, pi64, pi32]
        lib.htpu_block_bits.restype = ctypes.c_int
        lib.htpu_encode_blocks.argtypes = [
            p16, i64, i64, i64, p32, p8, i64, p32,
        ]
        lib.htpu_encode_blocks.restype = ctypes.c_int
        lib.htpu_interleave_decode.argtypes = [
            p32, i64, p32, p32, p16, i64, ctypes.c_int32, i64, i64, p16,
        ]
        lib.htpu_interleave_decode.restype = ctypes.c_int
        lib.htpu_histogram.argtypes = [p8, i64, pi64]
        lib.htpu_histogram.restype = ctypes.c_int
        try:
            lib.htpu_disp_pack.argtypes = [p32, p8, i64, pi32, p32]
            lib.htpu_disp_pack.restype = ctypes.c_int
        except AttributeError:  # older prebuilt lib
            pass
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def code_lengths(freqs: np.ndarray) -> np.ndarray:
    """Two-queue optimal code lengths (native twin of
    codebook.code_lengths_from_frequencies, identical tie-breaking)."""
    lib = _load()
    assert lib is not None
    freqs = np.ascontiguousarray(freqs, dtype=np.int64)
    if freqs.shape != (MAX_SYMBOLS,):
        raise ValueError("freqs must be a dense MAX_SYMBOLS table")
    lengths = np.zeros(MAX_SYMBOLS, dtype=np.uint8)
    rc = lib.htpu_code_lengths(_ptr(freqs, ctypes.c_int64), _ptr(lengths, ctypes.c_uint8))
    if rc != 0:
        raise NativeError("htpu_code_lengths", rc)
    return lengths


def histogram(data: bytes | np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.ascontiguousarray(data, dtype=np.uint8)
    freqs = np.zeros(MAX_SYMBOLS, dtype=np.int64)
    rc = lib.htpu_histogram(_ptr(buf, ctypes.c_uint8), buf.size, _ptr(freqs, ctypes.c_int64))
    if rc != 0:
        raise NativeError("htpu_histogram", rc)
    return freqs


def compress_reference(data: bytes) -> bytes:
    """Reference ``.compressed`` writer (bit-identical to the Python
    container/reference_format.compress)."""
    lib = _load()
    assert lib is not None
    buf = np.frombuffer(data, dtype=np.uint8)
    cap = int(lib.htpu_ref_compress_bound(buf.size))
    out = np.empty(cap, dtype=np.uint8)
    n = ctypes.c_int64(0)
    rc = lib.htpu_ref_compress(
        _ptr(buf, ctypes.c_uint8), buf.size,
        _ptr(out, ctypes.c_uint8), cap, ctypes.byref(n),
    )
    if rc != 0:
        raise NativeError("htpu_ref_compress", rc)
    return out[: n.value].tobytes()


def decompress_reference(blob: bytes) -> bytes:
    """Reference container reader/decoder (arbitrary prefix codes)."""
    lib = _load()
    assert lib is not None
    buf = np.frombuffer(blob, dtype=np.uint8)
    size = int(lib.htpu_ref_original_size(_ptr(buf, ctypes.c_uint8), buf.size))
    if size < 0:
        raise NativeError("htpu_ref_original_size", size)
    out = np.empty(max(size, 1), dtype=np.uint8)
    n = ctypes.c_int64(0)
    rc = lib.htpu_ref_decompress(
        _ptr(buf, ctypes.c_uint8), buf.size,
        _ptr(out, ctypes.c_uint8), size, ctypes.byref(n),
    )
    if rc != 0:
        raise NativeError("htpu_ref_decompress", rc)
    return out[: n.value].tobytes()


def encode_blocks(
    symbols: np.ndarray, codebook, n_lanes: int, B: int, bucket_words
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded per-block slab pack (native twin of
    container.block_format._encode_slab_numpy). Returns
    (slab (n_lanes, W) uint32, block_bits (n_lanes,) int64,
    lens (n_lanes, B) int32)."""
    lib = _load()
    assert lib is not None
    symbols = np.ascontiguousarray(symbols, dtype=np.uint16)
    n_pairs = symbols.size
    lens_tbl = np.ascontiguousarray(codebook.lengths, dtype=np.uint8)
    codes_tbl = np.ascontiguousarray(codebook.codes, dtype=np.uint32)
    block_bits = np.zeros(n_lanes, dtype=np.int64)
    lens_out = np.zeros(n_lanes * B, dtype=np.int32)
    rc = lib.htpu_block_bits(
        _ptr(symbols, ctypes.c_uint16), n_pairs, n_lanes, B,
        _ptr(lens_tbl, ctypes.c_uint8),
        _ptr(block_bits, ctypes.c_int64), _ptr(lens_out, ctypes.c_int32),
    )
    if rc != 0:
        raise NativeError("htpu_block_bits", rc)
    W = bucket_words(int((block_bits.max(initial=1) + 31) // 32))
    slab = np.zeros((n_lanes, W), dtype=np.uint32)
    rc = lib.htpu_encode_blocks(
        _ptr(symbols, ctypes.c_uint16), n_pairs, n_lanes, B,
        _ptr(codes_tbl, ctypes.c_uint32), _ptr(lens_tbl, ctypes.c_uint8),
        W, _ptr(slab, ctypes.c_uint32),
    )
    if rc != 0:
        raise NativeError("htpu_encode_blocks", rc)
    return slab, block_bits, lens_out.reshape(n_lanes, B)


def disp_pack(values: np.ndarray, present: np.ndarray, n_slots: int):
    """Native twin of ops/pallas_gather._pack_rows (identical first-fit
    order, bit-identical tables). Returns (disp, table) or None when the
    alphabet does not pack into n_slots."""
    lib = _load()
    assert lib is not None
    if not hasattr(lib, "htpu_disp_pack"):
        return NotImplemented
    values = np.ascontiguousarray(values, dtype=np.uint32).reshape(-1)
    pres = np.ascontiguousarray(present, dtype=np.uint8).reshape(-1)
    if values.size != MAX_SYMBOLS or pres.size != MAX_SYMBOLS:
        raise ValueError("values/present must be dense MAX_SYMBOLS tables")
    disp = np.zeros(256, dtype=np.int32)
    table = np.zeros(n_slots, dtype=np.uint32)
    rc = lib.htpu_disp_pack(
        _ptr(values, ctypes.c_uint32), _ptr(pres, ctypes.c_uint8),
        n_slots, _ptr(disp, ctypes.c_int32), _ptr(table, ctypes.c_uint32),
    )
    if rc == -4:  # HTPU_E_OVERFLOW: does not pack
        return None
    if rc != 0:
        raise NativeError("htpu_disp_pack", rc)
    return disp, table


def interleave_build(slab: np.ndarray, eff_lens: np.ndarray, n_real: int) -> list[np.ndarray]:
    """Native twin of container/interleave.build_interleaved_streams."""
    from ..constants import GROUP_LANES, PRELOAD_WORDS

    lib = _load()
    assert lib is not None
    slab = np.ascontiguousarray(slab, dtype=np.uint32)
    eff_lens = np.ascontiguousarray(eff_lens, dtype=np.int32)
    n_lanes, W = slab.shape
    B = eff_lens.shape[1]
    n_groups = n_lanes // GROUP_LANES
    cap = int(
        PRELOAD_WORDS * n_lanes + (eff_lens.sum(dtype=np.int64) + 31) // 32 + n_lanes
    )
    out = np.empty(cap, dtype=np.uint32)
    sizes = np.zeros(max(n_groups, 1), dtype=np.int64)
    rc = lib.htpu_interleave_build(
        _ptr(slab, ctypes.c_uint32), n_lanes, W,
        _ptr(eff_lens, ctypes.c_int32), B, n_real,
        _ptr(out, ctypes.c_uint32), cap, _ptr(sizes, ctypes.c_int64),
    )
    if rc != 0:
        raise NativeError("htpu_interleave_build", rc)
    streams, off = [], 0
    for g in range(n_groups):
        streams.append(out[off : off + sizes[g]].copy())
        off += int(sizes[g])
    return streams


def interleave_decode(stream: np.ndarray, codebook, B: int, n_real: int) -> np.ndarray:
    """Native twin of container/interleave.decode_interleaved_numpy:
    returns (B, GROUP_LANES) symbols."""
    from ..constants import GROUP_LANES

    lib = _load()
    assert lib is not None
    stream = np.ascontiguousarray(stream, dtype=np.uint32)
    lj = np.ascontiguousarray(codebook.lj_limit, dtype=np.uint32)
    base = np.ascontiguousarray(
        (codebook.base & 0xFFFFFFFF).astype(np.uint32)
    )
    sym_order = np.ascontiguousarray(codebook.sym_order, dtype=np.uint16)
    if lj.size != MAX_CODE_LEN or base.size != MAX_CODE_LEN + 1:
        raise ValueError(
            f"decode tables must be dense: lj_limit has {lj.size} rows "
            f"(want {MAX_CODE_LEN}), base has {base.size} (want {MAX_CODE_LEN + 1})"
        )
    out = np.zeros((B, GROUP_LANES), dtype=np.uint16)
    rc = lib.htpu_interleave_decode(
        _ptr(stream, ctypes.c_uint32), stream.size,
        _ptr(lj, ctypes.c_uint32), _ptr(base, ctypes.c_uint32),
        _ptr(sym_order, ctypes.c_uint16), sym_order.size,
        max(codebook.max_len, 1), B, n_real,
        _ptr(out, ctypes.c_uint16),
    )
    if rc != 0:
        raise NativeError("htpu_interleave_decode", rc)
    return out.astype(np.int32)
