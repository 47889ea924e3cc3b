"""Global constants for the TPU-native Huffman framework.

The symbol model mirrors the reference codec's 16-bit byte-pair alphabet
(reference: Compressor.cu:38-48 packs ``(data[2i+1] << 8) | data[2i]``),
but every value here is a framework-level knob, not a copy of reference
compile-time constants.
"""

# Size of the symbol alphabet: 16-bit byte pairs.
MAX_SYMBOLS = 65536

# Bits per symbol in the raw (uncompressed) representation.
SYMBOL_BITS = 16

# Bytes per symbol.
SYMBOL_BYTES = 2

# Maximum supported codeword length. Canonical decode left-justifies codes
# into 32-bit words, so codewords must fit in 32 bits. Plain Huffman over a
# 65,536-symbol alphabet can theoretically exceed this only with pathological
# (Fibonacci-like) frequency profiles over >2^32 input symbols; the encoder
# asserts and falls back to depth-limited construction if it ever happens.
MAX_CODE_LEN = 32

# Default codebook depth limit for the NATIVE container. Decode-kernel cost
# is linear in codebook depth (the canonical length search), and capping at
# 18 costs < 0.5% ratio even on adversarial full-alphabet data (0 on text,
# whose optimal codes are shallower anyway). The limit only triggers a
# package-merge rebuild when the optimal code is actually deeper. The
# reference-interop format never limits (bit-exact sizes preserved).
DEFAULT_MAX_CODE_LEN = 18

# Default number of symbols per independently-decodable block in the native
# container (see container/block_format.py). 512 symbols = 1 KiB of input
# per block: the decoder runs one block per vector lane, so small blocks
# mean more lanes in flight and fewer sequential bit-cursor steps.
DEFAULT_BLOCK_SYMBOLS = 512

# Interleaved-stream protocol constants (docs/FORMATS.md §3). These define
# the v2 container format itself, so they live here — host-only paths
# (parsers, the native runtime, the NumPy twins) must not import jax to
# read them. ops.pallas_decode asserts its kernel geometry matches.
GROUP_LANES = 1024       # block lanes per interleaved group
PRELOAD_WORDS = 2        # stream words 0,1 of every lane head the stream
REFILL_THRESHOLD = 33    # lanes refill below this many live bits
WINDOW_ROWS = GROUP_LANES // 128 + 1  # decoder refill-window rows

# Data-adaptive alphabet tiers for the fused device encoder: it selects
# the smallest tier >= this input's n_unique under lax.switch
# (ops/fused.py), so small alphabets pay small per-round sorts. The HOST
# builder (codebook.package_merge_lengths) runs uncapped — byte-identity
# between host- and device-built containers rests solely on package-merge
# lengths being invariant to any cap >= n_unique (sentinel-padded tails
# never enter the level counts; pinned by tests/test_device_codebook.py),
# NOT on the host consulting these tiers.
# The 32768 rung (r4): with the Pallas package-merge kernel the codebook
# cost is flat in the cap, but the rank-select DENSE GATHER still scales
# with it (6.5 ms at 32768 vs 11.3 at 65536 per 16 MiB on the v5e) — the
# extra rung halves the top-tier gather for 16K-32K-unique inputs.
ALPHABET_TIERS = (4096, 16384, 32768, MAX_SYMBOLS)

# Native container magic / version.
NATIVE_MAGIC = 0x48545055  # "HTPU"
NATIVE_VERSION = 1
